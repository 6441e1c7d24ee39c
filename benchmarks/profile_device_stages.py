"""Device-side stage breakdown of the fused align+walk dispatch: times the
unpack/transpose/cumsum prep, the NW kernel, and the RLE walk as separate
jitted calls (each sync'd), plus the fused call, at production chunk shapes.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from racon_tpu.ops.nw_kernel import (PAD_CODE, nw_band_batch_t8,
                                     _prep_panels_t8,
                                     pack_codes4, pack_delbits,
                                     walk_moves_rle_t, rle_events,
                                     align_walk_rle_batch)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rng = np.random.default_rng(0)
    hi = min(520, cap)
    mlen = rng.integers(hi - 100, hi, B).astype(np.int32)
    nlen = np.minimum(mlen + rng.integers(-20, 20, B), cap).astype(np.int32)
    q8 = np.full((B, cap), PAD_CODE, np.int8)
    t8 = np.full((B, cap), PAD_CODE, np.int8)
    for i in range(B):
        q8[i, : mlen[i]] = rng.integers(0, 4, mlen[i])
        L = min(mlen[i], nlen[i])
        t8[i, : nlen[i]] = rng.integers(0, 4, nlen[i])
        t8[i, :L] = q8[i, :L]
    dc8 = np.full((B, cap), -8, np.int8)
    q4 = jax.device_put(pack_codes4(q8))
    t4 = jax.device_put(pack_codes4(t8))
    dcb = jax.device_put(pack_delbits(dc8))
    mdev = jax.device_put(mlen)
    ndev = jax.device_put(nlen)

    @functools.partial(jax.jit, static_argnames=())
    def prep(q4, t4, dcb):
        return _prep_panels_t8(q4, t4, dcb, m_cap=cap, n_cap=cap, w_band=W,
                               gap=-8)

    nw_jit = jax.jit(lambda a, b, c: nw_band_batch_t8(
        a, b, c, m_cap=cap, n_cap=cap, w_band=W, match=5, mismatch=-4,
        gap=-8))

    def timeit(fn, reps=5):
        def force():
            r = fn()
            return [np.asarray(jnp.max(x))
                    for x in jax.tree_util.tree_leaves(r)]
        force()
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            force()
            ts.append(time.monotonic() - t0)
        return sorted(ts)[len(ts) // 2]

    # baseline RTT: a trivial dispatch + scalar fetch
    one = jax.device_put(np.ones((8, 128), np.int32))
    addj = jax.jit(lambda x: x + 1)
    rtt = timeit(lambda: addj(one))
    print(f"rtt_floor  : {rtt*1e3:7.1f} ms")

    dt_prep = timeit(lambda: prep(q4, t4, dcb))
    print(f"prep       : {dt_prep*1e3:7.1f} ms (incl rtt)")

    qT, tpT, gcpT = [jax.device_put(np.asarray(x)) for x in prep(q4, t4, dcb)]
    dt_nw = timeit(lambda: nw_jit(qT, tpT, gcpT))
    print(f"nw         : {dt_nw*1e3:7.1f} ms (incl rtt + moves-max read)")

    moves, score = nw_jit(qT, tpT, gcpT)
    mj = jax.device_put(np.asarray(moves))
    walk_jit = jax.jit(lambda m_, a, b: walk_moves_rle_t(
        m_, a, b, m_cap=cap, n_cap=cap, w_band=W,
        max_events=rle_events(cap, cap, W)))
    dt_walk = timeit(lambda: walk_jit(mj, mdev, ndev))
    print(f"walk       : {dt_walk*1e3:7.1f} ms (incl rtt)")

    dt_fused = timeit(lambda: align_walk_rle_batch(
        np.asarray(q4), np.asarray(t4), np.asarray(dcb), mlen, nlen,
        m_cap=cap, n_cap=cap, w_band=W, match=5, mismatch=-4, gap=-8))
    print(f"fused+h2d  : {dt_fused*1e3:7.1f} ms (incl rtt)")


if __name__ == "__main__":
    main()
