"""One production align-stage chunk, isolated: ONT-like reads (subs+indels)
vs draft slices at the (10240, 1024) tier, timing NW kernel, plain walk,
windowed walk, and the fused dispatch separately."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from racon_tpu.ops import nw_kernel as nk


def make_read(rng, src, err=0.12):
    third = err / 3
    u = rng.random(len(src))
    out = src.copy()
    sub = (u >= 2 * third) & (u < err)
    out[sub] = rng.integers(0, 4, int(sub.sum()))
    keep = u >= third                      # deletions
    ins = (u >= third) & (u < 2 * third)   # insert after kept base
    lens = keep.astype(np.int64) + ins.astype(np.int64)
    off = np.zeros(len(src) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    read = np.empty(int(off[-1]), np.int8)
    read[off[:-1][keep]] = out[keep]
    ipos = off[:-1][ins] + 1
    read[np.minimum(ipos, len(read) - 1)] = rng.integers(0, 4, len(ipos))
    return read


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cap, W = 10240, 1024
    rng = np.random.default_rng(3)
    q8 = np.full((B, cap), nk.PAD_CODE, np.int8)
    t8 = np.full((B, cap), nk.PAD_CODE, np.int8)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for i in range(B):
        tlen = int(rng.integers(7800, 8200))
        src = rng.integers(0, 4, tlen).astype(np.int8)
        read = make_read(rng, src)[:cap]
        t8[i, :tlen] = src
        q8[i, : len(read)] = read
        m[i] = len(read)
        n[i] = tlen
    order = np.argsort(m, kind="stable")
    q8, t8, m, n = q8[order], t8[order], m[order], n[order]
    q4 = nk.pack_codes4(q8)
    t4 = nk.pack_codes4(t8)
    dcb = np.full((B, cap // 8), 0xFF, np.uint8)
    kw = dict(m_cap=cap, n_cap=cap, w_band=W, match=0, mismatch=-1, gap=-1)

    def timeit(fn, reps=3):
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

    qT, tpT, dcpT = [jax.device_put(np.asarray(x)) for x in jax.jit(
        functools.partial(nk._prep_panels_t8, m_cap=cap, n_cap=cap,
                          w_band=W, gap=-1))(q4, t4, dcb)]
    nw = jax.jit(lambda a, b, c: nk.nw_band_batch_t8big(
        a, b, c, **kw))
    dt = timeit(lambda: nw(qT, tpT, dcpT))
    print(f"nw t8big      : {dt*1e3:8.1f} ms")
    moves, score = nw(qT, tpT, dcpT)
    mj = jax.device_put(np.asarray(moves))
    E = nk.rle_events(cap, cap, W)
    wp = jax.jit(functools.partial(nk.walk_moves_rle_t, m_cap=cap, n_cap=cap,
                                   w_band=W, max_events=E))
    dt = timeit(lambda: wp(mj, m, n))
    print(f"walk plain    : {dt*1e3:8.1f} ms")
    ww = jax.jit(functools.partial(nk.walk_moves_rle_win_t, m_cap=cap,
                                   n_cap=cap, w_band=W, max_events=E))
    dt = timeit(lambda: ww(mj, m, n))
    ev, esc = ww(mj, m, n)
    print(f"walk windowed : {dt*1e3:8.1f} ms (escapes={int(np.asarray(esc).sum())})")
    fused = jax.jit(functools.partial(nk.align_walk_packed_core_rle_tbig,
                                      **kw))
    dt = timeit(lambda: fused(q4, t4, dcb, m, n))
    print(f"fused (h2d)   : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()


def production_path():
    """Time align_walk_padded exactly as the align stage calls it."""
    B = 409
    cap, W = 10240, 1024
    rng = np.random.default_rng(3)
    q8 = np.full((B, cap), nk.PAD_CODE, np.int8)
    t8 = np.full((B, cap), nk.PAD_CODE, np.int8)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for i in range(B):
        tlen = int(rng.integers(7800, 8200))
        src = rng.integers(0, 4, tlen).astype(np.int8)
        read = make_read(rng, src)[:cap]
        t8[i, :tlen] = src
        q8[i, : len(read)] = read
        m[i] = len(read)
        n[i] = tlen
    order = np.argsort(m, kind="stable")
    q8, t8, m, n = q8[order], t8[order], m[order], n[order]
    q4 = nk.pack_codes4(q8)
    t4 = nk.pack_codes4(t8)
    dcb = np.full((B, cap // 8), 0xFF, np.uint8)

    for rep in range(3):
        t0 = time.monotonic()
        payload, score, fmt = nk.align_walk_padded(
            q4, t4, dcb, m, n, m_cap=cap, n_cap=cap, w_band=W,
            match=0, mismatch=-1, gap=-1, fixed_b=409, prepacked=True)
        t1 = time.monotonic()
        parr = np.asarray(payload)
        t2 = time.monotonic()
        print(f"production-path rep{rep}: dispatch={1e3*(t1-t0):.0f}ms "
              f"fetch={1e3*(t2-t1):.0f}ms fmt={fmt} "
              f"escapes={int((parr[:B,-1]!=0).sum())}")
