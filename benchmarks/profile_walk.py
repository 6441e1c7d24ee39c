"""Walk cost scaling: same real path lengths, varying moves-table height
(cap). If time scales with cap, the per-iteration gather is table-bound
(one-hot style lowering) and a row-windowed walk pays off."""

import sys
import time
import functools

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from racon_tpu.ops.nw_kernel import walk_moves_rle_t, rle_events


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    m_real = 200
    rng = np.random.default_rng(0)
    m = np.full(B, m_real, np.int32)
    n = np.full(B, m_real, np.int32)

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

    for cap in (256, 640, 1280):
        W = 128
        slots = cap // 16
        # moves: all-diagonal words (zeros) -> walk takes m/16 run events
        mv = np.zeros((slots, W, B), np.int32)
        mj = jax.device_put(mv)
        wj = jax.jit(functools.partial(
            walk_moves_rle_t, m_cap=cap, n_cap=cap, w_band=W,
            max_events=rle_events(cap, cap, W)))
        dt = timeit(lambda: wj(mj, m, n))
        print(f"cap={cap:5d} table_rows={slots*W:5d}: {dt*1e3:7.1f} ms")

    # same but random moves (realistic run lengths ~ 8), varying B and m
    cap, W = 640, 128
    slots = cap // 16
    rngm = np.random.default_rng(1)
    bits = (rngm.random((slots, W, B, 16)) < 0.12).astype(np.int64)
    ops = rngm.integers(1, 3, (slots, W, B, 16))
    words = np.zeros((slots, W, B), np.int64)
    for u in range(16):
        words |= (bits[..., u] * ops[..., u]) << (2 * u)
    words = words.astype(np.int32)
    for Bv in (1024, 4096, 8192):
        mj = jax.device_put(np.ascontiguousarray(words[:, :, :Bv]))
        wj = jax.jit(functools.partial(
            walk_moves_rle_t, m_cap=cap, n_cap=cap, w_band=W,
            max_events=rle_events(cap, cap, W)))
        for mv_ in (150, 500):
            dt = timeit(lambda: wj(mj, np.full(Bv, mv_, np.int32),
                                   np.full(Bv, mv_, np.int32)))
            print(f"B={Bv:5d} m={mv_:4d}: {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
