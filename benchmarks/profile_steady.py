#!/usr/bin/env python
"""Steady-state fused-dispatch throughput: K back-to-back dispatches, one
sync at the end (the production stages' pattern — all chunks enqueued, then
drained). Single-shot block_until_ready timings through the tunnel are
unreliable at ms granularity (profile_fused.py showed 'sweep alone' numbers
above hardware peak); totals over K dispatches are not."""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from racon_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

from racon_tpu.ops.nw_kernel import (  # noqa: E402
    align_walk_rle_batch, align_walk_rows_batch, pack_codes4, pack_delbits)


def steady(fn, K=10, reps=3):
    outs = [fn() for _ in range(2)]
    jax.block_until_ready(outs)  # warm
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        outs = [fn() for _ in range(K)]
        jax.block_until_ready(outs)
        times.append((time.monotonic() - t0) / K)
    return statistics.median(times)


def main(B=4096, cap=640, band=128, K=10):
    rng = np.random.default_rng(7)
    t8 = rng.integers(0, 4, (B, cap)).astype(np.int8)
    q8 = t8.copy()
    sub = rng.random((B, cap)) < 0.1
    q8[sub] = rng.integers(0, 4, int(sub.sum()))
    m = np.full(B, cap, np.int32)
    n = np.full(B, cap, np.int32)
    q4, t4 = pack_codes4(q8), pack_codes4(t8)
    dcb = pack_delbits(np.full((B, cap), -8, np.int8))
    kw = dict(m_cap=cap, n_cap=cap, w_band=band, match=5, mismatch=-4,
              gap=-8)

    cells = B * cap * band
    t_rows = steady(lambda: align_walk_rows_batch(q4, t4, dcb, m, n, **kw),
                    K)
    t_rle = steady(lambda: align_walk_rle_batch(q4, t4, dcb, m, n, **kw), K)
    print(f"B={B} cap={cap} band={band} K={K}")
    print(f"fused rows steady : {t_rows*1e3:8.2f} ms/dispatch "
          f"({cells/t_rows/1e9:.2f} G cells/s)")
    print(f"fused rle  steady : {t_rle*1e3:8.2f} ms/dispatch "
          f"({cells/t_rle/1e9:.2f} G cells/s)")


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
