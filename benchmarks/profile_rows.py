#!/usr/bin/env python
"""A/B the fused align+walk dispatch: rows walk vs RLE walk vs parts.

Run on the real chip. Prints per-variant median seconds at the headline
640/128 consensus tier plus the rows-walk-alone time.
"""

import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from racon_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from racon_tpu.ops.nw_kernel import (  # noqa: E402
    _prep_panels_t8, align_walk_rle_batch, align_walk_rows_batch,
    nw_band_batch_t8, pack_codes4, pack_delbits, walk_rows_t)


def median_time(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        jax.block_until_ready(fn())
        times.append(time.monotonic() - t0)
    return statistics.median(times), out


def main(B=4096, cap=640, band=128):
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

    @jax.jit
    def sweep(q4, t4, dcb):
        qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, m_cap=cap, n_cap=cap,
                                        w_band=band, gap=-8)
        return nw_band_batch_t8(qT, tpT, dcpT, **kw)

    t_sweep, (moves, _) = median_time(lambda: sweep(q4, t4, dcb))
    moves = jax.device_put(np.asarray(moves))

    rows_walk = jax.jit(functools.partial(
        walk_rows_t, m_cap=cap, n_cap=cap, w_band=band))
    t_rwalk, (payload, esc) = median_time(
        lambda: rows_walk(moves, jnp.asarray(m), jnp.asarray(n)))
    n_esc = int(np.asarray(esc).sum())

    t_rows, _ = median_time(
        lambda: align_walk_rows_batch(q4, t4, dcb, m, n, **kw))
    t_rle, _ = median_time(
        lambda: align_walk_rle_batch(q4, t4, dcb, m, n, **kw))

    cells = B * cap * band
    print(f"B={B} cap={cap} band={band}  rows-escapes={n_esc}")
    print(f"sweep alone     : {t_sweep*1e3:8.2f} ms")
    print(f"rows walk alone : {t_rwalk*1e3:8.2f} ms")
    print(f"fused rows      : {t_rows*1e3:8.2f} ms "
          f"({cells/t_rows/1e9:.2f} G cells/s)")
    print(f"fused rle       : {t_rle*1e3:8.2f} ms "
          f"({cells/t_rle/1e9:.2f} G cells/s)")


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
