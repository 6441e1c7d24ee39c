#!/usr/bin/env python
"""Split the fused align+walk dispatch's device time into sweep vs walk.

VERDICT r2 item 1: the ledger reported only the fused time; this harness
times (a) the banded-NW sweep alone (nw_band_batch_t8 + panel prep), (b)
the RLE traceback walk alone on precomputed move planes, and (c) the fused
dispatch, at the headline 640/128 consensus tier, so the ledger can record
the align/walk split and kernel work can target the real wall.
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from racon_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import functools  # noqa: E402

from racon_tpu.ops.nw_kernel import (  # noqa: E402
    _prep_panels_t8, align_walk_rle_batch, nw_band_batch_t8, pack_codes4,
    pack_delbits, rle_events, walk_moves_rle_t)


def median_time(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)  # compile + warm
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

    t_sweep, (moves, score) = median_time(lambda: sweep(q4, t4, dcb))
    moves = jax.device_put(np.asarray(moves))

    walk = jax.jit(functools.partial(
        walk_moves_rle_t, m_cap=cap, n_cap=cap, w_band=band,
        max_events=rle_events(cap, cap, band)))
    t_walk, _ = median_time(lambda: walk(moves, jnp.asarray(m),
                                         jnp.asarray(n)))

    t_fused, _ = median_time(
        lambda: align_walk_rle_batch(q4, t4, dcb, m, n, **kw))

    cells = B * cap * band
    print(f"B={B} cap={cap} band={band}")
    print(f"sweep alone : {t_sweep*1e3:8.2f} ms  "
          f"({cells/t_sweep/1e9:.2f} G cells/s)")
    print(f"walk alone  : {t_walk*1e3:8.2f} ms")
    print(f"fused       : {t_fused*1e3:8.2f} ms  "
          f"({cells/t_fused/1e9:.2f} G cells/s)")
    return dict(sweep_s=t_sweep, walk_s=t_walk, fused_s=t_fused)


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
