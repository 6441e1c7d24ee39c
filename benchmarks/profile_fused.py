#!/usr/bin/env python
"""Decompose the fused align+walk dispatch's time: prep, sweep, walk,
payload assembly — each measured cumulatively as its own jit so the
~40 ms of unaccounted glue in the fused graph (profile_rows.py) gets
attributed."""

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
    _prep_panels_t8, nw_band_batch_t8, pack_codes4, pack_delbits,
    walk_rows_t, walk_moves_rle_t, rle_events)


def median_time(fn, reps=5):
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
    m = jnp.asarray(np.full(B, cap, np.int32))
    n = jnp.asarray(np.full(B, cap, np.int32))
    q4, t4 = pack_codes4(q8), pack_codes4(t8)
    dcb = pack_delbits(np.full((B, cap), -8, np.int8))
    kw = dict(m_cap=cap, n_cap=cap, w_band=band)
    kws = dict(match=5, mismatch=-4, gap=-8, **kw)

    prep = jax.jit(functools.partial(_prep_panels_t8, **kw, gap=-8))
    t_prep, panels = median_time(lambda: prep(q4, t4, dcb))

    @jax.jit
    def prep_sweep(q4, t4, dcb):
        qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, **kw, gap=-8)
        return nw_band_batch_t8(qT, tpT, dcpT, **kws)

    t_ps, (moves, score) = median_time(lambda: prep_sweep(q4, t4, dcb))

    @jax.jit
    def prep_sweep_walk(q4, t4, dcb, m, n):
        qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, **kw, gap=-8)
        moves, score = nw_band_batch_t8(qT, tpT, dcpT, **kws)
        payload, esc = walk_rows_t(moves, m, n, **kw)
        return payload, score

    t_psw, _ = median_time(lambda: prep_sweep_walk(q4, t4, dcb, m, n))

    @jax.jit
    def psw_rle(q4, t4, dcb, m, n):
        qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, **kw, gap=-8)
        moves, score = nw_band_batch_t8(qT, tpT, dcpT, **kws)
        ev, esc = walk_moves_rle_t(moves, m, n, **kw,
                                   max_events=rle_events(cap, cap, band))
        return ev, esc, score

    t_psw_rle, _ = median_time(lambda: psw_rle(q4, t4, dcb, m, n))

    # sweep with device-resident panels (isolates prep's true cost)
    sweep_only = jax.jit(functools.partial(nw_band_batch_t8, **kws))
    panels = jax.device_put(tuple(np.asarray(p) for p in panels))
    t_sw, _ = median_time(lambda: sweep_only(*panels))

    print(f"B={B} cap={cap} band={band}")
    print(f"prep alone           : {t_prep*1e3:8.2f} ms")
    print(f"sweep (dev panels)   : {t_sw*1e3:8.2f} ms")
    print(f"prep+sweep           : {t_ps*1e3:8.2f} ms")
    print(f"prep+sweep+rowswalk  : {t_psw*1e3:8.2f} ms  (no payload .T)")
    print(f"prep+sweep+rlewalk   : {t_psw_rle*1e3:8.2f} ms  (no payload .T)")


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
