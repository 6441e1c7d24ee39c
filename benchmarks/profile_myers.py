#!/usr/bin/env python
"""Myers bit-parallel align kernel vs the scored sweep, on the real chip.

Same-session A/B at align-stage tier shapes: dispatch wall times (steady,
amortized over reps) plus a jax profiler trace of per-dispatch device
time, and an on-chip bit-identity check of decoded ops vs the scored
rle path. Usage: python benchmarks/profile_myers.py [cap=2560] [band=512]
[batch=512] [reps=5] [trace=0]"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from racon_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

from racon_tpu.native import bindings  # noqa: E402
from racon_tpu.ops.myers_kernel import (align_walk_myers_batch,  # noqa: E402
                                        myers_fits)
from racon_tpu.ops.nw_kernel import (align_walk_rle_batch,  # noqa: E402
                                     encode, pack_codes4, pack_delbits,
                                     rle_events, PAD_CODE)

ACGT = np.frombuffer(b"ACGT", np.uint8)


def make_pairs(rng, B, cap, err=0.12):
    q8 = np.full((B, cap), PAD_CODE, np.int8)
    t8 = np.full((B, cap), PAD_CODE, np.int8)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for b in range(B):
        tlen = int(rng.integers(int(cap * 0.7), cap))
        t = rng.choice(ACGT, tlen)
        q = t.copy()
        nmut = int(tlen * err)
        for pos in rng.choice(tlen - 2, nmut, replace=False):
            k = rng.integers(0, 3)
            if k == 0:
                q[pos] = rng.choice(ACGT)
        # a few indels clustered away from the ends
        ndel = int(tlen * err * 0.25)
        if ndel:
            q = np.delete(q, rng.choice(len(q) - 2, ndel, replace=False))
        q8[b, : len(q)] = encode(q)
        t8[b, : len(t)] = encode(t)
        m[b], n[b] = len(q), len(t)
    return q8, t8, m, n


def main(cap=2560, band=512, batch=512, reps=5, trace=0):
    assert myers_fits(cap, cap, band), "tier not myers-eligible"
    rng = np.random.default_rng(71)
    q8, t8, m, n = make_pairs(rng, batch, cap)
    q4, t4 = pack_codes4(q8), pack_codes4(t8)
    dcb = pack_delbits(np.full((batch, cap), -1, np.int8))
    kw = dict(m_cap=cap, n_cap=cap, w_band=band)

    def run_myers():
        p, s = align_walk_myers_batch(q4, t4, m, n, **kw)
        return np.asarray(p)

    def run_rle():
        p, s = align_walk_rle_batch(q4, t4, dcb, m, n, match=0, mismatch=-1,
                                    gap=-1, **kw)
        return np.asarray(p)

    t0 = time.perf_counter()
    pm = run_myers()
    print(f"myers cold: {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    pr = run_rle()
    print(f"rle   cold: {time.perf_counter() - t0:.2f}s", flush=True)

    # bit-identity of decoded ops on the chip
    esc_m = pm[:, -1] != 0
    esc_r = pr[:, -1] != 0
    assert np.array_equal(esc_m, esc_r), (esc_m.sum(), esc_r.sum())
    om, fm, cm = bindings.opstream_rows_to_ops_batch(pm, cap + 2, m, n, 2)
    orr, fr, cr = bindings.opstream_rle_to_ops_batch(
        np.ascontiguousarray(pr[:, :-1]), rle_events(cap, cap, band),
        m, n, 2)
    bad = 0
    for b in range(batch):
        if esc_m[b]:
            continue
        a = om[fm[b] : fm[b] + cm[b]]
        c = orr[fr[b] : fr[b] + cr[b]]
        if not np.array_equal(a, c):
            bad += 1
    print(f"identity: {batch - bad}/{batch} identical, "
          f"{int(esc_m.sum())} escaped", flush=True)
    assert bad == 0, f"{bad} mismatching items"

    for name, fn in (("myers", run_myers), ("rle", run_rle),
                     ("myers2", run_myers)):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        cells = batch * cap * band
        print(f"{name:7s} best={best * 1e3:8.2f} ms  "
              f"{cells / best / 1e9:7.1f} G band-cells/s  "
              f"all={['%.0f' % (t * 1e3) for t in ts]} ms", flush=True)

    if trace:
        import tempfile

        d = tempfile.mkdtemp(prefix="myers_trace_")
        with jax.profiler.trace(d):
            for _ in range(3):
                run_myers()
        print(f"trace -> {d}", flush=True)


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
