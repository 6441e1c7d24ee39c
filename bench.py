#!/usr/bin/env python
"""Benchmark: POA window consensus throughput per chip (BASELINE.json metric).

Workload: synthetic ONT-like window batch (500 bp backbones, ~12% read error,
depth 20), polished end-to-end through the consensus stage (device banded-NW
alignment + on-device traceback walk + native star-POA merge, 4 refinement
passes — the production path). Baseline = the same workload through the
native CPU backend (the racon-equivalent host path) using all host threads;
vs_baseline = tpu_windows_per_s / cpu_windows_per_s.

Prints ONE JSON line. Median of repeated runs (the TPU tunnel in this
environment has high latency variance).
"""

import json
import statistics
import sys
import time

import numpy as np

N_WINDOWS = 2048  # large enough to saturate the chip (fixed per-dispatch
                  # costs amortize like a genome-scale run)
WINDOW_LEN = 500
DEPTH = 20
ERR = 0.12
REPEATS = 3  # median; the tunneled chip shows multi-second latency spikes


def _mutate_read(rng, seg):
    """Vectorized ONT-like read simulation: per-base del/ins/sub at ERR."""
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    r = rng.random(len(seg))
    keep = r >= ERR / 3                      # deletions
    ins = r < 2 * ERR / 3
    ins &= keep  # insertion after a kept base (matches the scalar version:
    # the branch ordering made dels and inss disjoint)
    sub = (r >= 2 * ERR / 3) & (r < ERR)
    base = seg.copy()
    base[sub] = ACGT[rng.integers(0, 4, int(sub.sum()))]
    # interleave: emit kept base, then an inserted random base where ins
    out_len = keep.astype(np.int64) + ins.astype(np.int64)
    off = np.zeros(len(seg) + 1, np.int64)
    np.cumsum(out_len, out=off[1:])
    read = np.empty(int(off[-1]), np.uint8)
    read[off[:-1][keep]] = base[keep]
    ipos = off[:-1][ins] + 1
    read[ipos] = ACGT[rng.integers(0, 4, len(ipos))]
    return read


def build_workload(seed=1234, n_windows=None, window_len=None):
    from racon_tpu.core.store import SequenceStore
    from racon_tpu.core.windows import WindowSet, WINDOW_TYPE_TGS

    n_windows = n_windows or N_WINDOWS
    window_len = window_len or WINDOW_LEN
    rng = np.random.default_rng(seed)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    glen = n_windows * window_len
    true = rng.choice(ACGT, glen)
    draft = true.copy()
    # draft errors: subs + deletions (ONT-like draft)
    for pos in rng.choice(glen, glen // 50, replace=False):
        draft[pos] = rng.choice(ACGT)
    keep = np.delete(np.arange(glen), rng.choice(glen, glen // 100,
                                                 replace=False))
    draft = draft[keep]  # keep[i] = true-coordinate of draft position i

    # store: target (draft) + reads
    names = [b"ctg"]
    parts = [draft]
    qid = 1
    # reads tile the target; each read ~2kb covering 4 windows, staggered
    # so every window sees ~DEPTH layers (read coverage = read_len/step).
    # NOTE (round 2): step was read_len_t // (DEPTH // 4), which yields ~6
    # layers/window, not the advertised 20 — numbers before this fix are a
    # ~6-deep workload and are NOT comparable (see PLAN.md M14).
    # read r spans draft[start:end]; its error-free source is the matching
    # true-coordinate slice (keep[] maps between the two systems)
    read_len_t = 4 * window_len
    step = max(1, read_len_t // DEPTH)
    for start in range(0, len(draft) - 100, step):
        end = min(start + read_len_t, len(draft))
        seg = true[keep[start] : keep[end - 1] + 1]
        read = _mutate_read(rng, seg)
        names.append(b"r%d" % qid)
        parts.append(read)
        qid += 1

    data_off = np.zeros(len(parts) + 1, np.int64)
    for i, p in enumerate(parts):
        data_off[i + 1] = data_off[i] + len(p)
    store = SequenceStore(names, np.concatenate(parts), data_off,
                          np.zeros(0, np.uint8),
                          np.zeros(len(parts) + 1, np.int64))

    windows = WindowSet(store, 1, window_len, WINDOW_TYPE_TGS)
    # assign layers via the host aligner's breaking points (setup, not timed)
    from racon_tpu.native import bindings

    n_reads = len(parts) - 1
    qoff = np.zeros(n_reads + 1, np.int64)
    toff = np.zeros(n_reads + 1, np.int64)
    spans = []
    for r in range(n_reads):
        read = parts[r + 1]
        tb = min(int(r * step), len(draft) - 1)
        te = min(tb + read_len_t, len(draft))
        spans.append((tb, te))
        qoff[r + 1] = qoff[r] + len(read)
        toff[r + 1] = toff[r] + (te - tb)
    quads, quad_off, counts = bindings.breaking_points_batch(
        np.concatenate(parts[1:]),
        qoff, np.concatenate([draft[b:e] for b, e in spans]), toff,
        np.zeros(n_reads, np.uint8), np.zeros(n_reads, np.int64),
        qoff[1:] - qoff[:-1], qoff[1:] - qoff[:-1],
        np.array([b for b, _ in spans], np.int64),
        np.array([e for _, e in spans], np.int64), window_len, 16)
    for r in range(n_reads):
        o = int(quad_off[r])
        bp = quads[o : o + int(counts[r])]
        windows.assign_overlap(bp, r + 1, 0, False, 10.0)
    windows.freeze()
    return windows, true


def run_stage(stage, windows, cfg):
    from racon_tpu.utils.logger import Logger
    import contextlib, io

    t0 = time.monotonic()
    with contextlib.redirect_stderr(io.StringIO()):
        cons, pol = stage.consensus_windows(windows, cfg, Logger())
    dt = time.monotonic() - t0
    return dt, cons


def bench_kernel_cells():
    """Device-only microbench of the production fused align+walk dispatch
    at the 640/128 consensus tier: DP cells/s plus a speed-of-light
    estimate, measured STEADY-STATE (K back-to-back dispatches, one sync —
    the production stages' enqueue-then-drain pattern). Round-2 used
    single-dispatch block_until_ready medians, which through the tunneled
    chip measured dispatch/sync latency, not device time (profile_fused.py
    showed 'sweep alone' readings above hardware peak that way); the r2
    figure 4.2e9 cells/s is therefore NOT comparable.

    Also records the align/walk split (VERDICT r2 item 1): the sweep alone,
    the rows walk, and the RLE-walk variant of the fused dispatch.

    SOL model (v5e): the banded-NW inner loop is VPU-bound int32 work —
    per DP cell roughly log2(W)+1 shift/select steps for the deletion-chain
    max-plus closure plus ~10 add/max/compare/select ops ≈ 18 VPU ops.
    v5e VPU ≈ 4 SIMD units x (8x128) lanes x ~0.94 GHz ≈ 3.85e12 int32
    ops/s -> SOL ≈ 2.1e11 cells/s. The fused dispatch also runs prep +
    the traceback walk, so the measured figure UNDERstates pure-NW
    throughput."""
    import jax
    from racon_tpu.ops.nw_kernel import (_prep_panels_t8,
                                         align_walk_rle_batch,
                                         align_walk_rows_batch,
                                         nw_band_batch_t8, pack_codes4,
                                         pack_delbits)

    B, cap, band = 4096, 640, 128
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

    def steady(fn, K1=4, K2=24, reps=3):
        """Per-dispatch device time via the two-batch-size slope: the
        tunnel adds a large, session-varying fixed latency per SYNC
        (hundreds of ms some sessions), so T(K) = sync + K*c and
        c = (T(K2) - T(K1)) / (K2 - K1) cancels it exactly."""
        outs = [fn() for _ in range(2)]
        jax.block_until_ready(outs)

        def total(K):
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                outs = [fn() for _ in range(K)]
                jax.block_until_ready(outs)
                times.append(time.monotonic() - t0)
            return statistics.median(times)

        t1, t2 = total(K1), total(K2)
        return max((t2 - t1) / (K2 - K1), 1e-9)

    @jax.jit
    def sweep(q4, t4, dcb):
        qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, m_cap=cap, n_cap=cap,
                                        w_band=band, gap=-8)
        return nw_band_batch_t8(qT, tpT, dcpT, **kw)

    # PREFERRED measurement: one jax.profiler trace over R dispatches of
    # each variant — the trace's device-timeline durations are the actual
    # kernel times, immune to the tunnel's per-sync latency (which made
    # both r2's single-shot medians AND same-session slope measurements
    # inconsistent: BENCH r3 interim runs recorded prep+sweep "slower"
    # than the fused dispatch). Falls back to the slope numbers if the
    # plugin can't trace.
    prof = None
    try:
        prof = _trace_device_ms(
            {"rle": lambda: align_walk_rle_batch(q4, t4, dcb, m, n, **kw),
             "rows": lambda: align_walk_rows_batch(q4, t4, dcb, m, n,
                                                   **kw),
             "sweep": lambda: sweep(q4, t4, dcb)}, reps=4)
    except Exception:
        prof = None

    cells = B * cap * band
    sol = 3.85e12 / 18.0
    out = {"batch": B, "cap": cap, "band": band,
           "sol_cells_per_s_est": round(sol, 0),
           "note": ("device times from the jax profiler trace (tunnel "
                    "sync latency excluded); r2's single-shot 4.2e9 "
                    "cells/s measured tunnel latency, not device "
                    "throughput")}
    if prof and prof.get("rle"):
        dt = prof["rle"]["total_s"]
        out["seconds_per_dispatch_device"] = round(dt, 5)
        out["split"] = {
            "sweep_s": round(prof.get("sweep", {}).get("total_s", 0.0), 5),
            "fused_rle_s": round(prof["rle"]["total_s"], 5),
            "fused_rle_walk_while_s": round(prof["rle"]["while_s"], 5),
            "fused_rows_s": round(prof.get("rows", {}).get("total_s",
                                                           0.0), 5),
        }
        out["dp_cells_per_s"] = round(cells / dt, 0)
        out["pct_of_sol"] = round(100.0 * cells / dt / sol, 2)
        return out
    # fallback: two-batch-size slope (cancels a CONSTANT sync latency;
    # unstable when the tunnel drifts mid-measurement)
    t_sweep = steady(lambda: sweep(q4, t4, dcb))
    t_rows = steady(
        lambda: align_walk_rows_batch(q4, t4, dcb, m, n, **kw))
    t_rle = steady(lambda: align_walk_rle_batch(q4, t4, dcb, m, n, **kw))
    dt = min(t_rows, t_rle)
    out["seconds_per_dispatch_steady"] = round(dt, 5)
    out["split"] = {"prep_plus_sweep_s": round(t_sweep, 5),
                    "fused_rows_walk_s": round(t_rows, 5),
                    "fused_rle_walk_s": round(t_rle, 5)}
    out["dp_cells_per_s"] = round(cells / dt, 0)
    out["pct_of_sol"] = round(100.0 * cells / dt / sol, 2)
    return out


def _trace_device_ms(fns: dict, reps=4):
    """Run each named thunk `reps` times inside ONE jax.profiler trace and
    return per-name device-timeline times: {"total_s": per-dispatch device
    time of the jit event, "while_s": per-dispatch total of while-loop
    events (the gather-walk's loop)}. Device-side durations come from the
    trace's /device:TPU pid, so tunnel dispatch/sync latency is excluded."""
    import glob
    import gzip
    import tempfile

    import jax

    for fn in fns.values():  # warm/compile outside the trace
        jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for fn in fns.values():
            outs = [fn() for _ in range(reps)]
            jax.block_until_ready(outs)
        jax.profiler.stop_trace()
        files = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
        if not files:
            return None
        evs = json.load(gzip.open(files[0])).get("traceEvents", [])
    pids = {e["pid"]: e.get("args", {}).get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, nm in pids.items()
           if "TPU" in nm or "device" in nm.lower()}
    # map jit event name -> thunk name (jit_<fn> or jit_<wrapped>)
    tot: dict = {}
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev:
            nm = e.get("name", "")
            tot[nm] = tot.get(nm, 0.0) + float(e.get("dur", 0.0))
    out = {}
    for name in fns:
        jit_ms = [v for k, v in tot.items()
                  if k.startswith("jit_") and name in k]
        if not jit_ms:
            # the sweep thunk is a local jit named after its function
            jit_ms = [v for k, v in tot.items() if k.startswith("jit_")
                      and not any(o != name and o in k for o in fns)]
        out[name] = {"total_s": (max(jit_ms) / reps / 1e6) if jit_ms
                     else None,
                     "while_s": 0.0}
    # while-loop device time: attribute to the variant that has one (the
    # rle gather walk); rows/sweep have none
    wh = sum(v for k, v in tot.items() if k.startswith("while"))
    if "rle" in out:
        out["rle"]["while_s"] = wh / reps / 1e6
    return out


def bench_align_stage(cfg, overlaps="sample_overlaps.paf.gz",
                      targets="sample_layout.fasta.gz", ptype=None,
                      reads="sample_reads.fastq.gz", datadir=None):
    """Overlap-alignment stage on REAL data (/root/reference/test/data):
    overlaps/s through the device tier ladder vs the native host aligner
    (the reference edlib role). Default: the 181 read->contig sample PAF;
    main() also runs the 8,016-overlap all-vs-all PAF (ava mode, VERDICT
    r2 item 2's scale) and a synthetic long-read set (datadir override)
    that lands on the 40960-cap Myers tiers."""
    import contextlib
    import dataclasses
    import io
    import os

    from racon_tpu.polisher import create_polisher
    from racon_tpu.utils.logger import Logger

    d = datadir or "/root/reference/test/data"
    if not os.path.isdir(d):
        return None
    if ptype is not None:
        cfg = dataclasses.replace(cfg, type=ptype, match=1, mismatch=-1,
                                  gap=-1)
    p = create_polisher(os.path.join(d, reads),
                        os.path.join(d, overlaps),
                        os.path.join(d, targets), cfg)
    # run initialize() but intercept the align stage to time both backends
    from racon_tpu.native.align_stage import NativeAlignStage
    from racon_tpu.ops.align_stage_tpu import TpuAlignStage

    result = {}
    orig = NativeAlignStage.breaking_points

    def probe(self, overlaps, indices, sequences, window_length, logger):
        sink = Logger()
        with contextlib.redirect_stderr(io.StringIO()):
            host_stage = NativeAlignStage(cfg)
            t0 = time.monotonic()
            host_bp = orig(host_stage, overlaps, indices, sequences,
                           window_length, sink)
            host_dt = time.monotonic() - t0
            result["n_overlaps"] = len(indices)
            result["host_seconds"] = round(host_dt, 3)
            result["host_overlaps_per_s"] = round(len(indices) / host_dt, 1)
            dev = TpuAlignStage.try_create(cfg)
            if dev is not None:
                # force the device path even below the auto-route
                # threshold — this block MEASURES that threshold's inputs
                os.environ["RACON_TPU_ALIGN_DEVICE_MIN"] = "0"
                try:
                    t0 = time.monotonic()
                    dev.breaking_points(overlaps, indices, sequences,
                                        window_length, sink)  # warm
                    result["device_cold_seconds"] = round(
                        time.monotonic() - t0, 3)
                    t0 = time.monotonic()
                    dev.breaking_points(overlaps, indices, sequences,
                                        window_length, sink)
                    dev_dt = time.monotonic() - t0
                finally:
                    os.environ.pop("RACON_TPU_ALIGN_DEVICE_MIN", None)
                result["device_seconds"] = round(dev_dt, 3)
                result["device_overlaps_per_s"] = round(
                    len(indices) / dev_dt, 1)
                # warm-state route (small batches go to host only while
                # the align programs are still compiling/ingesting)
                result["auto_route"] = (
                    "host" if dev.small_batch_to_host(len(indices))
                    else "device")
        return host_bp

    NativeAlignStage.breaking_points = probe
    import dataclasses
    p.config = dataclasses.replace(cfg, backend="native")
    try:
        with contextlib.redirect_stderr(io.StringIO()):
            p.initialize()
    finally:
        NativeAlignStage.breaking_points = orig
    return result


def bench_align_stage_long(cfg, n_reads=300):
    """Long-overlap align stage: SYNTHETIC 30-38 kb reads against a
    400 kb draft (8% subs + balanced 1.5% indels so the diagonal stays
    within the band). These spans land on the 40960-cap tiers, which ran
    the scored sweeps (t8big rle / lane-major packed2) until the
    windowed-Peq Myers panels made the whole ladder bit-parallel —
    this entry records that tier's device-vs-host stage throughput."""
    import os
    import tempfile

    ACGT = np.frombuffer(b"ACGT", np.uint8)
    rng = np.random.default_rng(4099)
    G = 400_000
    true = rng.choice(ACGT, G)
    draft = true.copy()
    for pos in rng.choice(G, G // 200, replace=False):
        draft[pos] = rng.choice(ACGT)
    with tempfile.TemporaryDirectory(prefix="racon_long_") as td:
        paf = []
        with open(os.path.join(td, "reads.fasta"), "wb") as f:
            for r in range(n_reads):
                rlen = int(rng.integers(30_000, 38_000))
                s = int(rng.integers(0, G - rlen))
                seg = true[s : s + rlen].copy()
                for pos in rng.choice(rlen, int(rlen * 0.08),
                                      replace=False):
                    seg[pos] = rng.choice(ACGT)
                nd = int(rlen * 0.015)
                seg = np.delete(seg, rng.choice(len(seg) - 2, nd,
                                                replace=False))
                ins = rng.choice(len(seg) - 2, nd, replace=False)
                seg = np.insert(seg, ins, rng.choice(ACGT, nd))
                f.write(b">r%d\n" % r + seg.tobytes() + b"\n")
                paf.append("\t".join(map(str, (
                    f"r{r}", len(seg), 0, len(seg), "+", "ctg", G, s,
                    s + rlen, len(seg) * 9 // 10, len(seg), 60))))
        with open(os.path.join(td, "ovl.paf"), "w") as f:
            f.write("\n".join(paf) + "\n")
        with open(os.path.join(td, "draft.fasta"), "wb") as f:
            f.write(b">ctg\n" + draft.tobytes() + b"\n")
        out = bench_align_stage(cfg, overlaps="ovl.paf",
                                targets="draft.fasta", reads="reads.fasta",
                                datadir=td)
    if out is not None:
        out["data"] = "synthetic 30-38 kb reads (40960-cap tier domain)"
    return out


def bench_merge_scaling(tpu, windows, cfg, reps=3):
    """Merge-ONLY thread scaling: capture real rt_poa_round_batch calls
    from one stage run (device in the loop only for the capture), then
    replay JUST the native merge at 1 vs N threads. Pins whether the host
    merge itself parallelizes or is serialized elsewhere (VERDICT r3
    weak 1: stage-level 1->2 threads moved only +6.7% while the stage was
    55.6% host-bound)."""
    import inspect

    from racon_tpu.native import bindings

    captured = []
    orig = bindings.poa_round_batch
    sig = inspect.signature(orig)

    def spy(*a, **k):
        if len(captured) < 3:
            # deep-copy: the stage reuses/mutates its blobs across rounds
            # (in-place decode buffers), so replaying aliased views reads
            # inconsistent data (segfault in the native merge)
            snap_a = tuple(np.array(x, copy=True)
                           if isinstance(x, np.ndarray) else x for x in a)
            snap_k = {kk: (np.array(v, copy=True)
                           if isinstance(v, np.ndarray) else v)
                      for kk, v in k.items()}
            captured.append((snap_a, snap_k))
        return orig(*a, **k)

    bindings.poa_round_batch = spy
    try:
        run_stage(tpu, windows, cfg)
    finally:
        bindings.poa_round_batch = orig
    if not captured:
        return {"error": "no merge calls captured"}
    out = {}
    n_win = sum(len(a[1]) - 1 for a, _ in captured)  # cur_off per call
    for thr in (1, 2, cfg.num_threads):
        if f"threads_{thr}" in out:
            continue
        calls = []
        for a, k in captured:
            b = sig.bind(*a, **k)
            b.arguments["n_threads"] = thr
            calls.append((b.args, b.kwargs))
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            for args, kwargs in calls:
                orig(*args, **kwargs)
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[f"threads_{thr}"] = {
            "seconds": round(best, 4),
            "window_rounds_per_s": round(n_win / best, 1)}
    t1 = out["threads_1"]["window_rounds_per_s"]
    tN = out[f"threads_{max(2, cfg.num_threads)}"]["window_rounds_per_s"]
    out["scaling_x"] = round(tN / t1, 3) if t1 else None
    return out


def _tunnel_probe():
    """Session-condition stamp recorded at the top of every ledger: the
    axon tunnel's sync+D2H round-trip for a 4 MB payload drifts by an
    order of magnitude across sessions (a degraded session measured
    ~150 ms/4 MB and collapsed stage throughput ~4x while the
    profiler-trace kernel times were unchanged). Wall-clock stage
    numbers are only comparable between ledgers with similar probes."""
    try:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((4096, 1024), jnp.uint8)
        f = jax.jit(lambda a: a + 1)
        np.asarray(f(x))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            for _ in range(5):
                np.asarray(f(x))
            best = min(best, (time.monotonic() - t0) / 5)
        out = {"sync_d2h_4mb_ms": round(best * 1e3, 1)}
        # the value ROUTING saw (jaxenv.link_probe_ms feeds devgather /
        # Myers-payload policy); may differ slightly from the stamp above
        # (min-of-singles vs min-of-averaged-5)
        from racon_tpu.utils import jaxenv

        ms = jaxenv.link_probe_ms()
        out["routing_probe_ms"] = None if ms is None else round(ms, 1)
        out["slow_link_routing"] = jaxenv.slow_link()
        return out
    except Exception as e:  # pragma: no cover
        return {"error": str(e)}


def main():
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.native.consensus_stage import NativeConsensusStage
    from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
    import os

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 8,
                         match=5, mismatch=-4, gap=-8)
    windows, true = build_workload()

    lay_per_win = (len(windows.lay_win) / windows.num_windows
                   if windows.num_windows else 0.0)
    ledger = {"workload": {"n_windows": windows.num_windows,
                           "window_len": WINDOW_LEN, "depth": DEPTH,
                           "layers_per_window_measured": round(lay_per_win, 2),
                           "read_error": ERR, "host_threads":
                           cfg.num_threads},
              "tunnel_probe": _tunnel_probe()}

    # CPU baseline (racon-equivalent host path), once
    cpu_dt, cpu_cons = run_stage(NativeConsensusStage(cfg), windows, cfg)
    cpu_wps = windows.num_windows / cpu_dt
    ledger["consensus_host"] = {"seconds": round(cpu_dt, 3),
                                "windows_per_s": round(cpu_wps, 2)}

    # the ledger's device blocks measure the DEVICE path by definition;
    # without this the cheapest-path router could (correctly) send a
    # cold-process run to the host and the ledger would measure nothing
    os.environ.setdefault("RACON_TPU_CONSENSUS_ROUTE", "device")
    tpu = TpuConsensusStage.try_create(cfg)
    if tpu is None:
        _write_ledger(ledger)
        print(json.dumps({"metric": "poa_windows_per_s_per_chip",
                          "value": round(cpu_wps, 2), "unit": "windows/s",
                          "vs_baseline": 1.0}))
        return

    # warm-up (compile)
    t0 = time.monotonic()
    run_stage(tpu, windows, cfg)
    ledger["consensus_cold_seconds"] = round(time.monotonic() - t0, 3)
    times = []
    profs = []
    for _ in range(REPEATS):
        dt, tpu_cons = run_stage(tpu, windows, cfg)
        times.append(dt)
        profs.append(dict(tpu.prof))
    tpu_dt = statistics.median(times)
    tpu_wps = windows.num_windows / tpu_dt
    prof = profs[times.index(tpu_dt)]
    fetch = prof.get("fetch_s", 0.0)
    disp = prof.get("dispatch_s", 0.0)
    merge = prof.get("merge_s", 0.0)
    ledger["consensus_device"] = {
        "seconds": round(tpu_dt, 3),
        "windows_per_s": round(tpu_wps, 2),
        "host_dispatch_s": round(disp, 3),
        "device_wait_s": round(fetch, 3),  # underestimates device busy:
        # cohort pipelining overlaps other dispatches with the host merge
        "host_merge_s": round(merge, 3),
        # merge_s sub-split: native star-POA merge, op-stream decode,
        # host-fallback realignment of band escapes, state glue
        "merge_poa_round_s": round(prof.get("poa_round_s", 0.0), 3),
        "merge_decode_s": round(prof.get("decode_s", 0.0), 3),
        "merge_host_fallback_s": round(prof.get("host_fallback_s", 0.0), 3),
        "merge_state_glue_s": round(prof.get("stateglue_s", 0.0), 3),
        "host_fallback_items": int(prof.get("host_fallback_items", 0)),
        "host_bound_pct": round(100.0 * (disp + merge) / tpu_dt, 1),
        "all_runs_s": [round(t, 3) for t in times],
    }

    # host-thread scaling of the TPU-path stage: the host merge is the
    # dominant serial-per-host cost (see host_bound_pct); it parallelizes
    # over windows, so windows/s scales with host cores until the device
    # becomes the wall. Arms are INTERLEAVED same-session (A/B/A/B, min
    # per arm) so tunnel drift between arms cannot publish inverted
    # scaling — the committed r4 ledger showed 659 -> 531 w/s for 1 -> 2
    # threads purely because the arms ran minutes apart (VERDICT r4
    # weak #1); the interleave makes that artifact structurally
    # impossible to record.
    try:
        import dataclasses
        cfg1 = dataclasses.replace(cfg, num_threads=1)
        thrN = max(2, cfg.num_threads)
        bests = {1: float("inf"), thrN: float("inf")}
        for _ in range(2):
            for thr, c in ((1, cfg1), (thrN, cfg)):
                dt, _ = run_stage(tpu, windows, c)
                bests[thr] = min(bests[thr], dt)
        ledger["host_thread_scaling"] = {
            "threads_1_windows_per_s":
                round(windows.num_windows / bests[1], 2),
            f"threads_{thrN}_windows_per_s":
                round(windows.num_windows / bests[thrN], 2),
            "note": "arms interleaved same-session, min of 2 runs each",
        }
    except Exception as e:  # pragma: no cover
        ledger["host_thread_scaling"] = {"error": str(e)}

    # merge-ONLY thread scaling (no device in the replay loop)
    try:
        ledger["merge_thread_scaling"] = bench_merge_scaling(tpu, windows,
                                                             cfg)
    except Exception as e:  # pragma: no cover
        ledger["merge_thread_scaling"] = {"error": str(e)}

    # device-only kernel throughput + speed-of-light accounting (real
    # chips only: the transposed kernel has no interpret mode)
    if not tpu.interpret:
        try:
            ledger["kernel_640x128"] = bench_kernel_cells()
        except Exception as e:  # pragma: no cover - must not kill bench
            ledger["kernel_640x128"] = {"error": str(e)}

    # overlap-alignment stage on real data (the OTHER hot loop): the 181
    # read->contig overlaps AND the 8,016 all-vs-all overlaps (ava scale)
    try:
        ledger["align_stage_sample_paf"] = bench_align_stage(cfg)
    except Exception as e:  # pragma: no cover
        ledger["align_stage_sample_paf"] = {"error": str(e)}
    try:
        from racon_tpu.models.polish_model import PolisherType
        ledger["align_stage_ava_paf"] = bench_align_stage(
            cfg, overlaps="sample_ava_overlaps.paf.gz",
            targets="sample_reads.fastq.gz", ptype=PolisherType.kF)
    except Exception as e:  # pragma: no cover
        ledger["align_stage_ava_paf"] = {"error": str(e)}
    try:
        ledger["align_stage_long_synth"] = bench_align_stage_long(cfg)
    except Exception as e:  # pragma: no cover
        ledger["align_stage_long_synth"] = {"error": str(e)}

    # sanity: consensus quality comparable between paths
    from racon_tpu.native import bindings
    d_tpu = bindings.edit_distance(b"".join(tpu_cons), true.tobytes())
    d_cpu = bindings.edit_distance(b"".join(cpu_cons), true.tobytes())
    ledger["quality"] = {"dataset": "bench synthetic workload "
                         f"({windows.num_windows} windows, err={ERR}); "
                         "golden-dataset numbers live in docs/PARITY.md",
                         "edit_vs_truth_device": int(d_tpu),
                         "edit_vs_truth_host": int(d_cpu)}
    _write_ledger(ledger)
    sys.stderr.write(f"[bench] edit-vs-truth tpu={d_tpu} cpu={d_cpu} "
                     f"cpu_wps={cpu_wps:.1f} tpu_times={times}\n")
    sys.stderr.write("[bench] ledger -> BENCH_LEDGER.json: "
                     + json.dumps(ledger) + "\n")

    print(json.dumps({"metric": "poa_windows_per_s_per_chip",
                      "value": round(tpu_wps, 2), "unit": "windows/s",
                      "vs_baseline": round(tpu_wps / cpu_wps, 3)}))


def _write_ledger(ledger):
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LEDGER.json")
    with open(path, "w") as f:
        json.dump(ledger, f, indent=1)


if __name__ == "__main__":
    main()
    # hard-exit like cli.run(): the tunnel plugin's teardown can abort
    # ("FATAL: exception not rethrown") seconds after fresh program
    # compiles, past the point all output was written
    import os

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
