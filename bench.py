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
    # reads tile the target; each read ~2kb covering 4 windows, staggered.
    # read r spans draft[start:end]; its error-free source is the matching
    # true-coordinate slice (keep[] maps between the two systems)
    read_len_t = 4 * window_len
    step = read_len_t // (DEPTH // 4)
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
    from racon_tpu.core.overlaps import OverlapTable
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


def main():
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.native.consensus_stage import NativeConsensusStage
    from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
    import os

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 8,
                         match=5, mismatch=-4, gap=-8)
    windows, true = build_workload()

    # CPU baseline (racon-equivalent host path), once
    cpu_dt, cpu_cons = run_stage(NativeConsensusStage(cfg), windows, cfg)
    cpu_wps = windows.num_windows / cpu_dt

    tpu = TpuConsensusStage.try_create(cfg)
    if tpu is None:
        print(json.dumps({"metric": "poa_windows_per_s_per_chip",
                          "value": round(cpu_wps, 2), "unit": "windows/s",
                          "vs_baseline": 1.0}))
        return

    # warm-up (compile)
    run_stage(tpu, windows, cfg)
    times = []
    for _ in range(REPEATS):
        dt, tpu_cons = run_stage(tpu, windows, cfg)
        times.append(dt)
    tpu_dt = statistics.median(times)
    tpu_wps = windows.num_windows / tpu_dt

    # sanity: consensus quality comparable between paths
    from racon_tpu.native import bindings
    d_tpu = bindings.edit_distance(b"".join(tpu_cons), true.tobytes())
    d_cpu = bindings.edit_distance(b"".join(cpu_cons), true.tobytes())
    sys.stderr.write(f"[bench] edit-vs-truth tpu={d_tpu} cpu={d_cpu} "
                     f"cpu_wps={cpu_wps:.1f} tpu_times={times}\n")

    print(json.dumps({"metric": "poa_windows_per_s_per_chip",
                      "value": round(tpu_wps, 2), "unit": "windows/s",
                      "vs_baseline": round(tpu_wps / cpu_wps, 3)}))


if __name__ == "__main__":
    main()
