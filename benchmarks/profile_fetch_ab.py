#!/usr/bin/env python
"""Same-session A/B of the async payload prefetch (ops/prefetch.py) and
cohort depth on the bench consensus workload. The r4 regression was
device_wait_s — blocking payload fetches whose fixed sync latencies sum
on the stage thread at degraded tunnel probes — so arms are interleaved
in ONE session and the ledger line carries the probe stamp.

Usage: python benchmarks/profile_fetch_ab.py [n_windows] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from racon_tpu.models.polish_model import PolisherConfig  # noqa: E402
from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage  # noqa: E402
from racon_tpu.utils import jaxenv  # noqa: E402


def main(n_windows=2048, reps=3):
    os.environ.setdefault("RACON_TPU_CONSENSUS_ROUTE", "device")
    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         match=5, mismatch=-4, gap=-8)
    windows, true = bench.build_workload(n_windows=n_windows)
    stage = TpuConsensusStage.try_create(cfg)
    assert stage is not None and not stage.interpret, "need the real chip"

    probe0 = jaxenv.link_probe_ms()
    print(f"probe at start: {probe0:.1f} ms/4MB")

    # warm all programs once
    bench.run_stage(stage, windows, cfg)

    arms = []
    for coh in ("1", "2", "3", "4", "6"):
        arms.append((f"coh{coh}+prefetch", {"RACON_TPU_COHORTS": coh,
                                            "RACON_TPU_FETCH_THREADS": "4"}))
    arms.append(("coh3+inline", {"RACON_TPU_COHORTS": "3",
                                 "RACON_TPU_FETCH_THREADS": "0"}))
    results = {a: [] for a, _ in arms}
    profs = {}
    for rep in range(reps):  # interleave arms within each rep
        for name, env in arms:
            for k, v in env.items():
                os.environ[k] = v
            dt, cons = bench.run_stage(stage, windows, cfg)
            results[name].append(dt)
            profs[name] = dict(stage.prof)
    for k in ("RACON_TPU_COHORTS", "RACON_TPU_FETCH_THREADS"):
        os.environ.pop(k, None)

    probe1 = None
    try:
        probe1 = bench._tunnel_probe().get("sync_d2h_4mb_ms")
    except Exception:
        pass
    out = {"probe_start_ms": round(probe0, 1), "probe_end_ms": probe1,
           "n_windows": windows.num_windows, "arms": {}}
    for name, _ in arms:
        best = min(results[name])
        p = profs[name]
        out["arms"][name] = {
            "best_s": round(best, 3),
            "windows_per_s": round(windows.num_windows / best, 1),
            "all_s": [round(t, 3) for t in results[name]],
            "device_wait_s": round(p.get("fetch_s", 0.0), 3),
            "dispatch_s": round(p.get("dispatch_s", 0.0), 3),
            "merge_s": round(p.get("merge_s", 0.0), 3)}
        print(f"{name:16s} best={best:6.3f}s "
              f"{windows.num_windows / best:7.1f} w/s  "
              f"wait={p.get('fetch_s', 0.0):.3f}s  "
              f"all={[round(t, 2) for t in results[name]]}")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(n, r)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon teardown aborts after fresh compiles (memory note)
