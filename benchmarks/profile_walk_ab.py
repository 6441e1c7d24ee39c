#!/usr/bin/env python
"""Stage-level A/B of the walk format on the bench consensus workload:
RACON_TPU_WALK=rows vs rle in ONE session (cross-session tunnel variance
makes separate runs incomparable). Prints windows/s and the stage's
profile split for each."""

import os
import sys
import time

import numpy as np  # noqa: F401

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from racon_tpu.models.polish_model import PolisherConfig  # noqa: E402
from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage  # noqa: E402


def main(n_windows=2048, reps=3):
    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         match=5, mismatch=-4, gap=-8)
    windows, true = bench.build_workload(n_windows=n_windows)
    stage = TpuConsensusStage.try_create(cfg)
    assert stage is not None and not stage.interpret, "need the real chip"
    for fmt in ("rows", "rle", "rows"):
        os.environ["RACON_TPU_WALK"] = fmt
        times = []
        for _ in range(reps):
            dt, cons = bench.run_stage(stage, windows, cfg)
            times.append(dt)
        best = min(times)
        prof = dict(stage.prof)
        wps = windows.num_windows / best
        print(f"fmt={fmt:5s} best={best:6.3f}s  {wps:7.1f} w/s  "
              f"all={['%.2f' % t for t in times]}")
        keys = ("dispatch_s", "fetch_s", "decode_s", "poa_round_s",
                "host_fallback_items")
        print("   " + "  ".join(f"{k}={prof.get(k, 0):.3f}"
                                if isinstance(prof.get(k, 0), float)
                                else f"{k}={prof.get(k, 0)}"
                                for k in keys))


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    main(**kwargs)
