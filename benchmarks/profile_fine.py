"""Fine-grained host-side cost attribution for the TPU consensus stage:
wraps each native binding + times the payload fetch. Run with
RACON_TPU_COHORTS=1 for clean attribution."""

import sys
import time
import contextlib
import io
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
    from racon_tpu.utils.logger import Logger
    from racon_tpu.native import bindings
    import racon_tpu.ops.consensus_stage_tpu as mod
    import os

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 8,
                         match=5, mismatch=-4, gap=-8)
    windows, true = bench.build_workload(n_windows=n_windows)
    stage = TpuConsensusStage.try_create(cfg)
    with contextlib.redirect_stderr(io.StringIO()):
        stage.consensus_windows(windows, cfg, Logger())

    acc = defaultdict(float)
    cnt = defaultdict(int)

    def wrap(name):
        orig = getattr(bindings, name)

        def w(*a, **k):
            t0 = time.monotonic()
            r = orig(*a, **k)
            acc[name] += time.monotonic() - t0
            cnt[name] += 1
            return r
        return orig, w

    names = ["poa_round_batch", "opstream_rle_to_ops_batch",
             "opstream_packed_to_ops_batch", "gather_ranges",
             "align_batch_percol", "pack_rows_nib", "pack_rows_bits"]
    origs = {}
    for nm in names:
        origs[nm], w = wrap(nm)
        setattr(bindings, nm, w)

    # time payload fetches
    orig_complete = mod.TpuConsensusStage._round_complete

    def timed_complete(self, ctx, *a, **k):
        t0 = time.monotonic()
        for sel, cap, w_band, fmt, payload in ctx["pending"]:
            np.asarray(payload)
        acc["payload_fetch"] += time.monotonic() - t0
        cnt["payload_fetch"] += len(ctx["pending"])
        t0 = time.monotonic()
        r = orig_complete(self, ctx, *a, **k)
        acc["_round_complete_total"] += time.monotonic() - t0
        return r

    orig_dispatch = mod.TpuConsensusStage._round_dispatch

    def timed_dispatch(self, *a, **k):
        t0 = time.monotonic()
        r = orig_dispatch(self, *a, **k)
        acc["_round_dispatch_total"] += time.monotonic() - t0
        return r

    mod.TpuConsensusStage._round_complete = timed_complete
    mod.TpuConsensusStage._round_dispatch = timed_dispatch

    t0 = time.monotonic()
    with contextlib.redirect_stderr(io.StringIO()):
        stage.consensus_windows(windows, cfg, Logger())
    total = time.monotonic() - t0

    for nm in names:
        setattr(bindings, nm, origs[nm])
    mod.TpuConsensusStage._round_complete = orig_complete
    mod.TpuConsensusStage._round_dispatch = orig_dispatch

    print(f"total={total:.3f}s wps={n_windows/total:.0f}")
    for k in sorted(acc, key=lambda k: -acc[k]):
        print(f"  {k:32s} {acc[k]*1e3:8.1f} ms  x{cnt[k]}")


if __name__ == "__main__":
    main()
