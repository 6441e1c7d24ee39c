"""Count device items/chunks per round in the bench workload and the time
spent blocked on payload fetches. Run on the real chip."""

import sys
import time
import contextlib
import io

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
    from racon_tpu.utils.logger import Logger
    import racon_tpu.ops.consensus_stage_tpu as mod
    import os

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 8,
                         match=5, mismatch=-4, gap=-8)
    windows, true = bench.build_workload(n_windows=n_windows)
    stage = TpuConsensusStage.try_create(cfg)

    with contextlib.redirect_stderr(io.StringIO()):
        stage.consensus_windows(windows, cfg, Logger())

    stats = {"chunks": [], "fetch_t": 0.0}
    orig = mod.align_walk_padded

    def wrapped(q4, t4, dcb, m, n, **kw):
        stats["chunks"].append((len(m), kw.get("m_cap"), kw.get("w_band")))
        return orig(q4, t4, dcb, m, n, **kw)

    mod.align_walk_padded = wrapped

    # time the fetch by wrapping _round_complete's np.asarray via the module
    orig_complete = mod.TpuConsensusStage._round_complete

    def timed_complete(self, ctx, *a, **k):
        t0 = time.monotonic()
        for sel, cap, w_band, fmt, payload in ctx["pending"]:
            np.asarray(payload)
        stats["fetch_t"] += time.monotonic() - t0
        return orig_complete(self, ctx, *a, **k)

    mod.TpuConsensusStage._round_complete = timed_complete

    t0 = time.monotonic()
    with contextlib.redirect_stderr(io.StringIO()):
        stage.consensus_windows(windows, cfg, Logger())
    total = time.monotonic() - t0
    mod.align_walk_padded = orig
    mod.TpuConsensusStage._round_complete = orig_complete

    n_items = sum(c[0] for c in stats["chunks"])
    print(f"total={total:.3f}s  chunks={len(stats['chunks'])} "
          f"items={n_items}  fetch_block={stats['fetch_t']:.3f}s")
    from collections import Counter
    print(Counter(stats["chunks"]))


if __name__ == "__main__":
    main()
