"""Phase-level timing breakdown of the TPU consensus stage on the bench
workload: how much of a refinement round is device align+walk dispatch,
payload fetch/decode, host merge, and state glue. Run on the real chip.

Usage: python benchmarks/profile_stage.py [n_windows]
"""

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
    import os

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 8,
                         match=5, mismatch=-4, gap=-8)
    windows, true = bench.build_workload(n_windows=n_windows)
    stage = TpuConsensusStage.try_create(cfg)
    if stage is None:
        print("no TPU stage available")
        return

    # warm-up/compile
    with contextlib.redirect_stderr(io.StringIO()):
        stage.consensus_windows(windows, cfg, Logger())

    # monkeypatch phase timers around the round halves
    import racon_tpu.ops.consensus_stage_tpu as mod

    times = {"dispatch": 0.0, "complete": 0.0}
    orig_dispatch = mod.TpuConsensusStage._round_dispatch
    orig_complete = mod.TpuConsensusStage._round_complete

    def timed_dispatch(self, *a, **k):
        t0 = time.monotonic()
        r = orig_dispatch(self, *a, **k)
        times["dispatch"] += time.monotonic() - t0
        return r

    def timed_complete(self, *a, **k):
        t0 = time.monotonic()
        r = orig_complete(self, *a, **k)
        times["complete"] += time.monotonic() - t0
        return r

    mod.TpuConsensusStage._round_dispatch = timed_dispatch
    mod.TpuConsensusStage._round_complete = timed_complete

    # also time the payload fetch (np.asarray of the device payload) and the
    # native merge inside _round_complete by wrapping bindings
    from racon_tpu.native import bindings
    merge_t = {"t": 0.0}
    orig_merge = bindings.poa_round_batch

    def timed_merge(*a, **k):
        t0 = time.monotonic()
        r = orig_merge(*a, **k)
        merge_t["t"] += time.monotonic() - t0
        return r

    bindings.poa_round_batch = timed_merge

    t0 = time.monotonic()
    with contextlib.redirect_stderr(io.StringIO()):
        stage.consensus_windows(windows, cfg, Logger())
    total = time.monotonic() - t0

    bindings.poa_round_batch = orig_merge
    mod.TpuConsensusStage._round_dispatch = orig_dispatch
    mod.TpuConsensusStage._round_complete = orig_complete

    print(f"windows={n_windows} total={total:.3f}s "
          f"wps={n_windows/total:.0f}")
    print(f"  dispatch (pack+H2D+launch): {times['dispatch']:.3f}s")
    print(f"  complete (fetch+decode+merge+state): {times['complete']:.3f}s")
    print(f"    of which native merge: {merge_t['t']:.3f}s")
    print(f"  unaccounted (cohort overlap hides some): "
          f"{total - times['dispatch'] - times['complete']:.3f}s")


if __name__ == "__main__":
    main()
