#!/usr/bin/env python
"""kF long-read align-stage attribution + band experiment (VERDICT r5
item 7): on the 30 kb-read ava overlap set, time the device align stage
with the default tier ladder vs one with a narrower (40960, 512) first
tier, counting per-tier items and host-fallback share. Same session,
interleaved. Needs an existing --mode kf workdir (reads.fasta + ava.paf).

Usage: python benchmarks/profile_kf_align.py [workdir] [reps=2]
"""

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from racon_tpu.models.polish_model import PolisherConfig, PolisherType  # noqa: E402
from racon_tpu.utils import jaxenv  # noqa: E402


def main(wd="/tmp/rg_r5_kf", reps=2):
    import racon_tpu.ops.align_stage_tpu as astm
    from racon_tpu.polisher import create_polisher
    from racon_tpu.utils.logger import Logger

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         type=PolisherType.kF, match=1, mismatch=-1, gap=-1)
    p = create_polisher(os.path.join(wd, "reads.fasta"),
                        os.path.join(wd, "ava.paf"),
                        os.path.join(wd, "reads.fasta"), cfg)
    # parse inputs only: replicate initialize()'s front half via the
    # align-stage interception trick bench.py uses
    from racon_tpu.native.align_stage import NativeAlignStage

    state = {}
    orig = NativeAlignStage.breaking_points

    def grab(self, overlaps, indices, sequences, window_length, logger):
        state.update(overlaps=overlaps, indices=indices,
                     sequences=sequences, w=window_length)
        return orig(self, overlaps, indices, sequences, window_length,
                    logger)

    NativeAlignStage.breaking_points = grab
    import dataclasses
    p.config = dataclasses.replace(cfg, backend="native")
    try:
        with contextlib.redirect_stderr(io.StringIO()):
            p.initialize()
    finally:
        NativeAlignStage.breaking_points = orig
    p.config = cfg
    n = len(state["indices"])
    print(f"probe {jaxenv.link_probe_ms():.1f} ms/4MB; {n} overlaps")

    stage = astm.TpuAlignStage.try_create(cfg)
    assert stage is not None and not stage.interpret

    default_tiers = astm._TIERS
    narrow_tiers = ((2560, 512), (10240, 1024), (40960, 512),
                    (40960, 1024), (10240, 4096), (40960, 4096))
    arms = (("default", default_tiers), ("narrow512", narrow_tiers))
    os.environ["RACON_TPU_ALIGN_DEVICE_MIN"] = "0"
    times = {a: [] for a, _ in arms}
    for rep in range(reps + 1):  # rep 0 warms compiles, discarded
        for name, tiers in arms:
            astm._TIERS = tiers
            sink = Logger()
            t0 = time.monotonic()
            with contextlib.redirect_stderr(io.StringIO()):
                stage.breaking_points(state["overlaps"], state["indices"],
                                      state["sequences"], state["w"], sink)
            dt = time.monotonic() - t0
            if rep:
                times[name].append(dt)
    astm._TIERS = default_tiers
    os.environ.pop("RACON_TPU_ALIGN_DEVICE_MIN", None)

    # tier composition + band-escape share per arm (one extra pass with
    # counters via the host list length)
    for name, tiers in arms:
        idx = np.asarray(state["indices"], np.int64)
        ov = state["overlaps"]
        mlen = (np.asarray(ov.q_end)[idx] - np.asarray(ov.q_begin)[idx])
        nlen = (np.asarray(ov.t_end)[idx] - np.asarray(ov.t_begin)[idx])
        tier_id = np.full(len(idx), -1, np.int64)
        for ti, (cap, band) in enumerate(tiers):
            ok = ((tier_id < 0) & (mlen <= cap) & (nlen <= cap)
                  & (np.abs(nlen - mlen) <= band // 2 - 64))
            tier_id[ok] = ti
        comp = {f"{c}/{b}": int((tier_id == ti).sum())
                for ti, (c, b) in enumerate(tiers)
                if (tier_id == ti).sum()}
        best = min(times[name])
        print(f"{name:10s} best={best:6.2f}s {n / best:7.1f} o/s  "
              f"tiers={comp}  all={[round(t, 2) for t in times[name]]}")


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rg_r5_kf"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(wd, reps)
    sys.stdout.flush()
    os._exit(0)
