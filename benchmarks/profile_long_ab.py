#!/usr/bin/env python
"""Same-session stage-level A/B at the long-read align tier (40960 cap):
Myers bit-parallel (rows payload, 41 KB/item) vs the scored sweep (rle
payload, ~10 KB/item), via the RACON_TPU_MYERS_PAYLOAD_MAX routing knob.

The r4 A/B (0.654 s scored vs 0.907 s Myers per 300 overlaps) that set
the slow-link 16 KB payload cap ran BEFORE async payload prefetch
existed; prefetch hides the fixed per-fetch sync latency, so the
tradeoff needs re-measuring — if Myers wins now, the slow-link payload
cap should rise to include the 40960 tiers (kF long-read initialize is
bound by exactly this tier, VERDICT r5 item 7).

Usage: python benchmarks/profile_long_ab.py [n_reads=300] [reps=3]
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from racon_tpu.models.polish_model import PolisherConfig  # noqa: E402
from racon_tpu.utils import jaxenv  # noqa: E402


def main(n_reads=300, reps=3):
    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         match=5, mismatch=-4, gap=-8)
    probe0 = jaxenv.link_probe_ms()
    print(f"probe at start: {probe0:.1f} ms/4MB")

    arms = (("scored-rle", {"RACON_TPU_MYERS": "0",
                            "RACON_TPU_MYERS_PAYLOAD_MAX": "1024"}),
            ("myers-rows", {"RACON_TPU_MYERS": "1",
                            "RACON_TPU_MYERS_PAYLOAD_MAX": "65536"}),
            ("myers-rle", {"RACON_TPU_MYERS": "1",
                           "RACON_TPU_MYERS_PAYLOAD_MAX": "1024"}))
    results = {name: [] for name, _ in arms}
    for rep in range(reps):
        for name, env in arms:
            for k, v in env.items():
                os.environ[k] = v
            out = bench.bench_align_stage_long(cfg, n_reads=n_reads)
            results[name].append(out["device_seconds"])
            if rep == 0:
                print(f"  [{name}] cold={out['device_cold_seconds']:.2f}s")
    os.environ.pop("RACON_TPU_MYERS_PAYLOAD_MAX", None)
    os.environ.pop("RACON_TPU_MYERS", None)
    for name, _ in arms:
        best = min(results[name])
        print(f"{name:11s} best={best:6.3f}s "
              f"{n_reads / best:7.1f} o/s  "
              f"all={[round(t, 3) for t in results[name]]}")
    try:
        probe1 = bench._tunnel_probe().get("sync_d2h_4mb_ms")
        print(f"probe at end: {probe1} ms/4MB")
    except Exception:
        pass


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(n, r)
    sys.stdout.flush()
    os._exit(0)  # axon teardown aborts after fresh compiles
