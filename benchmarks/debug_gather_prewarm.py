#!/usr/bin/env python
"""Prediction-accuracy debug for prewarm_polish: record the speculative
gather specs (first prewarm_gather_async call, from the polisher's
initialize hook) vs the dispatch-time specs (later calls from
_round_dispatch), plus dense prewarm specs, on a small genome run.
Prints the miss set — the programs a one-shot run still compiles at
polish time."""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from benchmarks.genome_scale import make_dataset  # noqa: E402


def main(genome_mb=0.4):
    wd = "/tmp/racon_dbg_prewarm"
    os.makedirs(wd, exist_ok=True)
    make_dataset(wd, int(genome_mb * 1e6), 8000, 20, 0.12)

    from racon_tpu.ops import nw_kernel

    calls = []
    orig_g = nw_kernel.prewarm_gather_async
    orig_d = nw_kernel.prewarm_tiers_async

    def spy_g(specs):
        calls.append(("gather", time.monotonic(), set(specs)))
        return orig_g(specs)

    def spy_d(specs):
        calls.append(("dense", time.monotonic(), set(specs)))
        return orig_d(specs)

    nw_kernel.prewarm_gather_async = spy_g
    nw_kernel.prewarm_tiers_async = spy_d

    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.polisher import create_polisher

    cfg = PolisherConfig(backend="auto", num_threads=2, match=5,
                         mismatch=-4, gap=-8)
    p = create_polisher(os.path.join(wd, "reads.fasta"),
                        os.path.join(wd, "ovl.paf"),
                        os.path.join(wd, "draft.fasta"), cfg)
    t0 = time.monotonic()
    import contextlib, io
    with contextlib.redirect_stderr(io.StringIO()):
        p.initialize()
    t_init = time.monotonic()
    with contextlib.redirect_stderr(io.StringIO()):
        p.polish(drop_unpolished_sequences=True)
    t_pol = time.monotonic()

    print(f"init {t_init - t0:.1f}s  polish {t_pol - t_init:.1f}s")
    spec_gather = set()
    disp_gather = set()
    spec_dense = set()
    disp_dense = set()
    for kind, ts, specs in calls:
        phase = "init" if ts < t_init else "polish"
        print(f"[{kind}:{phase}] {len(specs)} specs")
        for s in sorted(specs, key=str):
            print("   ", s)
        if kind == "gather":
            (spec_gather if ts < t_init else disp_gather).update(specs)
        else:
            (spec_dense if ts < t_init else disp_dense).update(specs)
    missed_g = disp_gather - spec_gather
    print(f"\ngather: predicted {len(spec_gather)}, dispatched "
          f"{len(disp_gather)}, MISSED {len(missed_g)}")
    for s in sorted(missed_g, key=str):
        print("  MISS", s)
    missed_d = disp_dense - spec_dense
    print(f"dense: init-warmed {len(spec_dense)}, polish-time "
          f"{len(missed_d)} extra")
    for s in sorted(missed_d, key=str):
        print("  MISS", s)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.4)
    sys.stdout.flush()
    os._exit(0)
