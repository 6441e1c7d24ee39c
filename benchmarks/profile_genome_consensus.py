"""Consensus-stage attribution on the GENOME-SCALE window set without
paying the align-stage program ingest: breaking points come from the native
host aligner, then the TPU consensus stage runs with its phase ledger.

Usage: python benchmarks/profile_genome_consensus.py [workdir]
(run genome_scale.py first so the dataset exists)
"""

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/racon_tpu_genome_scale"
    import dataclasses

    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.polisher import create_polisher
    from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
    from racon_tpu.utils.logger import Logger

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         match=5, mismatch=-4, gap=-8)
    host_cfg = dataclasses.replace(cfg, backend="native")
    p = create_polisher(os.path.join(workdir, "reads.fasta"),
                        os.path.join(workdir, "ovl.paf"),
                        os.path.join(workdir, "draft.fasta"), host_cfg)
    t0 = time.time()
    with contextlib.redirect_stderr(io.StringIO()):
        p.initialize()
    print(f"initialize (native align): {time.time()-t0:.1f}s", flush=True)

    stage = TpuConsensusStage.try_create(cfg)
    if stage is None:
        print("no TPU stage")
        return
    n = p.windows.num_windows
    for it in range(3):
        t0 = time.time()
        with contextlib.redirect_stderr(io.StringIO()):
            stage.consensus_windows(p.windows, cfg, Logger())
        dt = time.time() - t0
        prof = dict(stage.prof)
        print(f"run {it}: {dt:.2f}s ({n/dt:.0f} w/s) "
              + " ".join(f"{k}={v:.2f}" for k, v in sorted(prof.items())),
              flush=True)


if __name__ == "__main__":
    main()
