"""Profile the polish() half of the genome-scale benchmark: consensus-stage
phase attribution (dispatch / device wait / merge) plus stitch cost, on the
dataset benchmarks/genome_scale.py leaves in its workdir.

Usage: python benchmarks/profile_genome_polish.py [workdir]
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
    from racon_tpu import backends
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.polisher import create_polisher
    from racon_tpu.core import windows as win_mod

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         match=5, mismatch=-4, gap=-8)
    p = create_polisher(os.path.join(workdir, "reads.fasta"),
                        os.path.join(workdir, "ovl.paf"),
                        os.path.join(workdir, "draft.fasta"), cfg)
    t0 = time.time()
    with contextlib.redirect_stderr(io.StringIO()):
        p.initialize()
    print(f"initialize: {time.time()-t0:.1f}s", flush=True)

    # share ONE consensus stage across polish() calls so the second run is
    # fully warm, and keep a handle to read its phase ledger
    stage_box = {}
    orig = backends.get_consensus_stage

    def capture(cfg):
        if "stage" not in stage_box:
            stage_box["stage"] = orig(cfg)
        return stage_box["stage"]

    backends.get_consensus_stage = capture

    orig_stitch = win_mod.stitch
    stitch_t = {}

    def timed_stitch(*a, **k):
        t = time.time()
        r = orig_stitch(*a, **k)
        stitch_t["s"] = time.time() - t
        return r

    import racon_tpu.polisher as pol_mod
    pol_mod.stitch = timed_stitch

    for it in range(3):
        t0 = time.time()
        with contextlib.redirect_stderr(io.StringIO()):
            out = p.polish(drop_unpolished_sequences=True)
        dt = time.time() - t0
        st = stage_box["stage"]
        prof = dict(getattr(st, "prof", {}))
        n = p.windows.num_windows
        print(f"run {it}: polish {dt:.2f}s ({n/dt:.0f} w/s) "
              f"stitch {stitch_t.get('s', 0):.2f}s "
              f"dispatch {prof.get('dispatch_s', 0):.2f}s "
              f"fetch {prof.get('fetch_s', 0):.2f}s "
              f"merge {prof.get('merge_s', 0):.2f}s", flush=True)
        assert out, "no output"


if __name__ == "__main__":
    main()
