#!/usr/bin/env python
"""Run the polish pipeline on an EXISTING genome_scale workdir (no
regeneration) — used to reproduce/verify at-scale failures and to record
one-shot/warm pairs without paying dataset synthesis each time.
Usage: python benchmarks/run_polish_existing.py WORKDIR [repeat=1] [verbose=0]"""

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(wd, repeat=1, verbose=False):
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.polisher import create_polisher

    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 2,
                         match=5, mismatch=-4, gap=-8)
    out = None
    for it in range(repeat):
        p = create_polisher(os.path.join(wd, "reads.fasta"),
                            os.path.join(wd, "ovl.paf"),
                            os.path.join(wd, "draft.fasta"), cfg)
        quiet = (contextlib.nullcontext() if verbose
                 else contextlib.redirect_stderr(io.StringIO()))
        t0 = time.time()
        with quiet:
            p.initialize()
        t1 = time.time()
        quiet = (contextlib.nullcontext() if verbose
                 else contextlib.redirect_stderr(io.StringIO()))
        with quiet:
            out = p.polish(drop_unpolished_sequences=True)
        t2 = time.time()
        tag = "one-shot" if it == 0 else "warm"
        n_win = p.windows.num_windows
        print(f"[{tag}] initialize: {t1-t0:.1f}s  polish ({n_win} windows): "
              f"{t2-t1:.1f}s ({n_win/(t2-t1):.0f} w/s)", flush=True)
    # identity vs truth when the truth file exists
    tf = os.path.join(wd, "true.fasta")
    if out is not None and os.path.exists(tf):
        from racon_tpu.native import bindings
        import numpy as np

        with open(tf, "rb") as f:
            true = b"".join(f.read().split(b"\n")[1:])
        cons = b"".join(dat for _, dat in out)
        d = bindings.edit_distance(cons, true)
        print(f"identity vs truth: {100.0 * (1 - d / len(true)):.4f}% "
              f"(edit {d})", flush=True)


if __name__ == "__main__":
    wd = sys.argv[1]
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    verb = len(sys.argv) > 3 and sys.argv[3] == "1"
    main(wd, rep, verb)
    sys.stdout.flush()
    os._exit(0)
