"""Fine-grained timing of the TPU align stage on the genome-scale dataset
(reads must exist in the workdir — run genome_scale.py first)."""

import sys
import time
import contextlib
import io
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/racon_tpu_genome_scale"
    import os
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.polisher import create_polisher
    from racon_tpu.native import bindings
    import racon_tpu.ops.align_stage_tpu as mod

    cfg = PolisherConfig(backend="auto", num_threads=2, match=5, mismatch=-4,
                         gap=-8)
    p = create_polisher(os.path.join(workdir, "reads.fasta"),
                        os.path.join(workdir, "ovl.paf"),
                        os.path.join(workdir, "draft.fasta"), cfg)

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

    names = ["gather_ranges", "pack_rows_nib", "opstream_rle_to_ops_batch",
             "opstream_packed_to_ops_batch", "align_batch",
             "breaking_points_from_ops_batch"]
    origs = {}
    for nm in names:
        origs[nm], w = wrap(nm)
        setattr(bindings, nm, w)

    from racon_tpu.ops.nw_kernel import align_walk_padded as awp
    import racon_tpu.ops.align_stage_tpu as ast

    t_disp = {"t": 0.0, "chunks": [], "fetch": 0.0, "escaped": 0}
    def timed_awp(q4, t4, dcb, m, n, **kw):
        t0 = time.monotonic()
        payload, score, fmt = awp(q4, t4, dcb, m, n, **kw)
        t_disp["t"] += time.monotonic() - t0
        t_disp["chunks"].append((len(m), kw.get("m_cap"), kw.get("w_band"),
                                 fmt))
        t0 = time.monotonic()
        parr = np.asarray(payload)
        t_disp["fetch"] += time.monotonic() - t0
        t_disp["escaped"] += int((parr[: len(m), -1] != 0).sum())
        return parr, score, fmt
    ast.align_walk_padded = timed_awp

    t_fetch = {"t": 0.0}
    orig_bp = mod.TpuAlignStage.breaking_points
    def timed_bp(self, overlaps, indices, sequences, window_length, logger):
        return orig_bp(self, overlaps, indices, sequences, window_length,
                       logger)

    t0 = time.monotonic()
    with contextlib.redirect_stderr(io.StringIO()):
        p.initialize()
    total = time.monotonic() - t0
    ast.align_walk_padded = awp
    for nm in names:
        setattr(bindings, nm, origs[nm])

    print(f"initialize total={total:.2f}s")
    print(f"  dispatch (pack+jit call, excl fetch): {t_disp['t']:.2f}s")
    print(f"  payload fetch block: {t_disp['fetch']:.2f}s  "
          f"escaped={t_disp['escaped']}")
    from collections import Counter
    print(f"  chunks: {Counter(t_disp['chunks'])}")
    for k in sorted(acc, key=lambda k: -acc[k]):
        print(f"  {k:32s} {acc[k]:8.2f} s  x{cnt[k]}")


if __name__ == "__main__":
    main()
