"""Fragment-correction / contig-mode golden counts on the reference's
all-vs-all overlap data (reference: test/racon_test.cpp:220-290).

Reference goldens (scores 1/-1/-1, w=500, q=10, e=0.3):
  kC ava-PAF, drop_unpolished=true:  39 seqs / 389,394 bp
  kF ava-PAF FASTQ, drop=false:     236 seqs / 1,658,216 bp
  kF ava-PAF FASTA, drop=false:     236 seqs / 1,663,982 bp
  kF ava-MHAP FASTQ, drop=false:    236 seqs / 1,658,216 bp

Measured here (round 1, auto backend, default refine passes): sequence
counts match exactly (39/236/236/236); total bp within 0.1% (1,659,647 /
1,664,043 / 1,659,647 — a different, measurably better consensus than the
reference's, see tests/test_e2e_quality.py).

The kC case and the kF FASTQ+PAF case run in the default suite (the
Myers/WFA host aligner covers the 8,016 ava overlaps in seconds); the kF
format variants (FASTA / MHAP) are gated behind RACON_TPU_SLOW_TESTS=1 and
run in CI.
"""

import io
import contextlib
import os

import pytest

from racon_tpu.models.polish_model import PolisherConfig, PolisherType
from racon_tpu.polisher import create_polisher
from racon_tpu.native import loader

if not loader.available():
    pytest.skip("native runtime unavailable", allow_module_level=True)


def _run(data_dir, reads, ovl, ptype, drop, passes=1):
    cfg = PolisherConfig(backend="auto", num_threads=os.cpu_count() or 4,
                         type=ptype, match=1, mismatch=-1, gap=-1,
                         refine_passes=passes)
    p = create_polisher(os.path.join(data_dir, reads),
                        os.path.join(data_dir, ovl),
                        os.path.join(data_dir, reads), cfg)
    with contextlib.redirect_stderr(io.StringIO()):
        p.initialize()
        out = p.polish(drop_unpolished_sequences=drop)
    return len(out), sum(len(d) for _, d in out)


def test_kc_ava_paf_golden_counts(data_dir):
    n, total = _run(data_dir, "sample_reads.fastq.gz",
                    "sample_ava_overlaps.paf.gz", PolisherType.kC, True)
    assert n == 39  # exact match with the reference golden
    assert abs(total - 389394) / 389394 < 0.01


# The FASTQ+PAF kF case runs in the default suite (~3 min on 2 CPU cores
# with the Myers/WFA aligner — the headline kF claim must not rest on a
# manual run); the FASTA/MHAP variants differ only in input-format handling,
# already covered by fast tests, and stay gated.
@pytest.mark.parametrize("reads,ovl,ref_bp,gated", [
    ("sample_reads.fastq.gz", "sample_ava_overlaps.paf.gz", 1658216, False),
    ("sample_reads.fasta.gz", "sample_ava_overlaps.paf.gz", 1663982, True),
    ("sample_reads.fastq.gz", "sample_ava_overlaps.mhap.gz", 1658216, True),
])
def test_kf_ava_golden_counts(data_dir, reads, ovl, ref_bp, gated):
    if gated and not os.environ.get("RACON_TPU_SLOW_TESTS"):
        pytest.skip("kF format variant; set RACON_TPU_SLOW_TESTS=1")
    n, total = _run(data_dir, reads, ovl, PolisherType.kF, False, passes=4)
    assert n == 236  # exact match with the reference golden
    assert abs(total - ref_bp) / ref_bp < 0.01
