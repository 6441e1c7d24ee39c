#!/usr/bin/env python
"""Genome-scale end-to-end benchmark: synthetic ONT-like polishing run.

Generates a genome (default 4.6 Mb, E. coli scale), a draft with ~1%
errors, ONT-like reads (default 8 kb, 12% error, 20x coverage) with PAF
overlaps from the known sampling positions, then runs the full CLI pipeline
(parse -> overlap alignment -> windowing -> consensus -> stitch) and reports
wall-clock per stage plus consensus identity vs the true genome.

Usage: python benchmarks/genome_scale.py [--genome-mb 4.6] [--coverage 20]
       [--backend auto] [--threads N]
"""

import argparse
import contextlib
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ACGT = np.frombuffer(b"ACGT", np.uint8)


# error-profile mix: fraction of total error spent on (ins, del, sub).
# "ont12"-style uniform thirds is the tuning profile; the others exist to
# stress the quality claim OFF the profile the defaults were tuned on
# (VERDICT r2 item 7): "hifi" = low-error high-coverage, "indel" = the
# indel-skewed mix typical of nanopore homopolymer errors.
PROFILES = {
    "uniform": (1 / 3, 1 / 3, 1 / 3),
    "indel": (0.4, 0.4, 0.2),
}


def make_dataset(workdir, genome_bp, read_len, coverage, err, seed=11,
                 mix=(1 / 3, 1 / 3, 1 / 3), chimeric_frac=0.0,
                 ava=False):
    """Synthetic ONT-like dataset. chimeric_frac > 0 makes that fraction
    of reads chimeras — the tail ~40% of the read comes from a distant
    genome locus while the PAF maps only the head segment (what a real
    mapper reports after clipping): the junction floods its windows with
    misaligned layers, exercising the kTGS coverage trim
    (reference src/window.cpp:118-139) and the quality/span filters.
    ava=True additionally writes reads-vs-reads overlaps (ava.paf, from
    the known sampling intervals) and true_spans.npy (per-read true
    genome interval) for fragment-correction (kF) benchmarking."""
    rng = np.random.default_rng(seed)
    true = rng.choice(ACGT, genome_bp)
    with open(os.path.join(workdir, "true.fasta"), "wb") as f:
        f.write(b">true\n" + true.tobytes() + b"\n")

    # draft: ~0.7% subs + 0.3% dels
    draft = true.copy()
    subs = rng.choice(genome_bp, int(genome_bp * 0.007), replace=False)
    draft[subs] = rng.choice(ACGT, len(subs))
    keep = np.delete(np.arange(genome_bp),
                     rng.choice(genome_bp, int(genome_bp * 0.003),
                                replace=False))
    draft = draft[keep]  # keep[i] = true coord of draft position i
    dlen = len(draft)

    n_reads = int(genome_bp * coverage / read_len)
    starts = rng.integers(0, dlen - read_len, n_reads)
    reads_f = open(os.path.join(workdir, "reads.fasta"), "wb")
    paf_f = open(os.path.join(workdir, "ovl.paf"), "wb")
    ins_p = err * mix[0]
    del_p = err * mix[1]
    n_chim = int(n_reads * chimeric_frac)
    chim = np.zeros(n_reads, bool)
    if n_chim:
        chim[rng.choice(n_reads, n_chim, replace=False)] = True
    read_lens = np.zeros(n_reads, np.int64)
    map_spans = np.zeros((n_reads, 2), np.int64)  # draft coords of the
    # MAPPED head segment

    def noisy(src):
        u = rng.random(len(src))
        ins_mask = u < ins_p
        del_mask = (u >= ins_p) & (u < ins_p + del_p)
        sub_mask = (u >= ins_p + del_p) & (u < err)
        out = src.copy()
        out[sub_mask] = rng.choice(ACGT, int(sub_mask.sum()))
        parts = []
        last = 0
        for p in np.flatnonzero(ins_mask):
            parts.append(out[last : p + 1])
            parts.append(rng.choice(ACGT, 1))
            last = p + 1
        parts.append(out[last:])
        read = np.concatenate(parts)
        # apply deletions on a mask projected through insertions is
        # fiddly; approximate by deleting from the assembled read
        dmask = np.ones(len(read), bool)
        dmask[rng.choice(len(read), int(del_mask.sum()),
                         replace=False)] = False
        return read[dmask]

    for r in range(n_reads):
        s = int(starts[r])
        if chim[r]:
            # chimera: head ~60% maps at s, tail from a distant locus;
            # only the head is reported in the PAF (mapper clip behavior)
            head_bp = int(read_len * 0.6)
            e = s + head_bp
            s2 = int(rng.integers(0, dlen - read_len))
            head = noisy(true[keep[s] : keep[e - 1] + 1])
            tail = noisy(true[keep[s2] : keep[s2 + read_len - head_bp - 1]
                              + 1])
            read = np.concatenate([head, tail])
            q_end = len(head)
        else:
            e = s + read_len
            read = noisy(true[keep[s] : keep[e - 1] + 1])
            q_end = len(read)
        name = b"r%d" % r
        reads_f.write(b">" + name + b"\n" + read.tobytes() + b"\n")
        paf_f.write(b"\t".join([
            name, b"%d" % len(read), b"0", b"%d" % q_end, b"+",
            b"ctg", b"%d" % dlen, b"%d" % s, b"%d" % e, b"1", b"1",
            b"60"]) + b"\n")
        read_lens[r] = len(read)
        map_spans[r] = (s, e)
    reads_f.close()
    paf_f.close()
    with open(os.path.join(workdir, "draft.fasta"), "wb") as f:
        f.write(b">ctg\n" + draft.tobytes() + b"\n")

    if ava:
        # reads-vs-reads overlaps from the known draft intervals (kF
        # fragment-correction input; reference test scale:
        # test/racon_test.cpp:238-290). Coordinates are interval
        # intersections scaled to read lengths — the align stage
        # realigns, the drift tiers absorb the approximation.
        order = np.argsort(map_spans[:, 0], kind="stable")
        with open(os.path.join(workdir, "ava.paf"), "wb") as av:
            for oi, r in enumerate(order):
                s1, e1 = map_spans[r]
                l1 = read_lens[r]
                for r2 in order[oi + 1 :]:
                    s2, e2 = map_spans[r2]
                    if s2 >= e1 - 500:
                        break
                    ov_s, ov_e = max(s1, s2), min(e1, e2)
                    q_b = int((ov_s - s1) * l1 / (e1 - s1))
                    q_e = int((ov_e - s1) * l1 / (e1 - s1))
                    l2 = read_lens[r2]
                    t_b = int((ov_s - s2) * l2 / (e2 - s2))
                    t_e = int((ov_e - s2) * l2 / (e2 - s2))
                    av.write(b"\t".join([
                        b"r%d" % r, b"%d" % l1, b"%d" % q_b, b"%d" % q_e,
                        b"+", b"r%d" % r2, b"%d" % l2, b"%d" % t_b,
                        b"%d" % t_e, b"1", b"1", b"60"]) + b"\n")
        np.save(os.path.join(workdir, "true_spans.npy"),
                np.stack([keep[map_spans[:, 0]],
                          keep[np.minimum(map_spans[:, 1] - 1,
                                          dlen - 1)] + 1], axis=1))
    return true


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=int, default=20)
    ap.add_argument("--read-len", type=int, default=8000)
    ap.add_argument("--error", type=float, default=0.12)
    ap.add_argument("--profile", choices=sorted(PROFILES), default="uniform",
                    help="error mix (ins/del/sub fractions of --error): "
                    "uniform thirds, or the indel-skewed nanopore-like mix")
    ap.add_argument("--chimeric-frac", type=float, default=0.0,
                    help="fraction of reads built as chimeras (distant-"
                    "locus tails, head-only PAF mapping): exercises the "
                    "kTGS trim / span / quality filters structurally")
    ap.add_argument("--mode", choices=("polish", "kf"), default="polish",
                    help="polish: contig polishing (kC-style); kf: "
                    "fragment correction on reads-vs-reads overlaps "
                    "(reference kF, test/racon_test.cpp:238-290)")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--refine-passes", type=int, default=None,
                    help="override the consensus refinement pass count "
                    "(speed/quality dial; default = PolisherConfig's)")
    ap.add_argument("--workdir", default="/tmp/racon_tpu_genome_scale")
    ap.add_argument("--reuse-data", action="store_true",
                    help="skip dataset synthesis when the workdir already "
                    "holds reads/ovl/draft/true files from the same "
                    "parameters (synthesis is deterministic per seed)")
    ap.add_argument("--verbose", action="store_true",
                    help="show the per-stage logger timers on stderr")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the full polish pipeline N times in-process; "
                    "iteration 1 is the one-shot (cold program ingest) "
                    "number, later ones the warm steady state")
    a = ap.parse_args()

    os.makedirs(a.workdir, exist_ok=True)
    genome_bp = int(a.genome_mb * 1e6)
    t0 = time.time()
    tf = os.path.join(a.workdir, "true.fasta")
    if a.reuse_data and os.path.exists(tf):
        with open(tf, "rb") as f:
            true = np.frombuffer(f.read().split(b"\n")[1], np.uint8)
    else:
        true = make_dataset(a.workdir, genome_bp, a.read_len, a.coverage,
                            a.error, mix=PROFILES[a.profile],
                            chimeric_frac=a.chimeric_frac,
                            ava=(a.mode == "kf"))
    print(f"dataset (SYNTHETIC): {genome_bp/1e6:.1f} Mb genome, "
          f"{a.coverage}x {a.read_len} bp reads, {a.error:.0%} error "
          f"({a.profile} mix, chimeric {a.chimeric_frac:.0%}, "
          f"mode {a.mode}), gen {time.time()-t0:.0f}s", flush=True)

    from racon_tpu.models.polish_model import (PolisherConfig,
                                               PolisherType)
    from racon_tpu.polisher import create_polisher

    extra = ({"refine_passes": a.refine_passes}
             if a.refine_passes is not None else {})
    if a.mode == "kf":
        extra["type"] = PolisherType.kF
    cfg = PolisherConfig(backend=a.backend, num_threads=a.threads,
                         match=5, mismatch=-4, gap=-8, **extra)
    ovl_file = "ava.paf" if a.mode == "kf" else "ovl.paf"
    tgt_file = "reads.fasta" if a.mode == "kf" else "draft.fasta"
    runs = []
    for it in range(max(1, a.repeat)):
        p = create_polisher(os.path.join(a.workdir, "reads.fasta"),
                            os.path.join(a.workdir, ovl_file),
                            os.path.join(a.workdir, tgt_file), cfg)
        quiet = (contextlib.nullcontext() if a.verbose
                 else contextlib.redirect_stderr(io.StringIO()))
        t0 = time.time()
        with quiet:
            p.initialize()
        t1 = time.time()
        quiet = (contextlib.nullcontext() if a.verbose
                 else contextlib.redirect_stderr(io.StringIO()))
        with quiet:
            out = p.polish(drop_unpolished_sequences=True)
        t2 = time.time()
        tag = "one-shot" if it == 0 else "warm"
        n_win = p.windows.num_windows
        try:  # session-condition stamp (docs/PERF.md: compare same-probe)
            from racon_tpu.utils.jaxenv import link_probe_ms

            probe = link_probe_ms()
            probe = None if probe is None else round(probe, 1)
        except Exception:
            probe = None
        print(f"[{tag}] initialize (parse+align+window): {t1-t0:.1f}s "
              f"(probe {probe} ms/4MB)", flush=True)
        print(f"[{tag}] polish ({n_win} windows): {t2-t1:.1f}s "
              f"({n_win/(t2-t1):.0f} windows/s)", flush=True)
        runs.append({"initialize_s": round(t1 - t0, 1),
                     "polish_s": round(t2 - t1, 1),
                     "windows_per_s": round(n_win / (t2 - t1), 1),
                     "probe_ms": probe})
    n_win = p.windows.num_windows
    from racon_tpu.native import bindings

    import json
    rec = {"data": "synthetic", "refine_passes": a.refine_passes,
           "genome_bp": genome_bp, "mode": a.mode,
           "coverage": a.coverage, "error_profile": a.profile,
           "chimeric_frac": a.chimeric_frac,
           "read_len": a.read_len, "read_error": a.error,
           "backend": a.backend, "threads": a.threads,
           "initialize_s": runs[0]["initialize_s"],
           "polish_s": runs[0]["polish_s"],
           "windows": n_win,
           "windows_per_s": runs[0]["windows_per_s"],
           "runs": runs}

    if a.mode == "kf":
        # fragment correction: per-read identity vs the true source
        # segment, before (raw read) and after (corrected read), on a
        # 300-read sample
        spans = np.load(os.path.join(a.workdir, "true_spans.npy"))
        corrected = {nm.split(b" ")[0]: dat for nm, dat in out}
        raws = {}
        with open(os.path.join(a.workdir, "reads.fasta"), "rb") as f:
            lines = f.read().split(b"\n")
        for i in range(0, len(lines) - 1, 2):
            if lines[i].startswith(b">"):
                raws[lines[i][1:]] = lines[i + 1]
        rng2 = np.random.default_rng(3)
        sample = rng2.choice(len(spans), min(300, len(spans)),
                             replace=False)
        t3 = time.time()
        cd = cbp = rd = rbp = 0
        n_used = 0
        for r in sample:
            # kF appends a literal 'r' to the record name (reference:
            # src/polisher.cpp:522)
            nm = b"r%dr" % r
            if nm not in corrected:
                continue
            seg = true[spans[r, 0] : spans[r, 1]].tobytes()
            cd += bindings.edit_distance(corrected[nm], seg)
            rd += bindings.edit_distance(raws[b"r%d" % r], seg)
            cbp += len(seg)
            rbp += len(seg)
            n_used += 1
        ident = 100.0 * (1.0 - cd / max(cbp, 1))
        ident_raw = 100.0 * (1.0 - rd / max(rbp, 1))
        print(f"kF corrected-read identity vs truth: {ident:.4f}% "
              f"(raw reads {ident_raw:.4f}%; {n_used} reads sampled, "
              f"{len(out)} corrected; metric {time.time()-t3:.0f}s)",
              flush=True)
        rec.update({"reads_corrected": len(out),
                    "sampled_reads": n_used,
                    "identity_pct": round(ident, 4),
                    "raw_read_identity_pct": round(ident_raw, 4)})
    else:
        polished = out[0][1]
        # FULL-genome exact edit distance vs truth (the Myers host
        # aligner makes this feasible: ~1 min at 4.6 Mb), plus the
        # draft's for scale
        t3 = time.time()
        d = bindings.edit_distance(polished, true.tobytes())
        ident = 100.0 * (1.0 - d / len(true))
        rec.update({"edit_vs_truth": int(d),
                    "identity_pct": round(ident, 4)})
        # the DRAFT's exact edit distance is O(n * d) with d ~ 1% of the
        # genome — fine at E. coli scale, hours at 50 Mb+. The draft
        # error rate is a known generator constant (~1%), so skip the
        # metric at scale rather than approximate it.
        if genome_bp <= 10_000_000:
            with open(os.path.join(a.workdir, "draft.fasta"), "rb") as f:
                draft = f.read().split(b"\n", 1)[1].replace(b"\n", b"")
            d_draft = bindings.edit_distance(draft, true.tobytes())
            ident_draft = 100.0 * (1.0 - d_draft / len(true))
            draft_note = f"draft {ident_draft:.4f}%/{d_draft}; "
            rec.update({"draft_edit": int(d_draft),
                        "draft_identity_pct": round(ident_draft, 4)})
        else:
            draft_note = "draft metric skipped (O(n*d) at ~1% error); "
        print(f"consensus identity vs truth: {ident:.4f}% (edit {d}; "
              f"{draft_note}"
              f"metric {time.time()-t3:.0f}s)", flush=True)
    art = os.environ.get("RACON_TPU_GENOME_SCALE_OUT", "")
    if art:
        with open(art, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
    # hard-exit like cli.run(): the tunnel plugin's teardown can abort
    # ("FATAL: exception not rethrown") seconds after fresh program
    # compiles, past the point all output was written
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
