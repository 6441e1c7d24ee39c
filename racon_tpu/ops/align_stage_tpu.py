"""TPU overlap-alignment stage: breaking points via the device NW kernel.

Replaces the reference's edlib stage (src/overlap.cpp:205-224) and its CUDA
batch aligner (src/cuda/cudaaligner.cpp): overlap (query-slice, target-slice)
pairs are bucketed by length into canonical equal-cap shapes, aligned on
device with edit-distance scores (0,-1,-1), walked on device into compact op
streams, then cut at window boundaries by the native runtime. Oversized or
band-escaping items fall back to the host C++ aligner (the same
heterogeneous-fallback pattern as the reference's GPU path,
src/cuda/cudapolisher.cpp:204-213).
"""

from __future__ import annotations

import numpy as np

from .consensus_stage_tpu import _concat_off, chunk_size
from .nw_kernel import (align_walk_padded, encode, rle_events, walk_steps,
                        PAD_CODE)

# canonical (cap, band) tiers; items beyond the last tier go to the host.
# Few tiers on purpose: every distinct compiled shape costs ~2s of
# executable load per process on a tethered chip. Wide bands on the long
# tiers keep ONT-scale indel drift on the device instead of the host
# fallback (band//2-64 margin per tier); the 4096-band tiers catch
# high-drift overlaps (error-threshold 0.3 allows |qspan-tspan| up to 30%)
# that would otherwise serialize on the host aligner.
_TIERS = ((2560, 512), (10240, 2048), (40960, 2048), (10240, 4096),
          (40960, 4096))
def _chunk_size(cap: int, band: int) -> int:
    # overlap slices are long: cap chunks at 1024 items (HBM budget shared
    # with consensus_stage_tpu.chunk_size)
    return chunk_size(cap, band, 1024)


class TpuAlignStage:
    def __init__(self, cfg, interpret: bool):
        self.cfg = cfg
        self.interpret = interpret

    @classmethod
    def try_create(cls, cfg):
        from ..native import loader
        if not loader.available():
            return None
        try:
            from ..utils.jaxenv import setup_jax, warmup_async
            setup_jax()
            import jax
            platform = jax.devices()[0].platform
        except Exception:
            return None
        if platform != "cpu":
            warmup_async()  # open the device link while the host parses
            return cls(cfg, interpret=False)
        if cfg.backend == "tpu":
            return cls(cfg, interpret=True)
        return None

    def breaking_points(self, overlaps, indices, sequences, window_length,
                        logger) -> list[np.ndarray]:
        from ..native import bindings

        # materialize the aligned slices (reference: src/overlap.cpp:192-197)
        slices = []
        meta = {k: np.zeros(len(indices), np.int64)
                for k in ("q_begin", "q_end", "q_length", "t_begin", "t_end")}
        strand = np.zeros(len(indices), np.uint8)
        for z, i in enumerate(indices):
            qid = int(overlaps.q_id[i])
            s = bool(overlaps.strand[i])
            qb, qe = int(overlaps.q_begin[i]), int(overlaps.q_end[i])
            qlen = int(overlaps.q_length[i])
            tb, te = int(overlaps.t_begin[i]), int(overlaps.t_end[i])
            if s:
                qarr = sequences.reverse_complement(qid)[qlen - qe : qlen - qb]
            else:
                qarr = sequences.data(qid)[qb:qe]
            tarr = sequences.data(int(overlaps.t_id[i]))[tb:te]
            slices.append((qarr, tarr))
            strand[z] = 1 if s else 0
            meta["q_begin"][z] = qb
            meta["q_end"][z] = qe
            meta["q_length"][z] = qlen
            meta["t_begin"][z] = tb
            meta["t_end"][z] = te

        # flat columnar layout: one blob per side, encoded once, packed into
        # the dense device matrices by the threaded native packer
        thr = self.cfg.num_threads
        qblob_raw, qoff_all = _concat_off([s[0] for s in slices])
        tblob_raw, toff_all = _concat_off([s[1] for s in slices])
        qenc = encode(qblob_raw).astype(np.int8)
        tenc = encode(tblob_raw).astype(np.int8)
        mlen = np.diff(qoff_all)
        nlen = np.diff(toff_all)

        # bucket by the canonical tiers; |n - m| must fit well within band.
        # --band-width N sets a minimum device band (reference:
        # --cudaaligner-band-width, src/cuda/cudapolisher.cpp:150-174; 0 =
        # automatic — the tier ladder already adapts per item)
        tiers = _TIERS if not self.interpret else ((256, 128),)
        if self.cfg.band_width > 0:
            tiers = (tuple(t for t in tiers if t[1] >= self.cfg.band_width)
                     or (tiers[-1],))
        tier_id = np.full(len(indices), -1, np.int64)
        for ti, (cap, band) in enumerate(tiers):
            ok = ((tier_id < 0) & (mlen <= cap) & (nlen <= cap)
                  & (np.abs(nlen - mlen) <= band // 2 - 64))
            tier_id[ok] = ti
        host: list[int] = list(np.flatnonzero(tier_id < 0))

        all_ops: list[np.ndarray | None] = [None] * len(indices)
        all_counts = np.zeros(len(indices), np.int64)

        # one fused align+walk dispatch per chunk; dispatch everything, then
        # fetch in order so transfers/compute/drain pipeline (async dispatch)
        pending = []
        for ti, (cap, band) in enumerate(tiers):
            members = np.flatnonzero(tier_id == ti)
            step = _chunk_size(cap, band)
            for c0 in range(0, len(members), step):
                sel = members[c0 : c0 + step]
                q8 = bindings.pack_rows(qenc, qoff_all[sel],
                                        qoff_all[sel] + mlen[sel], cap,
                                        PAD_CODE, thr)
                t8 = bindings.pack_rows(tenc, toff_all[sel],
                                        toff_all[sel] + nlen[sel], cap,
                                        PAD_CODE, thr)
                dc8 = np.full((len(sel), cap), -1, np.int8)
                payload, _, fmt = align_walk_padded(
                    q8, t8, dc8, mlen[sel].astype(np.int32),
                    nlen[sel].astype(np.int32), m_cap=cap, n_cap=cap,
                    w_band=band, match=0, mismatch=-1, gap=-1,
                    interpret=self.interpret,
                    # one compiled shape per big tier: a fresh big-tier
                    # compile costs minutes, padding a short chunk does not
                    fixed_b=step if cap >= 5120 else None)
                if hasattr(payload, "copy_to_host_async"):
                    payload.copy_to_host_async()  # overlap D2H with compute
                pending.append((sel, cap, band, fmt, payload))
        for sel, cap, band, fmt, payload in pending:
            payload = np.asarray(payload)[: len(sel)]
            codes = np.ascontiguousarray(payload[:, :-1])
            escaped = payload[:, -1] != 0
            if fmt == "rle":
                ops_flat, ops_off, counts = bindings.opstream_rle_to_ops_batch(
                    codes, rle_events(cap, cap, band), mlen[sel], nlen[sel],
                    thr)
            else:
                ops_flat, ops_off, counts = \
                    bindings.opstream_packed_to_ops_batch(
                        codes, walk_steps(cap, cap, band), mlen[sel],
                        nlen[sel], thr)
            for bi, z in enumerate(sel):
                if escaped[bi]:
                    host.append(z)
                else:
                    o = int(ops_off[bi])
                    all_ops[z] = ops_flat[o : o + int(counts[bi])]
                    all_counts[z] = counts[bi]
            logger.bar("[racon::Polisher::initialize] aligning overlaps")

        if host:
            qoff = np.zeros(len(host) + 1, np.int64)
            toff = np.zeros(len(host) + 1, np.int64)
            for z2, z in enumerate(host):
                qoff[z2 + 1] = qoff[z2] + len(slices[z][0])
                toff[z2 + 1] = toff[z2] + len(slices[z][1])
            qblob = (np.concatenate([slices[z][0] for z in host])
                     if qoff[-1] else np.zeros(0, np.uint8))
            tblob = (np.concatenate([slices[z][1] for z in host])
                     if toff[-1] else np.zeros(0, np.uint8))
            ops_flat, ops_off, counts = bindings.align_batch(
                qblob, qoff, tblob, toff, 0, -1, -1, True,
                self.cfg.num_threads)
            for z2, z in enumerate(host):
                o = int(ops_off[z2])
                all_ops[z] = ops_flat[o : o + int(counts[z2])]
                all_counts[z] = counts[z2]

        # op lists -> window breaking points (native walk)
        ops_off2 = np.zeros(len(indices) + 1, np.int64)
        for z in range(len(indices)):
            ops_off2[z + 1] = ops_off2[z] + len(all_ops[z])
        ops_blob = (np.concatenate(all_ops) if len(indices)
                    else np.zeros((0, 2), np.int32))
        quads, quad_off, qcounts = bindings.breaking_points_from_ops_batch(
            ops_blob, ops_off2[:-1], all_counts, strand, meta["q_begin"],
            meta["q_end"], meta["q_length"], meta["t_begin"], meta["t_end"],
            window_length, self.cfg.num_threads)
        out = []
        for z in range(len(indices)):
            o = int(quad_off[z])
            out.append(quads[o : o + int(qcounts[z])].copy())
        for _ in range(20):
            logger.bar("[racon::Polisher::initialize] aligning overlaps")
        return out
