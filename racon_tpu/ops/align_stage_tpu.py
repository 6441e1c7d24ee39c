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

from . import prefetch
from .consensus_stage_tpu import chunk_plan, chunk_size
from .nw_kernel import (align_walk_padded, encode, rle_events, walk_steps,
                        PAD_CODE)

# canonical (cap, band) tiers; items beyond the last tier go to the host.
# Few tiers on purpose: every distinct compiled shape costs ~2s of
# executable load per process on a tethered chip. Every tier is
# Myers-eligible since the sweep's Peq panels became pre-windowed per
# grid step (myers_kernel.build_peq_win_T), so the whole ladder runs the
# bit-parallel kernel; the scored sweeps (t8big for the 1024-band long
# tiers, lane-major for 4096-band) remain as the RACON_TPU_MYERS=0
# fallback and the identity oracle. The 4096-band tiers catch high-drift
# overlaps (error-threshold 0.3 allows |qspan-tspan| up to 30%) that
# would otherwise hit the serial host aligner.
_TIERS = ((2560, 512), (10240, 1024), (40960, 1024), (10240, 4096),
          (40960, 4096))
def _chunk_size(cap: int, band: int) -> int:
    # overlap slices are long: cap chunks at 1024 items (HBM budget shared
    # with consensus_stage_tpu.chunk_size)
    return chunk_size(cap, band, 1024)


def myers_tier_fmt(cap: int, band: int, interpret: bool):
    """Myers routing as a payload-format decision:
      "rows"      — Myers sweep + row-record walk (fastest device path;
                    payload cap + 2 B/item). Fast attaches always; slow
                    links while the payload fits the byte threshold.
      "myers_rle" — Myers sweep + plane->move transform + the scored rle
                    walk (payload ~cap/4 B/item, identical to the scored
                    rle path; ops/myers_kernel.py "compact-payload walk
                    path"). Slow links at long caps, where the rows
                    payload's D2H bytes invert the stage outcome.
      None        — scored sweep (interpret mode, ineligible shapes, or
                    RACON_TPU_MYERS=0 / RACON_TPU_MYERS_RLE=0 opt-outs).
    """
    import os

    from ..utils.jaxenv import slow_link
    from .myers_kernel import myers_fits, sweep_rows_g

    if interpret or not myers_fits(cap, cap, band):
        return None
    if not slow_link():
        return "rows"
    limit = 16 << 10
    v = os.environ.get("RACON_TPU_MYERS_PAYLOAD_MAX")
    if v is not None:
        try:
            limit = int(v)
        except ValueError:
            pass  # malformed override: keep the default threshold
    if cap + 2 <= limit:
        return "rows"
    if (os.environ.get("RACON_TPU_MYERS_RLE", "1") != "0"
            and sweep_rows_g(cap, band) % 16 == 0):
        return "myers_rle"
    return None


def tier_myers(cap: int, band: int, interpret: bool) -> bool:
    """Tier routing for the Myers bit-parallel align kernel. Myers wins
    on pure device time at EVERY tier (7.4-11.9x, docs/PERF.md), but its
    rows-format payload is cap + 2 bytes/item vs ~cap/4 for the scored
    rle/packed2 payloads — on a high-latency link the extra D2H inverts
    the stage-level outcome at long caps (same-session A/B at the
    40960/4096 tier: scored 0.654 s vs Myers 0.907 s warm for 300
    overlaps, while ava-scale caps <= 10240 measure Myers 3-4x faster
    end-to-end). Policy: Myers everywhere on fast attaches (measured
    link probe, jaxenv.slow_link); on slow links, Myers only while the
    payload stays <= 16 KB/item (caps <= ~16k).
    RACON_TPU_MYERS_PAYLOAD_MAX overrides the byte threshold on slow
    links only (fast attaches run Myers regardless, where the payload
    cost is noise); RACON_TPU_MYERS=0 disables the kernel entirely."""
    return myers_tier_fmt(cap, band, interpret) == "rows"


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

    # below this many overlaps a COLD device path's fixed costs (program
    # compile/ingest, packing, dispatch+fetch latency) beat its
    # throughput edge; a WARM chip with the Myers align programs loaded
    # wins at any batch size (r4: device 1918 vs host 163 o/s at ava
    # scale; kernel device time ~2 ms per 512-item dispatch). So small
    # batches route to the native host aligner only while the align
    # programs are not yet ready (the reference's heterogeneous-fallback
    # philosophy, src/cuda/cudapolisher.cpp:204).
    DEVICE_MIN_OVERLAPS = 512

    def small_batch_to_host(self, n_overlaps: int) -> bool:
        import os

        dev_min = int(os.environ.get("RACON_TPU_ALIGN_DEVICE_MIN",
                                     self.DEVICE_MIN_OVERLAPS))
        if self.interpret or n_overlaps >= dev_min:
            return False
        from .nw_kernel import _prewarm_ready

        warm = any(s[3:6] == (0, -1, -1) for s in _prewarm_ready)
        return not warm

    def prewarm_default(self) -> None:
        """Speculative AOT warm-up of the two most common align tiers
        (cap 2560/band 512 and 10240/1024 cover reads up to ~10 kb — the
        ONT/PacBio norm) so a one-shot run's align programs load during
        PARSING rather than at the first align dispatch. Costs only
        background compile threads; tiers an actual run needs beyond
        these warm in breaking_points as before."""
        if self.interpret:
            return
        from ..parallel.mesh import active_mesh
        from .nw_kernel import padded_batch, prewarm_tiers_async, walk_fmt

        if active_mesh() is not None:
            return
        specs = set()
        for cap, band in ((2560, 512), (10240, 1024)):
            step = _chunk_size(cap, band)
            fixed_b = step if cap >= 5120 else None
            bp = padded_batch(step, fixed_b, False, 1)
            mfmt = myers_tier_fmt(cap, band, False)
            fmt = ({"rows": "myers", "myers_rle": "myers_rle"}.get(mfmt)
                   or walk_fmt(cap, cap, band, False, bp))
            specs.add((cap, band, bp, 0, -1, -1, fmt))
        prewarm_tiers_async(specs)

    def breaking_points(self, overlaps, indices, sequences, window_length,
                        logger) -> list[np.ndarray]:
        from ..native import bindings

        import os

        if self.small_batch_to_host(len(indices)):
            from ..native.align_stage import NativeAlignStage
            from ..native import loader
            if loader.available():
                return NativeAlignStage(self.cfg).breaking_points(
                    overlaps, indices, sequences, window_length, logger)

        # materialize the aligned slices (reference: src/overlap.cpp:192-197)
        # in flat columnar form: strand slices read the (prepared) revcomp
        # blob, forward slices the store blob — one threaded ranged gather
        # per side, no per-overlap python
        thr = self.cfg.num_threads
        idx = np.asarray(indices, np.int64)
        qid = np.asarray(overlaps.q_id)[idx]
        strand = np.asarray(overlaps.strand)[idx].astype(np.uint8)
        qb = np.asarray(overlaps.q_begin)[idx].astype(np.int64)
        qe = np.asarray(overlaps.q_end)[idx].astype(np.int64)
        qlen_full = np.asarray(overlaps.q_length)[idx].astype(np.int64)
        tb = np.asarray(overlaps.t_begin)[idx].astype(np.int64)
        te = np.asarray(overlaps.t_end)[idx].astype(np.int64)
        tid = np.asarray(overlaps.t_id)[idx]
        meta = {"q_begin": qb, "q_end": qe, "q_length": qlen_full,
                "t_begin": tb, "t_end": te}
        rc_blob, rc_start = sequences.rc_arrays()
        src = np.concatenate([sequences.blob, rc_blob])
        qstart = np.where(
            strand != 0,
            len(sequences.blob) + rc_start[qid] + qlen_full - qe,
            sequences.data_off[qid] + qb)
        mlen = qe - qb
        nlen = te - tb
        tstart = sequences.data_off[tid] + tb
        qblob_raw = bindings.gather_ranges(src, qstart, mlen, thr)
        tblob_raw = bindings.gather_ranges(sequences.blob, tstart, nlen, thr)
        qoff_all = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(mlen, out=qoff_all[1:])
        toff_all = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(nlen, out=toff_all[1:])
        qenc = encode(qblob_raw).astype(np.int8)
        tenc = encode(tblob_raw).astype(np.int8)

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

        # concurrent AOT compile of every tier this run will dispatch:
        # cold cost becomes max(tier ingest), not the sum (see
        # nw_kernel.prewarm_tiers_async; single-device path only).
        # Tiers that fit the Myers bit-parallel kernel ride it (the
        # edit-distance align stage is its exact domain — ~1-2 ops/cell
        # vs the scored sweep's ~45-60); the rest keep the scored path.
        from .myers_kernel import align_walk_myers_padded
        from ..parallel.mesh import active_mesh

        single_dev = active_mesh() is None

        def _myers_fmt(cap, band):
            # real chips only; mesh dispatches shard the myers kernel
            # per chip (parallel/mesh.py fmt="myers" - rows payload; the
            # compact myers_rle form is single-device, so a mesh keeps
            # rows); long caps route by payload size on slow links
            # (module-level myers_tier_fmt)
            mfmt = myers_tier_fmt(cap, band, self.interpret)
            if mfmt == "myers_rle" and not single_dev:
                mfmt = "rows"
            return mfmt

        if not self.interpret:
            from .nw_kernel import (padded_batch, prewarm_tiers_async,
                                    walk_fmt)
            if single_dev:
                specs = set()
                for ti, (cap, band) in enumerate(tiers):
                    k = int((tier_id == ti).sum())
                    if k == 0:
                        continue
                    step = _chunk_size(cap, band)
                    for lo, hi, cbp in chunk_plan(k, step, False):
                        fixed_b = step if cap >= 5120 else cbp
                        bp = padded_batch(hi - lo, fixed_b, False, 1)
                        mfmt = _myers_fmt(cap, band)
                        fmt = ({"rows": "myers",
                                "myers_rle": "myers_rle"}.get(mfmt)
                               or walk_fmt(cap, cap, band, False, bp))
                        specs.add((cap, band, bp, 0, -1, -1, fmt))
                prewarm_tiers_async(specs)

        all_ops: list[np.ndarray | None] = [None] * len(indices)
        all_counts = np.zeros(len(indices), np.int64)

        # one fused align+walk dispatch per chunk, with the number of
        # in-flight chunks THROTTLED by their device-HBM footprint (packed
        # move planes + the big-tier kernel's pre-windowed panels): letting
        # every chunk queue at once can demand more HBM than the chip has,
        # and the resulting allocator pressure serializes the pipeline 10x
        # slower than draining as we go. Draining also overlaps the host
        # decode with the next chunk's device compute.
        from collections import deque

        pending: deque = deque()
        inflight = [0]
        _HBM_INFLIGHT = 4 << 30

        def _chunk_hbm(cap, band, k):
            moves = (cap // 16) * band * 4 * k
            win = 2 * (cap // 128) * (band + 256) * 4 * k
            return moves + win

        done = [0]  # completed items, for honest 20-bin progress

        def _drain_one():
            sel, cap, band, fmt, payload, fut, hbm = pending.popleft()
            inflight[0] -= hbm
            payload = prefetch.resolve(payload, fut)[: len(sel)]
            escaped = payload[:, -1] != 0
            if fmt == "rows":
                ops_flat, ops_off, counts = \
                    bindings.opstream_rows_to_ops_batch(
                        payload, cap + 2, mlen[sel], nlen[sel], thr)
            elif fmt == "rle":
                codes = np.ascontiguousarray(payload[:, :-1])
                ops_flat, ops_off, counts = \
                    bindings.opstream_rle_to_ops_batch(
                        codes, rle_events(cap, cap, band), mlen[sel],
                        nlen[sel], thr)
            else:
                codes = np.ascontiguousarray(payload[:, :-1])
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
            done[0] += len(sel) - int(escaped.sum())
            logger.bar_progress(
                "[racon::Polisher::initialize] aligning overlaps",
                done[0], len(indices))

        for ti, (cap, band) in enumerate(tiers):
            members = np.flatnonzero(tier_id == ti)
            # sort by length: chunk items then walk in near-lockstep, so
            # the device traceback's early-exit while_loop finishes sooner
            members = members[np.argsort(mlen[members], kind="stable")]
            step = _chunk_size(cap, band)
            for lo, hi, cbp in chunk_plan(len(members), step,
                                          self.interpret):
                sel = members[lo:hi]
                hbm = _chunk_hbm(cap, band, len(sel))
                while pending and inflight[0] + hbm > _HBM_INFLIGHT:
                    _drain_one()
                q4 = bindings.pack_rows_nib(qenc, qoff_all[sel],
                                            qoff_all[sel] + mlen[sel], cap,
                                            PAD_CODE, thr)
                t4 = bindings.pack_rows_nib(tenc, toff_all[sel],
                                            toff_all[sel] + nlen[sel], cap,
                                            PAD_CODE, thr)
                mfmt = _myers_fmt(cap, band)
                if mfmt is not None:
                    payload, _, fmt = align_walk_myers_padded(
                        q4, t4, mlen[sel].astype(np.int32),
                        nlen[sel].astype(np.int32), m_cap=cap, n_cap=cap,
                        w_band=band,
                        fixed_b=step if cap >= 5120 else cbp,
                        fmt=("rle" if mfmt == "myers_rle" else "rows"))
                else:
                    # unit deletion costs everywhere: an all-ones bitmask
                    dcb = np.full((len(sel), cap // 8), 0xFF, np.uint8)
                    payload, _, fmt = align_walk_padded(
                        q4, t4, dcb, mlen[sel].astype(np.int32),
                        nlen[sel].astype(np.int32), m_cap=cap, n_cap=cap,
                        w_band=band, match=0, mismatch=-1, gap=-1,
                        interpret=self.interpret,
                        # one compiled shape per big tier: a fresh big-tier
                        # compile costs minutes, padding a short chunk
                        # does not; small tiers pad to the canonical
                        # _BP_LADDER batch (chunk_plan)
                        fixed_b=step if cap >= 5120 else cbp,
                        prepacked=True)
                if hasattr(payload, "copy_to_host_async"):
                    payload.copy_to_host_async()  # overlap D2H with compute
                # async fetch: a worker starts pulling the payload now, so
                # the drain's fixed sync latencies overlap across chunks
                # instead of summing on the stage thread (ops/prefetch.py)
                fut = prefetch.submit(payload)
                pending.append((sel, cap, band, fmt, payload, fut, hbm))
                inflight[0] += hbm
        while pending:
            _drain_one()

        if host:
            hz = np.asarray(host, np.int64)
            hm = mlen[hz]
            hn = nlen[hz]
            qoff = np.zeros(len(hz) + 1, np.int64)
            np.cumsum(hm, out=qoff[1:])
            toff = np.zeros(len(hz) + 1, np.int64)
            np.cumsum(hn, out=toff[1:])
            qblob = bindings.gather_ranges(qblob_raw, qoff_all[hz], hm, thr)
            tblob = bindings.gather_ranges(tblob_raw, toff_all[hz], hn, thr)
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
        logger.bar_progress("[racon::Polisher::initialize] aligning overlaps",
                            len(indices), len(indices))
        return out
