"""TPU consensus stage: the device-driver loop of iterative star-POA.

Per refinement pass: all window layers are aligned to their window's current
backbone in one batched Pallas banded-NW call (ops/nw_kernel.py); the host
C++ runtime walks the packed tracebacks and merges them into the per-window
partial-order graphs (native rt_poa_round_batch), producing either the final
consensus or the expanded backbone for the next pass. Items that exceed the
device caps (or escape the band) are realigned on the host thread pool.

This replaces the reference's spoa window loop (src/polisher.cpp:486-504) and
its CUDA batch path (src/cuda/cudapolisher.cpp:216-353) with fixed-shape
device batches + a host merge, with the same fill/launch/drain overlap role
played by XLA's async dispatch.
"""

from __future__ import annotations

import numpy as np

from ..utils.phred import PHRED_OFFSET
from .nw_kernel import align_walk_batch, encode, PAD_CODE

_DEVICE_CHUNK = 4096  # alignments per device dispatch

# canonical (cap, band) shape tiers: every device batch is padded to one of
# these so the XLA program set stays small and the (persistent) compile
# cache hot. Items are bucketed to the smallest tier that fits both their
# length and their length mismatch (band must absorb |n-m| plus drift).
_TIERS = ((256, 128), (640, 128), (1280, 256), (2560, 384), (5120, 512),
          (10240, 768))


def _round_up(x: int, a: int) -> int:
    return -(-x // a) * a


def _margin(w_band: int) -> int:
    return w_band // 2 - 32


def _pack_rows(parts: list[np.ndarray], cap: int, fill: int,
               dtype=np.int8) -> np.ndarray:
    """Pad variable-length rows into a (B, cap) matrix without a Python
    per-element loop."""
    B = len(parts)
    out = np.full((B, cap), fill, dtype)
    lens = np.fromiter((len(p) for p in parts), np.int64, B)
    total = int(lens.sum())
    rows = np.repeat(np.arange(B), lens)
    starts = np.zeros(B, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    cols = np.arange(total) - np.repeat(starts, lens)
    out[rows, cols] = np.concatenate(parts) if parts else []
    return out


class TpuConsensusStage:
    def __init__(self, cfg, interpret: bool):
        self.cfg = cfg
        self.interpret = interpret

    @classmethod
    def try_create(cls, cfg):
        from ..native import loader
        if not loader.available():
            return None  # graph merge needs the native runtime
        if cfg.gap < -120 or cfg.match > 120 or cfg.mismatch < -120:
            return None  # int8 device payloads; native path handles these
        try:
            from ..utils.jaxenv import setup_jax
            setup_jax()
            import jax
            platform = jax.devices()[0].platform
        except Exception:
            return None
        if platform != "cpu":
            return cls(cfg, interpret=False)
        if cfg.backend == "tpu":  # explicit: run the kernel interpreted
            return cls(cfg, interpret=True)
        return None

    # ------------------------------------------------------------------ #

    def consensus_windows(self, windows, cfg, logger):
        from ..core.windows import WINDOW_TYPE_TGS
        from ..native import bindings

        n_win = windows.num_windows
        tgs = windows.window_type == WINDOW_TYPE_TGS

        # windows with <2 layers pass through (reference: src/window.cpp:68-71)
        consensus: list[bytes | None] = [None] * n_win
        polished = [False] * n_win
        active = []
        for w in range(n_win):
            if windows.n_layers(w) < 2:
                consensus[w] = windows.backbone(w).tobytes()
            else:
                active.append(w)
        if not active:
            return [c or b"" for c in consensus], polished

        # per-layer raw data/weights/codes, packed once
        lay_data: dict[int, np.ndarray] = {}
        lay_codes: dict[int, np.ndarray] = {}
        lay_weights: dict[int, np.ndarray] = {}
        max_q = 0
        for w in active:
            for li in windows.layer_indices(w):
                li = int(li)
                d = windows.layer_data(li)
                q = windows.layer_quality(li)
                lay_data[li] = d
                lay_codes[li] = encode(d).astype(np.int8)
                lay_weights[li] = (q.astype(np.int32) - PHRED_OFFSET
                                   if q is not None
                                   else np.ones(len(d), np.int32))
                max_q = max(max_q, len(d))

        # refinement state per active window
        gap = cfg.gap
        state_cur = {}
        state_w = {}
        state_del = {}
        state_slots = {}
        max_bb = 0
        for w in active:
            bb = np.asarray(windows.backbone(w))
            bq = windows.backbone_quality(w)
            state_cur[w] = bb
            state_w[w] = (bq.astype(np.int32) - PHRED_OFFSET if bq is not None
                          else np.zeros(len(bb), np.int32))
            state_del[w] = np.full(len(bb), gap, np.int32)
            state_slots[w] = np.arange(len(bb), dtype=np.int64)
            max_bb = max(max_bb, len(bb))

        # ceiling on backbone expansion: the largest canonical tier that
        # could ever be needed for this window set (items are bucketed to
        # per-round tiers from their ACTUAL lengths in _one_round)
        needed = max(max_q, 2 * max_bb + 64, 256)
        for cap, _ in _TIERS:
            if needed <= cap:
                break
        else:
            cap = _round_up(needed, 1024)
        if self.interpret:  # keep interpreted tests fast
            cap = min(cap, 256)
        max_expand = cap

        passes = max(1, cfg.refine_passes)
        for ps in range(passes):
            final = ps == passes - 1
            self._one_round(windows, cfg, active, lay_data, lay_codes,
                            lay_weights, state_cur, state_w, state_del,
                            state_slots, max_expand, final, tgs,
                            consensus, polished, bindings)
            logger.bar("[racon::Polisher::polish] generating consensus")
        for _ in range(20):
            logger.bar("[racon::Polisher::polish] generating consensus")
        return [c if c is not None else b"" for c in consensus], polished

    # ------------------------------------------------------------------ #

    def _one_round(self, windows, cfg, active, lay_data, lay_codes,
                   lay_weights, state_cur, state_w, state_del, state_slots,
                   max_expand, final, tgs, consensus, polished, bindings):
        gap = cfg.gap
        # 1. span projection + alignment item list
        items = []  # (window, layer_idx, sb, se)
        for w in active:
            cur = state_cur[w]
            slots = state_slots[w]
            n = len(cur)
            offset = 0.01 * n
            for li in windows.layer_indices(w):
                li = int(li)
                b = int(windows.lay_begin[li])
                e = int(windows.lay_end[li])
                sb = int(np.searchsorted(slots, b, side="left"))
                se = int(np.searchsorted(slots, e, side="right")) - 1
                sb = max(0, min(sb, n - 1))
                se = max(sb, min(se, n - 1))
                if sb < offset and se > n - offset:
                    sb, se = 0, n - 1
                items.append((w, li, sb, se))

        # per-round encodings of the current backbones (sliced per item)
        enc_cur = {w: encode(state_cur[w]).astype(np.int8) for w in active}
        del8 = {w: state_del[w].astype(np.int8) for w in active}

        # 2. bucket items into the smallest tier that fits length and
        # mismatch; oversized/over-drifted items run on the host pool
        tiers = [t for t in _TIERS if t[0] <= max_expand] or [_TIERS[0]]
        buckets = {t: [] for t in tiers}
        host_idx = []
        for k, (w, li, sb, se) in enumerate(items):
            m = len(lay_codes[li])
            n = se - sb + 1
            for cap, w_band in tiers:
                if m <= cap and n <= cap and abs(n - m) <= _margin(w_band):
                    buckets[(cap, w_band)].append(k)
                    break
            else:
                host_idx.append(k)

        all_ops = [None] * len(items)

        # 3. device alignment: one fused align+walk dispatch per chunk; all
        # chunks are dispatched before any result is fetched so H2D, compute
        # and D2H pipeline across chunks (async dispatch)
        pending = []
        for (cap, w_band), dev_idx in buckets.items():
            for c0 in range(0, len(dev_idx), _DEVICE_CHUNK):
                chunk = dev_idx[c0 : c0 + _DEVICE_CHUNK]
                qparts, tparts, dparts = [], [], []
                for k in chunk:
                    w, li, sb, se = items[k]
                    qparts.append(lay_codes[li])
                    tparts.append(enc_cur[w][sb : se + 1])
                    dparts.append(del8[w][sb : se + 1])
                q8 = _pack_rows(qparts, cap, PAD_CODE)
                t8 = _pack_rows(tparts, cap, PAD_CODE)
                dc8 = _pack_rows(dparts, cap, gap)
                ms = np.fromiter((len(p) for p in qparts), np.int64,
                                 len(chunk))
                ns = np.fromiter((len(p) for p in tparts), np.int64,
                                 len(chunk))
                codes, escaped, _ = align_walk_batch(
                    q8, t8, dc8, ms.astype(np.int32), ns.astype(np.int32),
                    m_cap=cap, n_cap=cap, w_band=w_band, match=cfg.match,
                    mismatch=cfg.mismatch, gap=gap,
                    interpret=self.interpret)
                pending.append((chunk, codes, escaped, ms, ns))
        for chunk, codes, escaped, ms, ns in pending:
            codes = np.asarray(codes)
            escaped = np.asarray(escaped)
            ops_flat, ops_off, counts = bindings.opstream_to_ops_batch(
                codes, ms, ns, cfg.num_threads)
            for bi, k in enumerate(chunk):
                if escaped[bi]:
                    host_idx.append(k)  # band escape -> host realign
                else:
                    o = int(ops_off[bi])
                    all_ops[k] = ops_flat[o : o + int(counts[bi])]

        # 4. host fallback alignment (per-column costs)
        if host_idx:
            qoff = np.zeros(len(host_idx) + 1, np.int64)
            toff = np.zeros(len(host_idx) + 1, np.int64)
            qparts, tparts, dparts = [], [], []
            for z, k in enumerate(host_idx):
                w, li, sb, se = items[k]
                qparts.append(lay_data[li])
                tparts.append(state_cur[w][sb : se + 1])
                dparts.append(state_del[w][sb : se + 1])
                qoff[z + 1] = qoff[z] + len(qparts[-1])
                toff[z + 1] = toff[z] + len(tparts[-1])
            ops_flat, ops_off, counts = bindings.align_batch_percol(
                np.concatenate(qparts), qoff, np.concatenate(tparts), toff,
                np.concatenate(dparts), cfg.match, cfg.mismatch, gap,
                cfg.num_threads)
            for z, k in enumerate(host_idx):
                o = int(ops_off[z])
                all_ops[k] = ops_flat[o : o + int(counts[z])]

        # 5. merge round per window (native)
        cur_off = np.zeros(len(active) + 1, np.int64)
        cur_parts, curw_parts = [], []
        layer_off = np.zeros(len(active) + 1, np.int64)
        for z, w in enumerate(active):
            cur_parts.append(state_cur[w])
            curw_parts.append(state_w[w])
            cur_off[z + 1] = cur_off[z] + len(state_cur[w])
            layer_off[z + 1] = layer_off[z] + windows.n_layers(w)
        n_lay = int(layer_off[-1])
        lay_blob_parts, layw_parts, span_begin = [], [], np.zeros(n_lay, np.int32)
        lay_doff = np.zeros(n_lay + 1, np.int64)
        ops_off2 = np.zeros(n_lay + 1, np.int64)
        ops_parts = []
        for k, (w, li, sb, se) in enumerate(items):
            lay_blob_parts.append(lay_data[li])
            layw_parts.append(lay_weights[li])
            lay_doff[k + 1] = lay_doff[k] + len(lay_data[li])
            span_begin[k] = sb
            ops_parts.append(all_ops[k])
            ops_off2[k + 1] = ops_off2[k] + len(all_ops[k])
        ops_blob = (np.concatenate(ops_parts) if ops_parts
                    else np.zeros((0, 2), np.int32))
        win_id = np.array([windows.win_target[w] for w in active], np.int64)
        win_rank = np.array([windows.win_rank[w] for w in active], np.int32)
        capacity = np.array([2 * len(state_cur[w]) + 512 for w in active],
                            np.int64)
        out_blob, out_off, out_len, out_del, out_slots, out_pol = \
            bindings.poa_round_batch(
                np.concatenate(cur_parts), cur_off,
                np.concatenate(curw_parts), layer_off,
                np.concatenate(lay_blob_parts), lay_doff,
                np.concatenate(layw_parts), span_begin, ops_blob, ops_off2,
                final, tgs, cfg.trim, gap, cfg.candidate_frac,
                cfg.candidate_min, max_expand, win_id, win_rank,
                cfg.num_threads, capacity)

        raw = out_blob.tobytes()
        for z, w in enumerate(active):
            o = int(out_off[z])
            ln = int(out_len[z])
            if final:
                consensus[w] = raw[o : o + ln]
                polished[w] = bool(out_pol[z])
            else:
                state_cur[w] = out_blob[o : o + ln].copy()
                state_del[w] = out_del[o : o + ln].copy()
                local = out_slots[o : o + ln].astype(np.int64)
                prev = state_slots[w]
                state_slots[w] = prev[np.minimum(local, len(prev) - 1)]
                state_w[w] = np.zeros(ln, np.int32)