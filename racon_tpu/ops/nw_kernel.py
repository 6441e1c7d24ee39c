"""Batched banded linear-gap NW — the TPU compute core (Pallas).

This kernel plays the roles of BOTH reference hot loops (SURVEY.md sec
3.2/3.3): spoa's SIMD sequence-vs-graph DP (as layer-vs-backbone alignment
inside the star-POA consensus, ops/poa_host.py) and edlib's overlap alignment
(as the breaking-points producer, with (0,-1,-1) scores).

TPU-first design notes:
  - items are padded to equal caps (M_CAP == N_CAP) with a pad code that
    matches itself and hard-rejects real bases, so every item shares ONE
    static band geometry (diagonal band of width W centered on the corner
    diagonal). The real alignment's DP values are untouched by padding and
    the pad tail resolves to a deterministic diagonal + corner gap run that
    the host walker skips.
  - rows iterate over the query; the in-row horizontal dependency (deletions,
    incl. per-column costs for the refinement passes' optional columns) is
    closed with a max-plus prefix scan over cumulative costs Gc:
    H[i,k] = Gc[j(k)] + running_max_k(cand[i,k] - Gc[j(k)]), log2(W) steps.
  - the target/cost rows are LEFT-PADDED by W lanes on the host so every
    per-row dynamic slice has a non-negative start: no clamping, no rolls.
  - traceback moves (2 bits, DIAG>UP>LEFT priority) are packed 4 query-rows
    per byte and written to HBM; the host C++ walker
    (native/src/align.cpp: rt_walk_moves_batch) reconstructs op lists in
    O(M+N) per item.
  - a batch tile of B items rides the VPU sublanes: every op is a (B, W) tile.

Wrapper shapes (per call): q (B, M_CAP) int32 codes, t (B, N_CAP) int32
codes, gc (B, N_CAP+1) int32 cumulative deletion costs (gc[0]=0). Outputs:
moves (B, M_CAP//4, W) uint8 (packed) and score (B, 1) int32.
Codes: 0..4 real (ACGTN), PAD_CODE = 5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_CODE = 5
NEG = -(10 ** 5)  # forbids pad-vs-real pairing; far below any real score

# base-code tables shared with host packers
_CODE = np.full(256, 4, dtype=np.uint8)  # anything unusual -> N
for i, b in enumerate(b"ACGTN"):
    _CODE[b] = i
_DECODE = np.frombuffer(b"ACGTN?", dtype=np.uint8)


def encode(seq: np.ndarray) -> np.ndarray:
    return _CODE[seq]


def band_dlo(m_cap: int, n_cap: int, w_band: int) -> int:
    """j = i + dlo + k for band lane k; shared with the host walker."""
    return n_cap - m_cap - w_band // 2


def _shift_right(x, s, fill):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (s,), fill, x.dtype), x[..., :-s]], axis=-1)


def _shift_left(x, s, fill):
    return jnp.concatenate(
        [x[..., s:], jnp.full(x.shape[:-1] + (s,), fill, x.dtype)], axis=-1)


_GROUP = 128  # query rows per aligned-load group
_PACK = 16    # query rows packed per int32 move word


def _align_down(x: int, a: int) -> int:
    return (x // a) * a


def _nw_band_kernel(q_ref, tp_ref, gcp_ref, moves_ref, score_ref,
                    hscr, *, m_cap, n_cap, w_band, match, mismatch, gap):
    """tp/gcp are left-padded by w_band lanes (see nw_band_batch).

    Mosaic constrains dynamic lane offsets to multiples of 128, so rows are
    processed in groups of 128 (the minor grid dimension): each group does
    one 128-aligned chunk load of q/t/Gc, then a shift register advances the
    band window one lane per row with a 16-row unroll (all in-loop slices
    static). Traceback moves pack 16 rows per int32 lane; each group writes
    its 8 packed rows through predicated static-slot stores into scratch,
    then stores its own output block. H carries across groups in VMEM
    scratch.
    """
    B = q_ref.shape[0]
    W = w_band
    dlo = band_dlo(m_cap, n_cap, W)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    REG = W + 256  # shift-register width: OFF + W + 127 <= REG
    base_t = _align_down(W + dlo, _GROUP)        # static aligned base offset
    off_t = W + dlo - base_t                     # static in [0, 128)
    n_groups = m_cap // _GROUP
    slots = _GROUP // _PACK

    # one grid step = one 128-row group of one batch tile; groups iterate in
    # the minor grid dimension so hscr (VMEM scratch) carries H across them
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        # row 0: H[0][j] = Gc[j] for valid j (0..n_cap), else NEG
        j0 = dlo + kidx
        g0 = jax.lax.slice(gcp_ref[...], (0, W + dlo), (B, W + dlo + W))
        hscr[...] = jnp.where((j0 >= 0) & (j0 <= n_cap), g0, NEG)

    if True:  # group body (indentation kept shallow)
        gbase = pl.multiple_of(g * _GROUP, _GROUP)
        q_reg0 = q_ref[:, pl.ds(gbase, _GROUP)]
        t_reg0 = tp_ref[:, pl.ds(gbase + base_t, REG)]
        gc_reg0 = gcp_ref[:, pl.ds(gbase + base_t, REG)]

        def pack_body(p, carry):
            # one step = _PACK query rows, fully unrolled with static slices;
            # the band registers shift left by _PACK once per step
            hp, q_reg, t_reg, gc_reg = carry
            i0 = g * _GROUP + p * _PACK + 1
            pack = jnp.zeros((B, W), jnp.int32)
            for u in range(_PACK):
                i = i0 + u
                jrow = i + dlo + kidx
                valid = (jrow >= 1) & (jrow <= n_cap)
                t_row = jax.lax.slice(t_reg, (0, off_t + u),
                                      (B, off_t + u + W))
                gc_here = jax.lax.slice(gc_reg, (0, off_t + u + 1),
                                        (B, off_t + u + 1 + W))
                qi = jax.lax.slice(q_reg, (0, u), (B, u + 1))

                same = t_row == qi
                one_pad = (t_row == PAD_CODE) ^ (qi == PAD_CODE)
                sub = jnp.where(one_pad, NEG, jnp.where(same, match, mismatch))

                diag_c = hp + sub
                up_c = _shift_left(hp, 1, NEG) + gap
                cand = jnp.maximum(diag_c, up_c)
                cand = jnp.where(jrow == 0, i * gap, cand)  # first column
                cand = jnp.where(valid | (jrow == 0), cand, NEG)

                # horizontal closure (deletion chains, per-column costs)
                a = cand - gc_here
                s = 1
                while s < W:
                    a = jnp.maximum(a, _shift_right(a, s, 2 * NEG))
                    s *= 2
                h = a + gc_here
                h = jnp.where(valid | (jrow == 0), h, NEG)

                # moves with DIAG > UP > LEFT priority
                mv = jnp.where(h == diag_c, 0, jnp.where(h == up_c, 1, 2))
                mv = jnp.where(valid, mv, 3)
                pack = pack | (mv << (2 * u))
                hp = h

            # dynamic-slot store (slots is a non-lane dim, so a dynamic
            # index is legal and beats `slots` predicated stores)
            moves_ref[:, pl.ds(p, 1), :] = pack[:, None, :]

            q_reg = _shift_left(q_reg, _PACK, PAD_CODE)
            t_reg = _shift_left(t_reg, _PACK, PAD_CODE)
            gc_reg = _shift_left(gc_reg, _PACK, 0)
            return (hp, q_reg, t_reg, gc_reg)

        h_final, *_ = jax.lax.fori_loop(0, _GROUP // _PACK, pack_body,
                                        (hscr[...], q_reg0, t_reg0, gc_reg0))
        hscr[...] = h_final

    @pl.when(g == n_groups - 1)
    def _():
        k_end = n_cap - m_cap - dlo
        score_ref[...] = jax.lax.slice(hscr[...], (0, k_end), (B, k_end + 1))


B_TILE = 16  # items per grid step (VPU sublane granularity x2)


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "match", "mismatch", "gap",
                                             "interpret"))
def nw_band_batch(q, t, gc, *, m_cap, n_cap, w_band, match, mismatch, gap,
                  interpret=False):
    """q (B, M_CAP) int32, t (B, N_CAP) int32, gc (B, N_CAP+1) int32.
    B must be a multiple of B_TILE (pad with all-PAD items).

    Returns (moves (B, M_CAP//16, W) int32 packed planes, score (B, 1) int32).
    """
    B = q.shape[0]
    assert m_cap % _GROUP == 0, "m_cap must be a multiple of 128"
    if B % B_TILE:  # pad the batch with all-PAD items
        extra = B_TILE - B % B_TILE
        q = jnp.pad(q, ((0, extra), (0, 0)), constant_values=PAD_CODE)
        t = jnp.pad(t, ((0, extra), (0, 0)), constant_values=PAD_CODE)
        gc = jnp.pad(gc, ((0, extra), (0, 0)))
        B += extra
    # pad target/costs on BOTH sides so every group chunk load is fully in
    # range: left pad W (row slices reach j = dlo + k < 0 early on), right pad
    # covers the last group's register reach
    right = w_band + 256
    tp = jnp.pad(t, ((0, 0), (w_band, right)), constant_values=PAD_CODE)
    gcp = jnp.pad(gc, ((0, 0), (w_band, 0)), constant_values=0)
    gcp = jnp.pad(gcp, ((0, 0), (0, right)), mode="edge")
    kernel = functools.partial(_nw_band_kernel, m_cap=m_cap, n_cap=n_cap,
                               w_band=w_band, match=match, mismatch=mismatch,
                               gap=gap)
    # grid: (batch tiles, row groups); groups iterate minor so H carries in
    # VMEM scratch across them while DMAs pipeline
    grid = (B // B_TILE, m_cap // _GROUP)
    slots = _GROUP // _PACK
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, m_cap // _PACK, w_band), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((B_TILE, q.shape[1]), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, tp.shape[1]), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, gcp.shape[1]), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B_TILE, slots, w_band), lambda i, g: (i, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B_TILE, w_band), jnp.int32),
        ],
        interpret=interpret,
    )(q, tp, gcp)


# ---------------------------------------------------------------------- #
# fused transfer-light entry point: int8 payloads (4x less H2D than int32,
# which matters on tethered/tunneled chips), deletion-cost cumsum on device,
# and the traceback walk fused into the same dispatch so one host round trip
# covers align + walk per batch.
# ---------------------------------------------------------------------- #


def walk_steps(m_cap: int, n_cap: int, w_band: int) -> int:
    """Static op-stream length for the fused path: long enough for the pad
    tail (m_cap - m diagonal steps + corner gap run) plus any in-band real
    path with generous indel headroom, 4-aligned for 2-bit packing. Paths
    that would exceed it are flagged escaped and re-aligned on the host."""
    return min(_round4(m_cap + 2 * w_band), _round4(m_cap + n_cap))


def _round4(x: int) -> int:
    return -(-x // 4) * 4


def align_walk_core(q8, t8, dc, m, n, *, m_cap, n_cap, w_band, match,
                    mismatch, gap, nw_fn):
    """Traceable fused body: banded NW (via nw_fn) + packed traceback walk.
    dc is per-column deletion costs in any integer dtype."""
    q = q8.astype(jnp.int32)
    t = t8.astype(jnp.int32)
    gc = jnp.pad(jnp.cumsum(dc.astype(jnp.int32), axis=1), ((0, 0), (1, 0)))
    moves, score = nw_fn(q, t, gc, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
                         match=match, mismatch=mismatch, gap=gap)
    codes, escaped = walk_moves_device(
        moves[: q.shape[0]], m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
        max_steps=walk_steps(m_cap, n_cap, w_band), packed=True)
    payload = jnp.concatenate([codes, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    return payload, score[: q.shape[0]]


# ---- packed uplink: base codes ship 2-per-byte (values 0..5 fit a
# nibble) and the binary {0, gap} per-column deletion costs ship as a
# bitmask — the tethered chip's H2D link is as precious as its D2H ----


def pack_codes4(x8: np.ndarray) -> np.ndarray:
    """(B, CAP) int8 codes -> (B, CAP//2) uint8, two codes per byte."""
    x = x8.view(np.uint8)
    return (x[:, 0::2] | (x[:, 1::2] << 4)).astype(np.uint8)


def pack_delbits(dc8: np.ndarray) -> np.ndarray:
    """(B, CAP) deletion costs in {0, gap} -> (B, CAP//8) uint8 bitmask."""
    return np.packbits(np.asarray(dc8) != 0, axis=1, bitorder="little")


def unpack_codes4(q4, cap: int):
    lo = (q4 & 0xF).astype(jnp.int8)
    hi = (q4 >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=-1).reshape(q4.shape[0], cap)


def unpack_delbits(dcb, cap: int, gap: int):
    bits = (dcb[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(dcb.shape[0], cap).astype(jnp.int32) * gap


def align_walk_packed_core(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band, match,
                           mismatch, gap, nw_fn):
    q8 = unpack_codes4(q4, m_cap)
    t8 = unpack_codes4(t4, n_cap)
    dc = unpack_delbits(dcb, n_cap, gap)
    return align_walk_core(q8, t8, dc, m, n, m_cap=m_cap, n_cap=n_cap,
                           w_band=w_band, match=match, mismatch=mismatch,
                           gap=gap, nw_fn=nw_fn)


_T_VMEM_LIMIT = 12 << 20  # scoped-vmem budget for the transposed kernel


def t_kernel_fits(m_cap: int, n_cap: int, w_band: int) -> bool:
    """Whether the full-panel transposed kernel fits Mosaic's 16 MB
    scoped-vmem stack. Footprint model calibrated against Mosaic's own
    reports: double-buffered in/out blocks (pallas pipelining) + the two
    scratch registers + ~13 live (W, B_LANE) int32 temporaries in the DP
    body — (2560, 512) reports 16.83 MB (rejected at runtime-compile),
    (640, 128) and (1280, 256) compile. Shapes over the budget route to
    the pre-windowed big-tier kernel (t_big_fits) whose blocks stay small,
    or to the lane-major kernel beyond that. Also needs dlo <= 0 (the
    in-kernel gc scan starts at band lane 0 — see _nw_band_kernel_t8)."""
    per_lane = 4 * B_LANE
    qt = m_cap * per_lane
    tp = (n_cap + 2 * w_band) * per_lane
    dcp = (n_cap + 2 * w_band) * per_lane
    moves = (_GROUP // _PACK) * w_band * per_lane
    scratch = 2 * w_band * per_lane
    temps = 13 * w_band * per_lane
    total = 2 * (qt + tp + dcp + moves) + scratch + temps
    return (m_cap % _GROUP == 0
            and band_dlo(m_cap, n_cap, w_band) <= 0
            and total <= _T_VMEM_LIMIT)


def _expand_nib_T(x4T, rows: int):
    """(rows//2, B) uint8 nibble columns -> (rows, B) int8 codes: byte r
    holds rows 2r (low nibble) and 2r+1 (high). Transposing the PACKED
    array first keeps the relayout 8x smaller than transposing unpacked
    int32 panels."""
    lo = (x4T & 0xF).astype(jnp.int8)
    hi = (x4T >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(rows, x4T.shape[1])


def _expand_bits_T(bT, rows: int):
    """(rows//8, B) uint8 bitmask columns -> (rows, B) int8 in {0, 1}."""
    bits = (bT[:, None, :] >> jnp.arange(8, dtype=jnp.uint8)[None, :, None])
    return (bits & 1).astype(jnp.int8).reshape(rows, bT.shape[1])


def _prep_panels_t8(q4, t4, dcb, *, m_cap, n_cap, w_band, gap):
    """Device prep for the transposed kernel: transpose the PACKED uplink
    arrays (8-25x smaller relayouts than transposing unpacked panels), then
    nibble/bit-expand along sublanes and widen to int32 (Mosaic requires
    32-bit panels for the kernel's arbitrary-offset dynamic sublane loads).
    dcp holds per-column deletion COSTS (gap or 0) with W zero rows of
    padding on both sides — the kernel integrates the prefix sums itself,
    so no (n_cap, B) cumsum is ever materialized."""
    W = w_band
    qT = _expand_nib_T(q4.T, m_cap).astype(jnp.int32)
    tT = _expand_nib_T(t4.T, n_cap).astype(jnp.int32)
    tpT = jnp.pad(tT, ((W, W), (0, 0)), constant_values=PAD_CODE)
    dcT = _expand_bits_T(dcb.T, n_cap).astype(jnp.int32) * gap
    dcpT = jnp.pad(dcT, ((W, W), (0, 0)))
    return qT, tpT, dcpT


def align_walk_packed_core_t(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band,
                             match, mismatch, gap, interpret=False):
    """Transposed twin of align_walk_packed_core: transpose + unpack the
    packed uplink rows into int8 panels on device (cheap relayouts vs the
    ~25x larger uplink) and run the int8 sublane-band kernel + transposed
    walk. Outputs are bit-identical to align_walk_packed_core's."""
    W = w_band
    qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, gap=gap)
    moves, score = nw_band_batch_t8(qT, tpT, dcpT, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, match=match, mismatch=mismatch,
                                    gap=gap, interpret=interpret)
    codes, escaped = walk_moves_device_t(
        moves, m, n, m_cap=m_cap, n_cap=n_cap, w_band=W,
        max_steps=walk_steps(m_cap, n_cap, W), packed=True)
    payload = jnp.concatenate([codes, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    return payload, score.T


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "match", "mismatch", "gap",
                                             "interpret"))
def align_walk_batch(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band, match,
                     mismatch, gap, interpret=False):
    """q4/t4 (B, CAP//2) uint8 nibble-packed codes (pack_codes4), dcb
    (B, CAP//8) uint8 deletion-cost bitmask (pack_delbits; bit set = cost
    `gap`), m/n (B,) int32 real lengths. One device dispatch: unpack +
    banded NW + on-device traceback walk. Returns (payload
    (B, walk_steps(...)//4 + 1) uint8, score (B, 1) int32) where
    payload[:, :-1] is the backward op stream packed 4 steps/byte and
    payload[:, -1] the band-escape flag — one uplink-light H2D and ONE
    D2H transfer per dispatch. On real chips (B a multiple of B_LANE,
    m_cap a multiple of 128) the transposed sublane-band kernel runs;
    interpret mode keeps the lane-major kernel for the CPU test suite."""
    if (not interpret and t_kernel_fits(m_cap, n_cap, w_band)
            and q4.shape[0] % B_LANE == 0):
        return align_walk_packed_core_t(
            q4, t4, dcb, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
            match=match, mismatch=mismatch, gap=gap)
    nw_fn = functools.partial(nw_band_batch, interpret=interpret)
    return align_walk_packed_core(q4, t4, dcb, m, n, m_cap=m_cap,
                                  n_cap=n_cap, w_band=w_band, match=match,
                                  mismatch=mismatch, gap=gap, nw_fn=nw_fn)


def padded_batch(B: int, fixed_b, interpret: bool, mesh_size: int) -> int:
    """The canonical padded batch dimension align_walk_padded dispatches
    with: next power of two (min 16), or fixed_b; rounded so every mesh
    shard gets an equal slice and real chips stay B_LANE-aligned (the
    transposed-kernel eligibility)."""
    if fixed_b is not None:
        bp = max(fixed_b, B)
    else:
        bp = 16
        while bp < B:
            bp *= 2
    lane_unit = B_TILE if interpret else B_LANE
    unit = mesh_size * lane_unit
    return -(-bp // unit) * unit


_prewarmed: set = set()
_prewarm_ready: set = set()
_prewarm_threads: list = []
_prewarm_atexit = [False]


def _spawn_prewarm(target) -> None:
    """Start a prewarm compile thread, tracked for a bounded join at
    interpreter exit: a daemon thread still inside a native compile call
    when the interpreter tears down can abort the process ('FATAL:
    exception not rethrown' -> SIGABRT) AFTER correct output — seen once
    under back-to-back gather-prewarm runs. Joining with a bounded
    budget (RACON_TPU_PREWARM_EXIT_WAIT seconds, default 15) closes the
    common race without letting a slow remote ingest hang the exit."""
    import atexit
    import os
    import threading
    import time as _time

    if not _prewarm_atexit[0]:
        _prewarm_atexit[0] = True

        def _drain():
            budget = float(os.environ.get("RACON_TPU_PREWARM_EXIT_WAIT",
                                          "15"))
            deadline = _time.monotonic() + budget
            for t in _prewarm_threads:
                left = deadline - _time.monotonic()
                if left <= 0:
                    break
                t.join(timeout=left)

        atexit.register(_drain)
    t = threading.Thread(target=target, daemon=True)
    _prewarm_threads.append(t)
    t.start()


def prewarm_done(specs) -> bool:
    """Whether every spec's prewarm compile has COMPLETED (not merely been
    started). Routing uses this as the cold/warm signal: a tier whose
    program is already ingested dispatches at steady-state cost, anything
    else pays the tethered chip's compile+ingest premium."""
    return all(s in _prewarm_ready for s in specs)


def prewarm_tiers_async(specs) -> None:
    """AOT-compile the fused align+walk programs for (cap, band, batch,
    match, mismatch, gap, fmt) specs on daemon threads.

    A cold process otherwise compiles (or, on a tethered chip, ingests —
    10-200 s each, PLAN M12) each tier's program serially at its first
    dispatch; warming them concurrently makes the cold cost
    max(per-tier) instead of the sum. jax's jit cache dedups with the
    real dispatch that follows, which simply blocks until its tier's
    warm finishes. Single-device programs only (the mesh path keys its
    own programs); shapes must mirror padded_batch's output."""
    import jax as _jax

    for spec in specs:
        if spec in _prewarmed:
            continue
        _prewarmed.add(spec)
        cap, band, bp, match, mismatch, gap, fmt = spec
        if fmt is True or fmt is False:  # legacy boolean (rle) specs
            fmt = "rle" if fmt else "packed2"

        def _go(cap=cap, band=band, bp=bp, match=match, mismatch=mismatch,
                gap=gap, fmt=fmt):
            try:
                q4 = _jax.ShapeDtypeStruct((bp, cap // 2), jnp.uint8)
                dcb = _jax.ShapeDtypeStruct((bp, cap // 8), jnp.uint8)
                mm = _jax.ShapeDtypeStruct((bp,), jnp.int32)
                if fmt == "myers":
                    from .myers_kernel import align_walk_myers_batch

                    align_walk_myers_batch.lower(
                        q4, q4, mm, mm, m_cap=cap, n_cap=cap,
                        w_band=band).compile()
                elif fmt == "myers_rle":
                    from .myers_kernel import align_walk_myers_rle_batch

                    align_walk_myers_rle_batch.lower(
                        q4, q4, mm, mm, m_cap=cap, n_cap=cap,
                        w_band=band).compile()
                else:
                    fn = {"rows": align_walk_rows_batch,
                          "rle": align_walk_rle_batch}.get(
                              fmt, align_walk_batch)
                    fn.lower(q4, q4, dcb, mm, mm, m_cap=cap, n_cap=cap,
                             w_band=band, match=match, mismatch=mismatch,
                             gap=gap).compile()
                _prewarm_ready.add((cap, band, bp, match, mismatch, gap,
                                    fmt))
            except Exception:
                pass  # the real dispatch will surface any compile error

        _spawn_prewarm(_go)


_prewarmed_gather: set = set()
_prewarm_gather_ready: set = set()


def gather_prewarm_done() -> bool:
    """True once every gather-form program this process launched has
    finished compiling AND at least one was launched — i.e. a later
    polish in the same process finds its gather programs warm. A cold
    process returns False (the stage's router then budgets the cold
    ingest)."""
    return (len(_prewarmed_gather) > 0
            and _prewarmed_gather <= _prewarm_gather_ready)


def prewarm_gather_async(specs) -> None:
    """Concurrent AOT compile of device-gather fused programs. Spec:
    (qlen, tlen, dclen, bp, m_cap, n_cap, w_band, match, mismatch, gap,
    fmt) — blob BUCKET lengths are part of the jit key, so these specs
    can only be formed once the round's blobs exist; the stage calls
    this right before its first gather dispatch so every tier/bucket
    program this round needs loads concurrently (cold cost = max, not
    sum — the dense-path prewarm_tiers_async cannot cover these: the
    gather form is a different program)."""
    import jax as _jax

    for spec in specs:
        if spec in _prewarmed_gather:
            continue
        _prewarmed_gather.add(spec)
        (qlen, tlen, dclen, bp, m_cap, n_cap, w_band, match, mismatch,
         gap, fmt) = spec

        def _go(qlen=qlen, tlen=tlen, dclen=dclen, bp=bp, m_cap=m_cap,
                n_cap=n_cap, w_band=w_band, match=match, mismatch=mismatch,
                gap=gap, fmt=fmt):
            try:
                qb = _jax.ShapeDtypeStruct((qlen,), jnp.uint8)
                tb = _jax.ShapeDtypeStruct((tlen,), jnp.uint8)
                db = _jax.ShapeDtypeStruct((dclen,), jnp.uint8)
                meta = _jax.ShapeDtypeStruct((bp, 4), jnp.int32)
                align_walk_gather_batch.lower(
                    qb, tb, db, meta, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap,
                    fmt=fmt).compile()
                _prewarm_gather_ready.add(
                    (qlen, tlen, dclen, bp, m_cap, n_cap, w_band, match,
                     mismatch, gap, fmt))
            except Exception:
                pass  # the real dispatch will surface any compile error

        _spawn_prewarm(_go)


def align_walk_padded(q8, t8, dc8, m, n, *, m_cap, n_cap, w_band, match,
                      mismatch, gap, interpret=False, fixed_b=None,
                      prepacked=False):
    """Batch-size-canonicalizing wrapper around align_walk_batch: packs the
    uplink (nibble codes + deletion-cost bitmask; with prepacked=True the
    callers already hold the packed forms — q8/t8 (B, cap//2) nibble rows
    and dc8 (B, cap//8) bitmask rows, e.g. from the fused native packers
    bindings.pack_rows_nib / pack_rows_bits) and pads the batch up to
    the next power of two (min 16) with all-PAD items so the set of
    compiled XLA programs stays tiny — jit/compile-cache keys include the
    batch dimension, and a fresh big-tier compile costs tens of seconds.
    With fixed_b, pads straight to that size (callers use the tier's chunk
    size so a big tier owns exactly ONE compiled shape). When more than one
    device is visible, the batch is sharded over the device mesh
    (parallel/mesh.sharded_align_walk — window/overlap data parallelism).
    Returns (payload, score, fmt) for the PADDED batch; callers slice [:B].
    fmt names the payload format per walk_fmt: "rle" (event bytes, decode
    with bindings.opstream_rle_to_ops_batch against rle_events(...)),
    "rows" (one record byte per query row + final-deletions + escape,
    decode with bindings.opstream_rows_to_ops_batch against
    rows_payload_width(...)), or "packed2" (2-bit steps, decode against
    walk_steps(...))."""
    from ..parallel.mesh import active_mesh, sharded_align_walk

    B = q8.shape[0]
    mesh = active_mesh()
    bp = padded_batch(B, fixed_b, interpret,
                      mesh.devices.size if mesh is not None else 1)
    if prepacked:
        q4, t4, dcb = q8, t8, dc8
    else:
        q4 = pack_codes4(q8)
        t4 = pack_codes4(t8)
        dcb = pack_delbits(dc8)
    if bp != B:
        pad = bp - B
        q4 = np.pad(q4, ((0, pad), (0, 0)), constant_values=0x55)  # PAD|PAD
        t4 = np.pad(t4, ((0, pad), (0, 0)), constant_values=0x55)
        dcb = np.pad(dcb, ((0, pad), (0, 0)), constant_values=0xFF)
        m = np.pad(np.asarray(m), (0, pad))
        n = np.pad(np.asarray(n), (0, pad))
    fmt = walk_fmt(m_cap, n_cap, w_band, interpret, bp)
    if mesh is not None:
        payload, score = sharded_align_walk(
            mesh, q4, t4, dcb, np.asarray(m, np.int32),
            np.asarray(n, np.int32), m_cap=m_cap, n_cap=n_cap, w_band=w_band,
            match=match, mismatch=mismatch, gap=gap, interpret=interpret,
            fmt=fmt)
        return payload, score, fmt
    if fmt == "rows":
        payload, score = align_walk_rows_batch(
            q4, t4, dcb, np.asarray(m, np.int32), np.asarray(n, np.int32),
            m_cap=m_cap, n_cap=n_cap, w_band=w_band, match=match,
            mismatch=mismatch, gap=gap)
        return payload, score, fmt
    if fmt == "rle":
        payload, score = align_walk_rle_batch(
            q4, t4, dcb, np.asarray(m, np.int32), np.asarray(n, np.int32),
            m_cap=m_cap, n_cap=n_cap, w_band=w_band, match=match,
            mismatch=mismatch, gap=gap)
        return payload, score, fmt
    payload, score = align_walk_batch(
        q4, t4, dcb, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
        match=match, mismatch=mismatch, gap=gap, interpret=interpret)
    return payload, score, fmt


# ---------------------------------------------------------------------- #
# transposed kernel: band on SUBLANES, batch on LANES. On TPU, cross-LANE
# rotates cost ~75ns each while cross-SUBLANE rotates are ~free (measured on
# v5e); the banded-NW inner loop does log2(W)+1 shifts per row (deletion-
# chain max-plus closure + the up-move), so the band must live on the
# sublane axis. Row slices of the target/cost panels become dynamic
# SUBLANE-offset loads (unconstrained, unlike lane offsets), which also
# removes the old layout's shift registers. 6.3x faster than the lane-major
# kernel at (B=8192, cap=640, W=128); outputs are bit-identical modulo
# layout (moves come back (slots, W, B)).
# ---------------------------------------------------------------------- #

B_LANE = 128  # batch lanes per grid step of the transposed kernel


def _nw_band_kernel_t(q_ref, tp_ref, gcp_ref, moves_ref, score_ref, hscr, *,
                      m_cap, n_cap, w_band, match, mismatch, gap):
    """Transposed layout: q (m_cap, BT), tp/gcp (n_cap+2W[+1], BT) with W
    sublanes of padding on both sides, moves (m_cap//16, W, BT), score
    (1, BT). Same DP semantics as _nw_band_kernel. Rows are processed in
    _GROUP-row grid steps (minor grid dim) so the per-step moves block
    stays small; hscr carries H across groups."""
    W = w_band
    BT = q_ref.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    PADL = W
    n_groups = m_cap // _GROUP
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        j0 = dlo + kcol
        g0 = gcp_ref[pl.ds(PADL + dlo, W), :]
        hscr[...] = jnp.where((j0 >= 0) & (j0 <= n_cap), g0, NEG)

    def pack_body(p, hp):
        pack = jnp.zeros((W, BT), jnp.int32)
        for u in range(_PACK):
            i = g * _GROUP + p * _PACK + u + 1
            off = i - 1 + PADL + dlo
            t_row = tp_ref[pl.ds(off, W), :]
            gc_here = gcp_ref[pl.ds(off + 1, W), :]
            qi = q_ref[pl.ds(i - 1, 1), :]
            jrow = i + dlo + kcol
            valid = (jrow >= 1) & (jrow <= n_cap)
            same = t_row == qi
            one_pad = (t_row == PAD_CODE) ^ (qi == PAD_CODE)
            sub = jnp.where(one_pad, NEG, jnp.where(same, match, mismatch))
            diag_c = hp + sub
            up = pltpu.roll(hp, W - 1, 0)  # circular -1: k reads hp[k+1]
            up_c = jnp.where(kcol == W - 1, NEG, up) + gap
            cand = jnp.maximum(diag_c, up_c)
            cand = jnp.where(jrow == 0, i * gap, cand)
            cand = jnp.where(valid | (jrow == 0), cand, NEG)
            a = cand - gc_here
            s = 1
            while s < W:
                r = pltpu.roll(a, s, 0)
                a = jnp.maximum(a, jnp.where(kcol < s, 2 * NEG, r))
                s *= 2
            h = a + gc_here
            h = jnp.where(valid | (jrow == 0), h, NEG)
            mv = jnp.where(h == diag_c, 0, jnp.where(h == up_c, 1, 2))
            mv = jnp.where(valid, mv, 3)
            pack = pack | (mv << (2 * u))
            hp = h
        moves_ref[pl.ds(p, 1), :, :] = pack[None]
        return hp

    h_final = jax.lax.fori_loop(0, _GROUP // _PACK, pack_body, hscr[...])
    hscr[...] = h_final

    @pl.when(g == n_groups - 1)
    def _():
        k_end = n_cap - m_cap - dlo
        score_ref[...] = jax.lax.slice(h_final, (k_end, 0), (k_end + 1, BT))


def nw_band_batch_t(qT, tpT, gcpT, *, m_cap, n_cap, w_band, match, mismatch,
                    gap, interpret=False):
    """qT (m_cap, B) int32 codes, tpT (n_cap + 2W, B) codes with W PAD
    sublanes on both sides, gcpT (n_cap + 1 + 2W, B) cumulative deletion
    costs (W zero rows above, W edge rows below). B must be a multiple of
    B_LANE and m_cap a multiple of 128. Returns (moves (m_cap//16, W, B)
    int32, score (1, B) int32)."""
    B = qT.shape[1]
    assert B % B_LANE == 0 and m_cap % _GROUP == 0
    W = w_band
    kernel = functools.partial(_nw_band_kernel_t, m_cap=m_cap, n_cap=n_cap,
                               w_band=W, match=match, mismatch=mismatch,
                               gap=gap)
    slots = _GROUP // _PACK
    return pl.pallas_call(
        kernel,
        grid=(B // B_LANE, m_cap // _GROUP),
        out_shape=(
            jax.ShapeDtypeStruct((m_cap // _PACK, W, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((m_cap, B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpT.shape[0], B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gcpT.shape[0], B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((slots, W, B_LANE), lambda i, g: (g, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_LANE), jnp.int32),
        ],
        interpret=interpret,
    )(qT, tpT, gcpT)


# ---------------------------------------------------------------------- #
# int8 transposed kernel: same DP and band layout as _nw_band_kernel_t but
# (a) the q/t panels stay int8 end-to-end (4x less VMEM/DMA traffic) and
# (b) the deletion-cost prefix sums gc are INTEGRATED IN-KERNEL from the
# per-column cost panel via a (W, B) running register that advances one
# sublane per row — the (n_cap, B) int32 cumsum the old kernel needed as
# input (a ~30 MB XLA materialization per dispatch at production shapes) is
# never built. Moves/score outputs are bit-identical to _nw_band_kernel_t.
# ---------------------------------------------------------------------- #


def dp16_eligible(m_cap: int, n_cap: int, match: int, mismatch: int,
                  gap: int) -> bool:
    """Whether the t8 sweep may run its H arithmetic in int16 (2x VPU
    width). Sound when every intermediate stays in [-32768, 32767]: with
    neg = -((m_cap + n_cap) * cmax + 64), the most negative value formed
    is diag_c = neg + neg (pad-vs-real at a neg cell), so the gate is
    2 * ((m_cap + n_cap) * cmax + 64) within int16 range (plus the scan
    fill constant -30000, which must stay strictly below every real
    a = cand - gc value: cand >= 2*neg is already covered by the same
    bound). RACON_TPU_DP16=0 disables."""
    import os

    # OPT-IN (default off): this image's Mosaic cannot legalize 16-bit
    # vector compute at all (arith.maxsi on vector<8x128x2xi16> fails, and
    # tpu.dynamic_rotate is 32-bit-only), so the int16 path only exists
    # for interpret-mode validation and for future toolchains. The
    # bit-identity contract is pinned by tests/test_dp16.py either way.
    if os.environ.get("RACON_TPU_DP16", "0") != "1":
        return False
    cmax = max(abs(match), abs(mismatch), abs(gap))
    return 2 * ((m_cap + n_cap) * cmax + 64) <= 30000


def _dp_dtype(m_cap, n_cap, match, mismatch, gap):
    if dp16_eligible(m_cap, n_cap, match, mismatch, gap):
        cmax = max(abs(match), abs(mismatch), abs(gap))
        return jnp.int16, -((m_cap + n_cap) * cmax + 64), -30000
    return jnp.int32, NEG, 2 * NEG


def _nw_band_kernel_t8(q_ref, tp_ref, dcp_ref, moves_ref, score_ref, hscr,
                       gscr, *, m_cap, n_cap, w_band, match, mismatch, gap,
                       dt=jnp.int32, neg=NEG, fill=2 * NEG):
    """q (m_cap, BT) int32 codes; tp (n_cap + 2W, BT) int32 codes with W PAD
    sublanes both sides; dcp (n_cap + 2W, BT) int32 per-column deletion
    costs with W ZERO sublanes both sides (zeros below n_cap freeze gc at
    gc[n_cap], matching the old kernel's edge-padded cumsum). Requires
    dlo <= 0 (equal caps or n_cap - m_cap <= W/2; wrappers guarantee it).
    gscr carries the gc register across row groups: gscr[k] = gc[i+dlo+k]
    for the next row i. H arithmetic runs in `dt` (int16 when
    dp16_eligible — bit-identical moves/score, 2x VPU width)."""
    W = w_band
    BT = q_ref.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    PADL = W
    n_groups = m_cap // _GROUP
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0)
    g = pl.program_id(1)
    negc = jnp.asarray(neg, dt)
    fillc = jnp.asarray(fill, dt)
    mt = jnp.asarray(match, dt)
    xt = jnp.asarray(mismatch, dt)
    gt = jnp.asarray(gap, dt)

    @pl.when(g == 0)
    def _():
        # L[k] = dc_col[dlo + k] (panel pads supply zeros out of range);
        # inclusive scan inc[k] = gc[1 + dlo + k], exclusive E = gc[dlo + k]
        L = dcp_ref[pl.ds(PADL + dlo, W), :].astype(dt)
        inc = L
        s = 1
        while s < W:
            r = pltpu.roll(inc, s, 0)
            inc = inc + jnp.where(kcol < s, jnp.asarray(0, dt), r)
            s *= 2
        E = inc - L
        j0 = dlo + kcol
        hscr[...] = jnp.where((j0 >= 0) & (j0 <= n_cap), E, negc)
        gscr[...] = inc

    def pack_body(p, carry):
        hp, R = carry
        pack = jnp.zeros((W, BT), jnp.int32)
        for u in range(_PACK):
            i = g * _GROUP + p * _PACK + u + 1
            off = i - 1 + PADL + dlo
            t_row = tp_ref[pl.ds(off, W), :]
            qi = q_ref[pl.ds(i - 1, 1), :]
            gc_here = R  # R[k] = gc[i + dlo + k]
            jrow = i + dlo + kcol
            valid = (jrow >= 1) & (jrow <= n_cap)
            same = t_row == qi
            one_pad = (t_row == PAD_CODE) ^ (qi == PAD_CODE)
            sub = jnp.where(one_pad, negc, jnp.where(same, mt, xt))
            diag_c = hp + sub
            up = pltpu.roll(hp, W - 1, 0)  # circular -1: k reads hp[k+1]
            up_c = jnp.where(kcol == W - 1, negc, up) + gt
            cand = jnp.maximum(diag_c, up_c)
            cand = jnp.where(jrow == 0, (i * gap).astype(dt), cand)
            cand = jnp.where(valid | (jrow == 0), cand, negc)
            a = cand - gc_here
            s = 1
            while s < W:
                r = pltpu.roll(a, s, 0)
                a = jnp.maximum(a, jnp.where(kcol < s, fillc, r))
                s *= 2
            h = a + gc_here
            h = jnp.where(valid | (jrow == 0), h, negc)
            mv = jnp.where(h == diag_c, 0, jnp.where(h == up_c, 1, 2))
            mv = jnp.where(valid, mv, 3)
            pack = pack | (mv << (2 * u))
            hp = h
            # advance gc register: R'[k] = gc[i+1+dlo+k]; new top element
            # gc[i+dlo+W] = R[W-1] + dc_col[i+dlo+W-1] (panel row off + W)
            top = jax.lax.slice(R, (W - 1, 0), (W, BT))
            dcrow = dcp_ref[pl.ds(off + W, 1), :].astype(dt)
            R = pltpu.roll(R, W - 1, 0)
            R = jnp.where(kcol == W - 1, top + dcrow, R)
        moves_ref[pl.ds(p, 1), :, :] = pack[None]
        return (hp, R)

    h_final, g_final = jax.lax.fori_loop(0, _GROUP // _PACK, pack_body,
                                         (hscr[...], gscr[...]))
    hscr[...] = h_final
    gscr[...] = g_final

    @pl.when(g == n_groups - 1)
    def _():
        k_end = n_cap - m_cap - dlo
        score_ref[...] = jax.lax.slice(h_final, (k_end, 0),
                                       (k_end + 1, BT)).astype(jnp.int32)


def nw_band_batch_t8(qT, tpT, dcpT, *, m_cap, n_cap, w_band, match, mismatch,
                     gap, interpret=False):
    """qT (m_cap, B) int32 codes, tpT (n_cap + 2W, B) int32 codes with W PAD
    sublanes both sides, dcpT (n_cap + 2W, B) int32 per-column deletion
    costs with W zero sublanes both sides. B must be a multiple of B_LANE
    and m_cap a multiple of 128; requires band_dlo(...) <= 0. Returns
    (moves (m_cap//16, W, B) int32, score (1, B) int32) bit-identical to
    nw_band_batch_t's."""
    B = qT.shape[1]
    assert B % B_LANE == 0 and m_cap % _GROUP == 0
    assert band_dlo(m_cap, n_cap, w_band) <= 0
    W = w_band
    dt, neg, fill = _dp_dtype(m_cap, n_cap, match, mismatch, gap)
    kernel = functools.partial(_nw_band_kernel_t8, m_cap=m_cap, n_cap=n_cap,
                               w_band=W, match=match, mismatch=mismatch,
                               gap=gap, dt=dt, neg=neg, fill=fill)
    slots = _GROUP // _PACK
    return pl.pallas_call(
        kernel,
        grid=(B // B_LANE, m_cap // _GROUP),
        out_shape=(
            jax.ShapeDtypeStruct((m_cap // _PACK, W, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((m_cap, B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpT.shape[0], B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dcpT.shape[0], B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((slots, W, B_LANE), lambda i, g: (g, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_LANE), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_LANE), dt),
            pltpu.VMEM((W, B_LANE), dt),
        ],
        interpret=interpret,
    )(qT, tpT, dcpT)


# ---------------------------------------------------------------------- #
# big-tier transposed kernel: same DP as _nw_band_kernel_t8, but sized for
# caps/bands whose full (rows, B_LANE) panels blow the VMEM budget (the
# overlap-alignment tiers, cap up to 40960 / W up to 4096). The target/cost
# panels are PRE-WINDOWED on the XLA side into per-row-group overlapping
# slabs (one gather; the ~17x HBM redundancy costs ~1 ms per chunk at
# 819 GB/s), so every pallas block is small: q rows per 16-row pack step,
# one (W+_GROUP+_PACK, B_LANE) window per group, one (W, B_LANE) move plane
# per pack step (grid is 3-D with the pack step minor).
# ---------------------------------------------------------------------- #

_WIN_PAD = _GROUP + _PACK  # window rows beyond W per group


def _window_rows(m_cap: int, n_cap: int, w_band: int) -> int:
    return w_band + _WIN_PAD


def _build_group_windows(panelT, m_cap: int, n_cap: int, w_band: int):
    """(n_cap + 2W, B) panel -> (groups, W + _WIN_PAD, B) overlapping
    row-group windows: window g starts at panel row g*_GROUP + W + dlo."""
    W = w_band
    dlo = band_dlo(m_cap, n_cap, W)
    groups = m_cap // _GROUP
    base = (jnp.arange(groups, dtype=jnp.int32) * _GROUP + W + dlo)
    rows = base[:, None] + jnp.arange(_window_rows(m_cap, n_cap, W),
                                      dtype=jnp.int32)[None, :]
    rows = jnp.clip(rows, 0, panelT.shape[0] - 1)
    return panelT[rows]


def _nw_band_kernel_t8big(q_ref, tpw_ref, dcw_ref, moves_ref, score_ref,
                          hscr, gscr, *, m_cap, n_cap, w_band, match,
                          mismatch, gap, dt=jnp.int32, neg=NEG,
                          fill=2 * NEG):
    """q (16, BT) rows of this pack step; tpw/dcw (1, W+_WIN_PAD, BT) this
    GROUP's pre-windowed target/cost rows (pallas reuses the block across
    the 8 pack steps of a group); moves (1, W, BT) this step's plane.
    hscr/gscr carry H and the gc register across the minor grid dims."""
    W = w_band
    BT = q_ref.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    n_groups = m_cap // _GROUP
    packs = _GROUP // _PACK
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0)
    g = pl.program_id(1)
    p = pl.program_id(2)
    negc = jnp.asarray(neg, dt)
    fillc = jnp.asarray(fill, dt)
    mt = jnp.asarray(match, dt)
    xt = jnp.asarray(mismatch, dt)
    gt = jnp.asarray(gap, dt)

    @pl.when((g == 0) & (p == 0))
    def _():
        L = dcw_ref[0, pl.ds(0, W), :].astype(dt)
        inc = L
        s = 1
        while s < W:
            r = pltpu.roll(inc, s, 0)
            inc = inc + jnp.where(kcol < s, jnp.asarray(0, dt), r)
            s *= 2
        E = inc - L
        j0 = dlo + kcol
        hscr[...] = jnp.where((j0 >= 0) & (j0 <= n_cap), E, negc)
        gscr[...] = inc

    hp = hscr[...]
    R = gscr[...]
    pack = jnp.zeros((W, BT), jnp.int32)
    for u in range(_PACK):
        i = g * _GROUP + p * _PACK + u + 1
        loc = p * _PACK + u  # window-local row offset
        t_row = tpw_ref[0, pl.ds(loc, W), :]
        qi = q_ref[pl.ds(u, 1), :]
        gc_here = R
        jrow = i + dlo + kcol
        valid = (jrow >= 1) & (jrow <= n_cap)
        same = t_row == qi
        one_pad = (t_row == PAD_CODE) ^ (qi == PAD_CODE)
        sub = jnp.where(one_pad, negc, jnp.where(same, mt, xt))
        diag_c = hp + sub
        up = pltpu.roll(hp, W - 1, 0)
        up_c = jnp.where(kcol == W - 1, negc, up) + gt
        cand = jnp.maximum(diag_c, up_c)
        cand = jnp.where(jrow == 0, (i * gap).astype(dt), cand)
        cand = jnp.where(valid | (jrow == 0), cand, negc)
        a = cand - gc_here
        s = 1
        while s < W:
            r = pltpu.roll(a, s, 0)
            a = jnp.maximum(a, jnp.where(kcol < s, fillc, r))
            s *= 2
        h = a + gc_here
        h = jnp.where(valid | (jrow == 0), h, negc)
        mv = jnp.where(h == diag_c, 0, jnp.where(h == up_c, 1, 2))
        mv = jnp.where(valid, mv, 3)
        pack = pack | (mv << (2 * u))
        hp = h
        top = jax.lax.slice(R, (W - 1, 0), (W, BT))
        dcrow = dcw_ref[0, pl.ds(loc + W, 1), :].astype(dt)
        R = pltpu.roll(R, W - 1, 0)
        R = jnp.where(kcol == W - 1, top + dcrow, R)
    moves_ref[...] = pack[None]
    hscr[...] = hp
    gscr[...] = R

    @pl.when((g == n_groups - 1) & (p == packs - 1))
    def _():
        k_end = n_cap - m_cap - dlo
        score_ref[...] = jax.lax.slice(hp, (k_end, 0),
                                       (k_end + 1, BT)).astype(jnp.int32)


def nw_band_batch_t8big(qT, tpT, dcpT, *, m_cap, n_cap, w_band, match,
                        mismatch, gap, interpret=False):
    """Big-tier twin of nw_band_batch_t8 (same inputs, same outputs,
    bit-identical moves/score): pre-windows the panels per row group and
    runs the 3-D-grid kernel whose VMEM blocks stay small at any tier."""
    B = qT.shape[1]
    assert B % B_LANE == 0 and m_cap % _GROUP == 0
    assert band_dlo(m_cap, n_cap, w_band) <= 0
    W = w_band
    groups = m_cap // _GROUP
    packs = _GROUP // _PACK
    win = _window_rows(m_cap, n_cap, W)
    tpw = _build_group_windows(tpT, m_cap, n_cap, W)
    dcw = _build_group_windows(dcpT, m_cap, n_cap, W)
    dt, neg, fill = _dp_dtype(m_cap, n_cap, match, mismatch, gap)
    kernel = functools.partial(_nw_band_kernel_t8big, m_cap=m_cap,
                               n_cap=n_cap, w_band=W, match=match,
                               mismatch=mismatch, gap=gap, dt=dt, neg=neg,
                               fill=fill)
    return pl.pallas_call(
        kernel,
        grid=(B // B_LANE, groups, packs),
        out_shape=(
            jax.ShapeDtypeStruct((m_cap // _PACK, W, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((_PACK, B_LANE), lambda b, g, p: (g * packs + p, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, B_LANE), lambda b, g, p: (g, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, B_LANE), lambda b, g, p: (g, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W, B_LANE), lambda b, g, p: (g * packs + p, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_LANE), lambda b, g, p: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_LANE), dt),
            pltpu.VMEM((W, B_LANE), dt),
        ],
        interpret=interpret,
    )(qT, tpw, dcw)


def t_big_fits(m_cap: int, n_cap: int, w_band: int) -> bool:
    """Eligibility of the big-tier kernel. Every VMEM consumer scales with
    W only (double-buffered windows + move plane, two scratch registers,
    and the DP body's live (W, B_LANE) temporaries): Mosaic reports
    ~16.1 MB of scoped vmem at W=1024 (fits the 16 MB stack limit) and
    ~32.3 MB at W=2048 (rejected), so the bound is simply W <= 1024.
    RACON_TPU_BIGTIER=0 forces the lane-major fallback instead — on
    tethered chips whose remote compile/load service is slow, a one-shot
    CLI run can come out ahead loading the (10x cheaper) lane-major
    program even though it executes ~2x slower."""
    import os

    if os.environ.get("RACON_TPU_BIGTIER", "1") == "0":
        return False
    return (m_cap % _GROUP == 0
            and band_dlo(m_cap, n_cap, w_band) <= 0
            and w_band <= 1024)


def align_walk_packed_core_rle_tbig(q4, t4, dcb, m, n, *, m_cap, n_cap,
                                    w_band, match, mismatch, gap,
                                    interpret=False):
    """align_walk_packed_core_rle_t with the big-tier kernel (same payload
    format and values)."""
    W = w_band
    qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, gap=gap)
    moves, score = nw_band_batch_t8big(qT, tpT, dcpT, m_cap=m_cap,
                                       n_cap=n_cap, w_band=W, match=match,
                                       mismatch=mismatch, gap=gap,
                                       interpret=interpret)
    events, escaped = walk_moves_rle_t(
        moves, m, n, m_cap=m_cap, n_cap=n_cap, w_band=W,
        max_events=rle_events(m_cap, n_cap, W))
    payload = jnp.concatenate([events, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    return payload, score.T


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "max_steps", "packed"))
def walk_moves_device_t(moves, m, n, *, m_cap, n_cap, w_band, max_steps,
                        packed=False):
    """walk_moves_device for the transposed move layout
    (slots, W, B): identical op-stream outputs."""
    B = moves.shape[2]
    dlo = band_dlo(m_cap, n_cap, w_band)
    mflat = moves.reshape(-1, B)
    m = m.astype(jnp.int32)
    n = n.astype(jnp.int32)

    def step(carry, _):
        i, j, escaped = carry
        k = j - i - dlo
        at_origin = (i == 0) & (j == 0)
        row = jnp.maximum(i - 1, 0)
        widx = (row // 16) * w_band + jnp.clip(k, 0, w_band - 1)
        word = jnp.take_along_axis(mflat, widx[None, :], axis=0)[0]
        mv = (word >> (2 * (row % 16))) & 3
        mv = jnp.where(i == 0, 2, mv)
        mv = jnp.where((j == 0) & (i > 0), 1, mv)
        inband = (k >= 0) & (k < w_band)
        esc = escaped | (~at_origin & (i > 0) & (j > 0) &
                         (~inband | (mv == 3)))
        mv = jnp.where(esc | at_origin, OP_STREAM_SKIP, mv)
        di = jnp.where((mv == 0) | (mv == 1), 1, 0)
        dj = jnp.where((mv == 0) | (mv == 2), 1, 0)
        real = jnp.where(mv == 0, (i <= m) & (j <= n),
                         jnp.where(mv == 1, i <= m, j <= n))
        out = jnp.where((mv == OP_STREAM_SKIP) | ~real, OP_STREAM_SKIP,
                        mv).astype(jnp.int8)
        return (i - di, j - dj, esc), out

    buf0 = jnp.full((max_steps, B), OP_STREAM_SKIP, jnp.int8)

    def cond(carry):
        s, i, j, escaped, _ = carry
        return (s < max_steps) & jnp.any(((i != 0) | (j != 0)) & ~escaped)

    def body(carry):
        s, i, j, escaped, buf = carry
        (i2, j2, esc2), out = step((i, j, escaped), None)
        buf = jax.lax.dynamic_update_slice(buf, out[None, :], (s, 0))
        return (s + 1, i2, j2, esc2, buf)

    init = (jnp.int32(0), m, n, jnp.zeros((B,), bool), buf0)
    _, fi, fj, escaped, outs = jax.lax.while_loop(cond, body, init)
    escaped = escaped | (fi != 0) | (fj != 0)
    if not packed:
        return outs.T, escaped
    assert max_steps % 4 == 0
    quads = outs.astype(jnp.uint8).reshape(max_steps // 4, 4, B)
    shifts = (2 * jnp.arange(4, dtype=jnp.uint8))[None, :, None]
    return jnp.sum(quads << shifts, axis=1, dtype=jnp.uint8).T, escaped


# ---------------------------------------------------------------------- #
# RLE traceback walk: one emitted byte per EVENT instead of per step.
# Diagonal (match/mismatch) steps at one band lane k share the packed move
# word (16 query rows per int32), so a run of them can be consumed with a
# single gather; indels change lanes and stay single-step. Measured on the
# consensus workload the walk does ~2.7x fewer iterations for the same D2H
# budget (mean path ~435 steps vs ~100 events).
# ---------------------------------------------------------------------- #

RLE_SKIP = 0    # finished / escaped filler
RLE_UP = 201    # one insertion step (query-consuming)
RLE_LEFT = 202  # one deletion step (target-consuming)
# values 1..16 = run of that many diagonal steps


def rle_events(m_cap: int, n_cap: int, w_band: int) -> int:
    """Event budget for the RLE walk: same D2H bytes as the 2-bit packed
    stream (walk_steps/4). Typical windows use well under half of it;
    busier walks overflow, are flagged escaped, and realign on the host
    (bit-identical scoring), so a tight budget is safe."""
    return max(walk_steps(m_cap, n_cap, w_band) // 4, 64)


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "max_events"))
def walk_moves_rle_t(moves, m, n, *, m_cap, n_cap, w_band, max_events):
    """RLE walk over the transposed move layout (slots, W, B).

    Returns (events (B, max_events) uint8 emitted BACKWARD from (m, n),
    escaped (B,) bool). Event bytes: RLE_SKIP, 1..16 diagonal run,
    RLE_UP / RLE_LEFT single indel steps. Decoded by the host's
    rt_opstream_rle_to_ops_batch into the same forward op lists as the
    2-bit stream decoder (RLE_SKIP bytes are ignored, so interior padding
    is harmless).

    Each iteration consumes up to TWO events: a diagonal run, then the
    indel that follows it when its move bits live in the SAME word (same
    band lane, run not reaching the word's bottom group). The per-iteration
    cost is dominated by the (slots*W, B) per-lane gather, so fusing the
    run+indel pair — the common pattern at ONT error rates — nearly halves
    the walk's device time."""
    B = moves.shape[2]
    W = w_band
    dlo = band_dlo(m_cap, n_cap, W)
    mflat = moves.reshape(-1, B)
    m = m.astype(jnp.int32)
    n = n.astype(jnp.int32)

    def step(carry):
        i, j, escaped = carry
        at_origin = (i == 0) & (j == 0)
        interior = (i > 0) & (j > 0)
        row = jnp.maximum(i - 1, 0)
        k = j - i - dlo
        widx = (row // _PACK) * W + jnp.clip(k, 0, W - 1)
        word = jnp.take_along_axis(mflat, widx[None, :], axis=0)[0]
        p = row % _PACK
        mv = (word >> (2 * p)) & 3
        mv = jnp.where(i == 0, 2, mv)
        mv = jnp.where((j == 0) & (i > 0), 1, mv)
        inband = (k >= 0) & (k < W)
        esc = escaped | (~at_origin & interior & (~inband | (mv == 3)))
        # diagonal run: consecutive zero 2-bit groups from group p downward
        # (rows row, row-1, ... at the same lane k). Count via leading-zero
        # binary search on the word shifted so group p sits at the top.
        z = (word.astype(jnp.uint32)) << (2 * (_PACK - 1 - p)).astype(
            jnp.uint32)
        nlz = jnp.zeros_like(z, jnp.int32)
        for sh, thr_ in ((16, 0x0000FFFF), (8, 0x00FFFFFF), (4, 0x0FFFFFFF),
                         (2, 0x3FFFFFFF), (1, 0x7FFFFFFF)):
            take = z <= jnp.uint32(thr_)
            nlz = nlz + jnp.where(take, sh, 0)
            if sh > 1:
                z = jnp.where(take, z << jnp.uint32(sh), z)
        d = jnp.minimum(nlz >> 1, p + 1)           # run within this word
        d = jnp.where(interior & ~esc, jnp.minimum(d, jnp.minimum(i, j)), 0)
        single = jnp.where(mv == 1, RLE_UP, jnp.where(mv == 2, RLE_LEFT, 0))
        out = jnp.where(d > 0, d, single)
        out = jnp.where(esc | at_origin, RLE_SKIP, out).astype(jnp.uint8)
        di = jnp.where(esc | at_origin, 0,
                       jnp.where(d > 0, d, jnp.where(mv == 1, 1, 0)))
        dj = jnp.where(esc | at_origin, 0,
                       jnp.where(d > 0, d, jnp.where(mv == 2, 1, 0)))
        i1 = i - di
        j1 = j - dj

        # fused second event: after a run of d, the next position (i1, j1)
        # sits at the SAME lane k, group p - d of the SAME word when d <= p.
        # Replays the single-step move logic with the already-loaded word;
        # anything not consumable here (word drained, pad move, origin) is
        # simply left for the next iteration, whose own logic handles it.
        at_origin2 = (i1 == 0) & (j1 == 0)
        interior2 = (i1 > 0) & (j1 > 0)
        p2 = p - d
        mv2 = (word >> (2 * jnp.maximum(p2, 0))) & 3
        mv2 = jnp.where(i1 == 0, 2, mv2)
        mv2 = jnp.where((j1 == 0) & (i1 > 0), 1, mv2)
        # border positions force an indel without reading word bits, so
        # they are consumable even when the run drained the word
        take2 = (~esc & (d > 0) & ~at_origin2
                 & (~interior2 | ((p2 >= 0)
                                  & ((mv2 == 1) | (mv2 == 2)))))
        out2 = jnp.where(mv2 == 1, RLE_UP, RLE_LEFT)
        out2 = jnp.where(take2, out2, RLE_SKIP).astype(jnp.uint8)
        di2 = jnp.where(take2 & (mv2 == 1), 1, 0)
        dj2 = jnp.where(take2 & (mv2 == 2), 1, 0)
        return (i1 - di2, j1 - dj2, esc), (out, out2)

    buf0 = jnp.full((max_events, B), RLE_SKIP, jnp.uint8)

    def cond(carry):
        s, i, j, escaped, _ = carry
        return (s + 1 < max_events) & jnp.any(((i != 0) | (j != 0))
                                              & ~escaped)

    def body(carry):
        s, i, j, escaped, buf = carry
        (i2, j2, esc2), (out, out2) = step((i, j, escaped))
        buf = jax.lax.dynamic_update_slice(
            buf, jnp.stack([out, out2]), (s, 0))
        return (s + 2, i2, j2, esc2, buf)

    init = (jnp.int32(0), m, n, jnp.zeros((B,), bool), buf0)
    _, fi, fj, escaped, outs = jax.lax.while_loop(cond, body, init)
    escaped = escaped | (fi != 0) | (fj != 0)  # budget overflow -> fallback
    return outs.T, escaped


def align_walk_packed_core_rle_t(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band,
                                 match, mismatch, gap):
    """align_walk_packed_core_t with the RLE walk: payload is
    (B, rle_events(...) + 1) uint8 — event bytes plus the escape flag."""
    W = w_band
    qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, gap=gap)
    moves, score = nw_band_batch_t8(qT, tpT, dcpT, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, match=match, mismatch=mismatch,
                                    gap=gap)
    events, escaped = walk_moves_rle_t(
        moves, m, n, m_cap=m_cap, n_cap=n_cap, w_band=W,
        max_events=rle_events(m_cap, n_cap, W))
    payload = jnp.concatenate([events, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    return payload, score.T


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "match", "mismatch", "gap"))
def align_walk_rle_batch(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band, match,
                         mismatch, gap):
    if t_kernel_fits(m_cap, n_cap, w_band):
        return align_walk_packed_core_rle_t(
            q4, t4, dcb, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
            match=match, mismatch=mismatch, gap=gap)
    return align_walk_packed_core_rle_tbig(
        q4, t4, dcb, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
        match=match, mismatch=mismatch, gap=gap)


# ---------------------------------------------------------------------- #
# device-resident gather path: the static layer codes are uploaded ONCE per
# stage as a nibble-packed flat blob; each refinement pass uploads only the
# new backbone blob (+ deletion-cost bitmask) and per-item (start, len)
# metadata, and the (B, CAP) row matrices are gathered ON DEVICE. This
# removes the dominant per-pass H2D cost on tethered/tunneled chips (the
# dense row matrices are ~25x larger than the underlying blobs).
# ---------------------------------------------------------------------- #


def pack_codes4_flat(codes8: np.ndarray) -> np.ndarray:
    """(L,) int8 codes -> (ceil(L/2),) uint8 nibble-packed flat blob."""
    x = np.asarray(codes8).view(np.uint8)
    if len(x) % 2:
        x = np.concatenate([x, np.full(1, PAD_CODE, np.uint8)])
    return (x[0::2] | (x[1::2] << 4)).astype(np.uint8)


def pack_bits_flat(mask: np.ndarray) -> np.ndarray:
    """(L,) bool/int -> (ceil(L/8),) uint8 little-endian bitmask blob."""
    return np.packbits(np.asarray(mask) != 0, bitorder="little")


def blob_bucket(n: int, minimum: int = 1 << 12) -> int:
    """Blob shapes are jit-static: bucket to the next power of two so the
    compiled-program set stays small as backbones grow across passes."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _gather_nib_rows(blob4, start, length, cap: int, fill: int):
    """Gather rows [start[i], start[i]+length[i]) of a nibble-packed flat
    blob into a (B, cap) int8 code matrix, fill beyond each row's length."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (start.shape[0], cap), 1)
    idx = start[:, None].astype(jnp.int32) + pos
    valid = pos < length[:, None]
    idxc = jnp.where(valid, idx, 0)
    if blob4.dtype in (jnp.int32, jnp.uint32):  # word-form blob
        word = blob4[idxc >> 3]
        code = (word >> ((idxc & 7) << 2)) & 0xF
    else:
        byte = blob4[idxc >> 1]
        code = (byte >> ((idxc & 1) << 2)) & 0xF
    return jnp.where(valid, code, fill).astype(jnp.int8)


def _gather_bit_rows(bits, start, length, cap: int, fillbit: int):
    """Same row gather for a little-endian bitmask blob -> (B, cap) int32
    in {0, 1}."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (start.shape[0], cap), 1)
    idx = start[:, None].astype(jnp.int32) + pos
    valid = pos < length[:, None]
    idxc = jnp.where(valid, idx, 0)
    byte = bits[idxc >> 3]
    bit = (byte >> (idxc & 7)) & 1
    return jnp.where(valid, bit, fillbit).astype(jnp.int32)


def align_walk_gather_core(qblob4, tblob4, dcbits, meta, *, m_cap, n_cap,
                           w_band, match, mismatch, gap, nw_fn):
    """Traceable fused body of the gather path. meta is (B, 4) int32 rows
    [q_start, m, t_start, n] (element indices into the flat blobs)."""
    qs, m, ts, n = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    q8 = _gather_nib_rows(qblob4, qs, m, m_cap, PAD_CODE)
    t8 = _gather_nib_rows(tblob4, ts, n, n_cap, PAD_CODE)
    dc = _gather_bit_rows(dcbits, ts, n, n_cap, 1) * gap
    return align_walk_core(q8, t8, dc, m, n, m_cap=m_cap, n_cap=n_cap,
                           w_band=w_band, match=match, mismatch=mismatch,
                           gap=gap, nw_fn=nw_fn)


def _blob_words32(blob8):
    """(L,) uint8 blob -> (ceil(L / 4),) int32 words (little-endian);
    int32 input passes through (the production path: device_put_blob
    words=True uploads the word form directly, so no per-dispatch
    conversion exists at all).

    The conversion here exists for raw uint8 test blobs only, and is
    formulated as strided slices + shifts on 1-D arrays: the previous
    bitcast via a (L/4, 4) reshape acquired a (8,128)-tiled layout whose
    minor dim padded 4 -> 128, i.e. a 32x HBM blow-up that OOMed the
    chip at the 2^27 blob bucket (a 50 Mb x 20x genome: 16 GB temp for a
    512 MB blob)."""
    if blob8.dtype in (jnp.int32, jnp.uint32):
        return blob8.astype(jnp.int32)
    L = blob8.shape[0]
    if L % 4:
        blob8 = jnp.pad(blob8, (0, 4 - L % 4))
    b = blob8.astype(jnp.uint32)
    w = (b[0::4] | (b[1::4] << 8) | (b[2::4] << 16) | (b[3::4] << 24))
    return w.astype(jnp.int32)


def _lsr32(x, s):
    s = jnp.broadcast_to(jnp.asarray(s, x.dtype), x.shape)
    return jax.lax.shift_right_logical(x, s)


def _gather_nib_cols(blob4, start, length, rows: int, row_off: int,
                     fill: int):
    """Transposed row gather: output (rows, B) int8 where entry (r, b) is
    blob element start[b] + r + row_off when 0 <= r + row_off < length[b],
    else fill. row_off < 0 leaves `-row_off` fill sublanes on top (used for
    the target panel's band padding).

    Word-wise formulation: per-ELEMENT byte gathers cost ~16 ns each on
    TPU (the round-3 production consensus dispatch spent 72 of its 102 ms
    device time in these gathers); fetching int32 WORDS (8 nibbles each)
    cuts the gathered-element count 8x, then a per-item funnel shift
    realigns to the word boundary and a dense 8-way unpack recovers the
    element stream — measured 21.3 -> 2.4 ms for the q panel at B=4096."""
    B = start.shape[0]
    words = _blob_words32(blob4)
    NW = words.shape[0]
    nwb = (rows + 7) // 8 + 2  # covered words + funnel slack
    s = start.astype(jnp.int32) + row_off  # element index of output row 0
    w0 = s >> 3  # floor for negative s (row_off < 0); fetches clipped
    idxw = w0[None, :] + jax.lax.broadcasted_iota(jnp.int32, (nwb, B), 0)
    raw = jnp.take(words, jnp.clip(idxw, 0, NW - 1), axis=0,
                   indices_are_sorted=False)  # (nwb, B)
    sh = (s & 7) << 2  # bit shift of the realignment funnel
    lo = _lsr32(raw[:-1], sh[None, :])
    hi = jnp.where(sh[None, :] == 0, 0,
                   raw[1:] << ((32 - sh) & 31)[None, :])
    rw = lo | hi  # (nwb - 1, B): element s + 8w at bits 4k
    nibs = jnp.stack([(_lsr32(rw, 4 * k)) & 0xF for k in range(8)],
                     axis=1).reshape((nwb - 1) * 8, B)
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 0) + row_off
    valid = (pos >= 0) & (pos < length[None, :])
    return jnp.where(valid, nibs[:rows], fill).astype(jnp.int8)


def _gather_bit_cols(bits, start, length, rows: int, fillbit: int):
    """Word-wise twin of _gather_nib_cols for little-endian bitmask blobs
    (32 bits per fetched word, 32-way dense unpack)."""
    B = start.shape[0]
    words = _blob_words32(bits)
    NW = words.shape[0]
    nwb = (rows + 31) // 32 + 2
    s = start.astype(jnp.int32)
    w0 = s >> 5
    idxw = w0[None, :] + jax.lax.broadcasted_iota(jnp.int32, (nwb, B), 0)
    raw = jnp.take(words, jnp.clip(idxw, 0, NW - 1), axis=0)
    sh = s & 31
    lo = _lsr32(raw[:-1], sh[None, :])
    hi = jnp.where(sh[None, :] == 0, 0,
                   raw[1:] << ((32 - sh) & 31)[None, :])
    rw = lo | hi  # (nwb - 1, B): bit s + 32w at bit k
    bitsT = jnp.stack([(_lsr32(rw, k)) & 1 for k in range(32)],
                      axis=1).reshape((nwb - 1) * 32, B)
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 0)
    valid = pos < length[None, :]
    return jnp.where(valid, bitsT[:rows], fillbit).astype(jnp.int32)


def align_walk_gather_core_t(qblob4, tblob4, dcbits, meta, *, m_cap, n_cap,
                             w_band, match, mismatch, gap, interpret=False):
    """Fused gather + transposed banded NW + transposed walk: the production
    real-chip body (see nw_band_batch_t8). Payload/score outputs are
    bit-identical to align_walk_gather_core's."""
    qs, m, ts, n = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    B = meta.shape[0]
    W = w_band
    qT = _gather_nib_cols(qblob4, qs, m, m_cap, 0, PAD_CODE).astype(jnp.int32)
    # the W band-pad rows on both sides are pure PAD fill (lengths are
    # <= n_cap by the stage contract) — gather only the n_cap real rows
    tpT = jnp.pad(_gather_nib_cols(tblob4, ts, n, n_cap, 0, PAD_CODE),
                  ((W, W), (0, 0)),
                  constant_values=PAD_CODE).astype(jnp.int32)
    # per-column deletion costs, gap beyond each row's length up to n_cap
    # (matching pack_rows_bits' fill) and ZERO in the W-row pads so the
    # in-kernel gc freezes at gc[n_cap] like the old edge-padded cumsum
    dcT = _gather_bit_cols(dcbits, ts, n, n_cap, 1) * gap
    dcpT = jnp.pad(dcT, ((W, W), (0, 0)))
    moves, score = nw_band_batch_t8(qT, tpT, dcpT, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, match=match, mismatch=mismatch,
                                    gap=gap, interpret=interpret)
    codes, escaped = walk_moves_device_t(
        moves, m, n, m_cap=m_cap, n_cap=n_cap, w_band=W,
        max_steps=walk_steps(m_cap, n_cap, W), packed=True)
    payload = jnp.concatenate([codes, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    return payload, score.T


def align_walk_gather_core_rle_t(qblob4, tblob4, dcbits, meta, *, m_cap,
                                 n_cap, w_band, match, mismatch, gap,
                                 interpret=False):
    """align_walk_gather_core_t with the RLE walk (the stage-default
    payload): event bytes + escape flag, decoded by
    bindings.opstream_rle_to_ops_batch. Until round 4 the gather path
    only offered rows/packed2 payloads, which silently forced the
    production consensus dispatch onto the slowest walk (packed2) —
    102 ms/dispatch at 640/128 B=4096 vs 7.3 ms for the dense rle body.
    The walk is pure jnp; interpret=True runs the sweep's interpret path
    so the CPU suite can pin this core against the lane-major oracle."""
    qs, m, ts, n = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    W = w_band
    qT = _gather_nib_cols(qblob4, qs, m, m_cap, 0, PAD_CODE).astype(jnp.int32)
    # the W band-pad rows on both sides are pure PAD fill (lengths are
    # <= n_cap by the stage contract) — gather only the n_cap real rows
    tpT = jnp.pad(_gather_nib_cols(tblob4, ts, n, n_cap, 0, PAD_CODE),
                  ((W, W), (0, 0)),
                  constant_values=PAD_CODE).astype(jnp.int32)
    dcT = _gather_bit_cols(dcbits, ts, n, n_cap, 1) * gap
    dcpT = jnp.pad(dcT, ((W, W), (0, 0)))
    moves, score = nw_band_batch_t8(qT, tpT, dcpT, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, match=match, mismatch=mismatch,
                                    gap=gap, interpret=interpret)
    events, escaped = walk_moves_rle_t(
        moves, m, n, m_cap=m_cap, n_cap=n_cap, w_band=W,
        max_events=rle_events(m_cap, n_cap, W))
    payload = jnp.concatenate([events, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    return payload, score.T


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "match", "mismatch", "gap",
                                             "interpret", "fmt"))
def align_walk_gather_batch(qblob4, tblob4, dcbits, meta, *, m_cap, n_cap,
                            w_band, match, mismatch, gap, interpret=False,
                            fmt="packed2"):
    """Device-resident fused align+walk: qblob4/tblob4 (L,) uint8
    nibble-packed code blobs (pack_codes4_flat), dcbits (L//8,) uint8
    deletion-cost bitmask blob (pack_bits_flat; bit set = cost `gap`), meta
    (B, 4) int32 [q_start, m, t_start, n]. Pad items use meta rows of
    zeros. Same outputs as align_walk_batch; fmt picks the payload format
    (walk_fmt). On real chips this runs the transposed (sublane-band)
    kernel; interpret mode keeps the lane-major kernel (whose interpret
    path is exercised by the CPU test suite)."""
    if fmt == "rows":
        return align_walk_gather_core_rows_t(
            qblob4, tblob4, dcbits, meta, m_cap=m_cap, n_cap=n_cap,
            w_band=w_band, match=match, mismatch=mismatch, gap=gap)
    if fmt == "rle":
        return align_walk_gather_core_rle_t(
            qblob4, tblob4, dcbits, meta, m_cap=m_cap, n_cap=n_cap,
            w_band=w_band, match=match, mismatch=mismatch, gap=gap,
            interpret=interpret)
    if not interpret and t_kernel_fits(m_cap, n_cap, w_band):
        return align_walk_gather_core_t(
            qblob4, tblob4, dcbits, meta, m_cap=m_cap, n_cap=n_cap,
            w_band=w_band, match=match, mismatch=mismatch, gap=gap)
    nw_fn = functools.partial(nw_band_batch, interpret=interpret)
    return align_walk_gather_core(qblob4, tblob4, dcbits, meta, m_cap=m_cap,
                                  n_cap=n_cap, w_band=w_band, match=match,
                                  mismatch=mismatch, gap=gap, nw_fn=nw_fn)


def gather_padded_bp(B: int, fixed_b, mesh_size: int) -> int:
    """The padded batch dimension align_walk_gather_padded dispatches
    with: next power of two (min 16), or fixed_b; always B_LANE-aligned
    per mesh shard (the gather cores run the transposed kernels). The
    consensus stage's gather-program prewarm MUST use this same function
    (and gather_fmt) so the warmed jit keys match the real dispatch."""
    if fixed_b is not None:
        bp = max(fixed_b, B)
    else:
        bp = 16
        while bp < B:
            bp *= 2
    unit = mesh_size * B_LANE
    return -(-bp // unit) * unit


def gather_fmt(m_cap: int, n_cap: int, w_band: int, interpret: bool,
               bp: int) -> str:
    """walk_fmt's stage policy restricted to the gather cores: both fused
    walks require the small transposed sweep (no big-tier gather
    variant), so a big-only tier falls back to the 2-bit step stream."""
    fmt = walk_fmt(m_cap, n_cap, w_band, interpret, bp)
    if fmt not in ("rows", "rle") or not t_kernel_fits(m_cap, n_cap,
                                                       w_band):
        fmt = "packed2"
    return fmt


def align_walk_gather_padded(qblob4_dev, tblob4_dev, dcbits_dev, meta, *,
                             m_cap, n_cap, w_band, match, mismatch, gap,
                             interpret=False, fixed_b=None):
    """Batch-size-canonicalizing wrapper around align_walk_gather_batch
    (same padding policy as align_walk_padded: next power of two, min 16,
    or straight to fixed_b; mesh-aligned when sharding). The blob arguments
    should already be on device (utils: device_put_blob) so only meta rides
    the per-call uplink. Returns (payload, score, fmt) for the PADDED
    batch."""
    from ..parallel.mesh import active_mesh, sharded_align_walk_gather

    B = meta.shape[0]
    mesh = active_mesh()
    bp = gather_padded_bp(B, fixed_b,
                          mesh.devices.size if mesh is not None else 1)
    if bp != B:
        meta = np.pad(np.asarray(meta), ((0, bp - B), (0, 0)))
    fmt = gather_fmt(m_cap, n_cap, w_band, interpret, bp)
    if mesh is not None:
        payload, score = sharded_align_walk_gather(
            mesh, qblob4_dev, tblob4_dev, dcbits_dev, meta, m_cap=m_cap,
            n_cap=n_cap, w_band=w_band, match=match, mismatch=mismatch,
            gap=gap, interpret=interpret, fmt=fmt)
        return payload, score, fmt
    payload, score = align_walk_gather_batch(
        qblob4_dev, tblob4_dev, dcbits_dev, meta, m_cap=m_cap, n_cap=n_cap,
        w_band=w_band, match=match, mismatch=mismatch, gap=gap,
        interpret=interpret, fmt=fmt)
    return payload, score, fmt


def device_put_blob(arr: np.ndarray, bucket_min: int = 1 << 12,
                    pad_value: int = 0, words: bool = False):
    """Pad a flat blob to its power-of-two bucket and place it on device
    (replicated over the active mesh when one exists). Returns the device
    array; per-call uplink then carries only the small metadata.

    words=True uploads the blob as little-endian int32 WORDS (a free
    host-side view; buckets are multiples of 4): the word-wise gather
    cores consume exactly this form, and uploading it directly removes
    the per-dispatch uint8->word conversion whose padded-layout temp
    OOMed at genome-scale blob buckets (see _blob_words32)."""
    import jax as _jax
    from ..parallel.mesh import active_mesh

    n = blob_bucket(len(arr), bucket_min)
    if n != len(arr):
        arr = np.pad(arr, (0, n - len(arr)), constant_values=pad_value)
    if words:
        arr = arr.view(np.int32)
    mesh = active_mesh()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        return _jax.device_put(arr, NamedSharding(mesh, P()))
    return _jax.device_put(arr)


# ---------------------------------------------------------------------- #
# pure-JAX reference implementation of the kernel (identical outputs: same
# band geometry, same move packing, same score). Used (a) as the oracle in
# kernel tests and (b) under shard_map on CPU meshes, where interpret-mode
# pallas_call does not execute (callback-based emulation deadlocks under
# multi-device SPMD).
# ---------------------------------------------------------------------- #


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "match", "mismatch", "gap"))
def nw_band_batch_ref(q, t, gc, *, m_cap, n_cap, w_band, match, mismatch,
                      gap):
    """Pure-jax.numpy twin of nw_band_batch (same signature minus interpret).

    Row-scan over the query with the same band-lane layout, horizontal
    max-plus closure, move priorities, and 16-rows-per-int32 packing as the
    Pallas kernel; outputs are bit-identical.
    """
    B = q.shape[0]
    W = w_band
    dlo = band_dlo(m_cap, n_cap, W)
    if B % B_TILE:
        extra = B_TILE - B % B_TILE
        q = jnp.pad(q, ((0, extra), (0, 0)), constant_values=PAD_CODE)
        t = jnp.pad(t, ((0, extra), (0, 0)), constant_values=PAD_CODE)
        gc = jnp.pad(gc, ((0, extra), (0, 0)))
        B += extra
    tp = jnp.pad(t, ((0, 0), (W, W)), constant_values=PAD_CODE)
    gcp = jnp.pad(gc, ((0, 0), (W, 0)))
    gcp = jnp.pad(gcp, ((0, 0), (0, W)), mode="edge")
    kidx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    j0 = dlo + kidx
    g0 = jax.lax.dynamic_slice(gcp, (0, W + dlo), (B, W))
    h0 = jnp.where((j0 >= 0) & (j0 <= n_cap), g0, NEG)

    def row(hp, i):
        jrow = i + dlo + kidx
        valid = (jrow >= 1) & (jrow <= n_cap)
        start = i - 1 + W + dlo
        t_row = jax.lax.dynamic_slice(tp, (0, start), (B, W))
        gc_here = jax.lax.dynamic_slice(gcp, (0, start + 1), (B, W))
        qi = jax.lax.dynamic_slice(q, (0, i - 1), (B, 1))

        same = t_row == qi
        one_pad = (t_row == PAD_CODE) ^ (qi == PAD_CODE)
        sub = jnp.where(one_pad, NEG, jnp.where(same, match, mismatch))

        diag_c = hp + sub
        up_c = _shift_left(hp, 1, NEG) + gap
        cand = jnp.maximum(diag_c, up_c)
        cand = jnp.where(jrow == 0, i * gap, cand)
        cand = jnp.where(valid | (jrow == 0), cand, NEG)

        a = cand - gc_here
        s = 1
        while s < W:
            a = jnp.maximum(a, _shift_right(a, s, 2 * NEG))
            s *= 2
        h = a + gc_here
        h = jnp.where(valid | (jrow == 0), h, NEG)

        mv = jnp.where(h == diag_c, 0, jnp.where(h == up_c, 1, 2))
        mv = jnp.where(valid, mv, 3)
        return h, mv

    h_final, mvs = jax.lax.scan(row, h0, jnp.arange(1, m_cap + 1))
    # pack 16 rows per int32 word, matching the kernel's move planes
    mvs = mvs.transpose(1, 0, 2).reshape(B, m_cap // _PACK, _PACK, W)
    shifts = (2 * jnp.arange(_PACK, dtype=jnp.int32))[None, None, :, None]
    moves = jnp.sum(mvs << shifts, axis=2).astype(jnp.int32)
    k_end = n_cap - m_cap - dlo
    score = jax.lax.dynamic_slice(h_final, (0, k_end), (B, 1))
    return moves, score


# ---------------------------------------------------------------------- #
# on-device traceback walk: keeps the big packed-move planes on the device
# and ships only compact per-step op streams to the host (the host C++
# run-length-encodes them into op lists). Vectorized across the batch with
# one gather per step.
# ---------------------------------------------------------------------- #

OP_STREAM_SKIP = 3  # pad-consuming or finished steps


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "max_steps", "packed"))
def walk_moves_device(moves, m, n, *, m_cap, n_cap, w_band, max_steps,
                      packed=False):
    """moves (B, m_cap//16, W) int32 (device), m/n (B,) int32 real lengths.

    Returns (codes (B, max_steps) int8 emitted BACKWARD from (m, n)
    (0=match, 1=ins, 2=del, 3=skip), escaped (B,) bool band-escape flags).
    With packed=True (max_steps % 4 == 0), codes come back as
    (B, max_steps//4) uint8 with step 4p+u in bits [2u, 2u+2) of byte p.
    The walk starts at each item's REAL corner (m, n) — always in-band
    since |n-m| is bounded by the caller's tier margin — so no cycles are
    spent on the pad tail, and the loop exits as soon as every item
    reaches the origin. Walks that fail to get there within max_steps are
    flagged escaped (host fallback), so a short max_steps is safe."""
    B = moves.shape[0]
    dlo = band_dlo(m_cap, n_cap, w_band)
    mflat = moves.reshape(B, -1)
    m = m.astype(jnp.int32)
    n = n.astype(jnp.int32)

    def step(carry, _):
        i, j, escaped = carry
        k = j - i - dlo
        at_origin = (i == 0) & (j == 0)
        row = jnp.maximum(i - 1, 0)
        widx = (row // 16) * w_band + jnp.clip(k, 0, w_band - 1)
        word = jnp.take_along_axis(mflat, widx[:, None], axis=1)[:, 0]
        mv = (word >> (2 * (row % 16))) & 3
        mv = jnp.where(i == 0, 2, mv)            # row 0: all deletions
        mv = jnp.where((j == 0) & (i > 0), 1, mv)  # column 0: all insertions
        inband = (k >= 0) & (k < w_band)
        esc = escaped | (~at_origin & (i > 0) & (j > 0) &
                         (~inband | (mv == 3)))
        mv = jnp.where(esc | at_origin, OP_STREAM_SKIP, mv)
        di = jnp.where((mv == 0) | (mv == 1), 1, 0)
        dj = jnp.where((mv == 0) | (mv == 2), 1, 0)
        real = jnp.where(mv == 0, (i <= m) & (j <= n),
                         jnp.where(mv == 1, i <= m, j <= n))
        out = jnp.where((mv == OP_STREAM_SKIP) | ~real, OP_STREAM_SKIP,
                        mv).astype(jnp.int8)
        return (i - di, j - dj, esc), out

    # early-exit while loop: stop as soon as every item is at the origin
    # (or escaped) — typical paths use ~max(m, n) of the max_steps budget
    # and pad items (m = n = 0) finish immediately
    buf0 = jnp.full((max_steps, B), OP_STREAM_SKIP, jnp.int8)

    def cond(carry):
        s, i, j, escaped, _ = carry
        return (s < max_steps) & jnp.any(((i != 0) | (j != 0)) & ~escaped)

    def body(carry):
        s, i, j, escaped, buf = carry
        (i2, j2, esc2), out = step((i, j, escaped), None)
        buf = jax.lax.dynamic_update_slice(buf, out[None, :], (s, 0))
        return (s + 1, i2, j2, esc2, buf)

    init = (jnp.int32(0), m, n, jnp.zeros((B,), bool), buf0)
    _, fi, fj, escaped, outs = jax.lax.while_loop(cond, body, init)
    escaped = escaped | (fi != 0) | (fj != 0)  # truncated walk -> fallback
    if not packed:
        return outs.T, escaped
    assert max_steps % 4 == 0
    quads = outs.astype(jnp.uint8).reshape(max_steps // 4, 4, B)
    shifts = (2 * jnp.arange(4, dtype=jnp.uint8))[None, :, None]
    return jnp.sum(quads << shifts, axis=1, dtype=jnp.uint8).T, escaped


# ---------------------------------------------------------------------- #
# row-synchronous traceback walk ("rows" walk): the per-step-gather walks
# above pay one full-array gather per while_loop iteration; this walk
# instead advances EVERY item one query row per iteration in lockstep
# (all items pass rows m_cap..1 exactly once — each backward step consumes
# exactly one query row after its in-row deletion run), so the move data
# each iteration needs is ONE whole (W, B) plane, streamed through VMEM,
# and the per-item values come from one-hot sublane reductions — no
# gathers anywhere. Emission is one record byte per query row:
#   bits 0-1: 0 = inactive row, 1 = diagonal step, 2 = up (insertion) step
#   bits 2-7: number of deletion (LEFT) steps taken in this row before the
#             transition (0..63; larger runs are flagged escaped)
# plus a final-deletions byte (row 0) and the escape flag. The host
# decoder (native rt_opstream_rows_to_ops_batch) reconstructs the same
# forward op lists as the other walks.
# ---------------------------------------------------------------------- #

REC_DIAG = 1
REC_UP = 2


def rows_payload_width(m_cap: int) -> int:
    """Payload bytes per item for the rows walk: one record per query row
    + the final-deletions byte + the escape flag."""
    return m_cap + 2


def _walk_rows_row(mvplane, kvec, esc, active, i, dlo, w_band, kcol):
    """One backward row step on a (W, BT) move-bit plane. kvec/esc/active
    are (1, BT) int32; i is the (traced) query row. Returns (rec byte row
    (1, BT) int32, new kvec, new esc)."""
    W = w_band
    # j == 0 lane is forced UP (original walk: src walk_moves_device)
    k0 = -(i + dlo)
    mvp = jnp.where(kcol == k0, 1, mvplane)
    # deletion-run exit: nl[k] = max{k' <= k : mvp[k'] != LEFT}
    base = jnp.where(mvp != 2, kcol, -1)
    s = 1
    while s < W:
        r = pltpu.roll(base, s, 0)
        base = jnp.maximum(base, jnp.where(kcol < s, -1, r))
        s *= 2
    onehot = (kcol == kvec)
    k_exit = jnp.sum(jnp.where(onehot, base, 0), axis=0, keepdims=True)
    any_hit = jnp.any(onehot, axis=0, keepdims=True)  # kvec in [0, W)
    mv_exit = jnp.sum(jnp.where(kcol == k_exit, mvp, 0), axis=0,
                      keepdims=True)
    nleft = kvec - k_exit
    bad = (~any_hit) | (k_exit < 0) | (mv_exit >= 3) | (nleft > 63)
    esc = esc | (active & bad.astype(jnp.int32))
    act2 = active * (1 - esc)
    op = jnp.where(mv_exit == 1, REC_UP, REC_DIAG)
    rec = jnp.where(act2 != 0, op | (nleft << 2), 0)
    kvec = jnp.where(act2 != 0, k_exit + (mv_exit == 1), kvec)
    return rec, kvec, esc


_SLOT_G = 8  # move-word slots (16 rows each) per walk grid step


def _walk_rows_kernel(m_ref, n_ref, moves_ref, rec_ref, fin_ref, kscr,
                      escscr, *, m_cap, n_cap, w_band):
    """Grid (B//B_LANE, slots//_SLOT_G); groups of _SLOT_G slot planes
    stream top-down (index map reverses s) — grouping amortizes the
    per-grid-step fixed cost 8x vs one slot per step. rec_ref is the
    whole (m_cap//4, B_LANE) int32 word block (resident across s — its
    block index only changes with b); fin_ref holds [final deletions,
    escape] in rows 0-1."""
    W = w_band
    BT = m_ref.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    n_groups = m_cap // (_PACK * _SLOT_G)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0)
    s = pl.program_id(1)
    group = n_groups - 1 - s

    @pl.when(s == 0)
    def _():
        kscr[...] = n_ref[...] - m_ref[...] - dlo
        escscr[...] = jnp.zeros_like(escscr)

    kvec = kscr[...]
    esc = escscr[...]
    m = m_ref[...]
    for gi in range(_SLOT_G - 1, -1, -1):
        slot = group * _SLOT_G + gi
        mvword = moves_ref[gi]  # (W, BT) packed move words for this slot
        words = []
        for u in range(_PACK - 1, -1, -1):
            i = slot * _PACK + u + 1
            mvplane = (mvword >> (2 * u)) & 3
            active = (i <= m).astype(jnp.int32) * (1 - esc)
            rec, kvec, esc = _walk_rows_row(mvplane, kvec, esc, active, i,
                                            dlo, W, kcol)
            words.append(rec)
        # words[x] is row u = 15-x; byte order within an int32 must follow
        # ascending row (little-endian view on host): word w holds rows
        # 4w..4w+3 in bytes 0..3
        packs = []
        for wi in range(_PACK // 4 - 1, -1, -1):  # assemble words 3,2,1,0
            b0 = words[15 - (4 * wi + 0)]
            b1 = words[15 - (4 * wi + 1)]
            b2 = words[15 - (4 * wi + 2)]
            b3 = words[15 - (4 * wi + 3)]
            packs.append(b0 | (b1 << 8) | (b2 << 16) | (b3 << 24))
        packs.reverse()  # now ascending word index within the slot
        block = jnp.concatenate(packs, axis=0)  # (4, BT)
        rec_ref[pl.ds(slot * (_PACK // 4), _PACK // 4), :] = block

    kscr[...] = kvec
    escscr[...] = esc

    @pl.when(s == n_groups - 1)
    def _():
        jfin = dlo + kvec
        esc2 = esc | ((jfin < 0) | (jfin > 255)).astype(jnp.int32)
        fin_ref[pl.ds(0, 1), :] = jnp.clip(jfin, 0, 255)
        fin_ref[pl.ds(1, 1), :] = esc2


def walk_rows_t(moves, m, n, *, m_cap, n_cap, w_band, interpret=False):
    """moves (slots, W, B) int32 transposed move planes (nw_band_batch_t8
    layout). Returns (payload (B, m_cap + 2) uint8, escaped (B,) bool):
    payload[:, r] is the record for query row r+1, payload[:, m_cap] the
    final-deletions count, payload[:, m_cap+1] the escape flag."""
    B = moves.shape[2]
    assert B % B_LANE == 0 and m_cap % (_PACK * _SLOT_G) == 0
    n_groups = m_cap // (_PACK * _SLOT_G)
    W = w_band
    m2 = m.reshape(1, B).astype(jnp.int32)
    n2 = n.reshape(1, B).astype(jnp.int32)
    kernel = functools.partial(_walk_rows_kernel, m_cap=m_cap, n_cap=n_cap,
                               w_band=W)
    rec32, fin = pl.pallas_call(
        kernel,
        grid=(B // B_LANE, n_groups),
        out_shape=(
            jax.ShapeDtypeStruct((m_cap // 4, B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, B_LANE), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_LANE), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLOT_G, W, B_LANE),
                         lambda b, s, n_groups=n_groups: (n_groups - 1 - s,
                                                          0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m_cap // 4, B_LANE), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B_LANE), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, B_LANE), jnp.int32),
            pltpu.VMEM((1, B_LANE), jnp.int32),
        ],
        interpret=interpret,
    )(m2, n2, moves)
    rec8 = jax.lax.bitcast_convert_type(rec32.T, jnp.uint8).reshape(B, m_cap)
    fin8 = jnp.clip(fin[:2].T, 0, 255).astype(jnp.uint8)
    payload = jnp.concatenate([rec8, fin8], axis=1)
    return payload, fin[1].astype(bool)


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band"))
def walk_rows_ref(moves, m, n, *, m_cap, n_cap, w_band):
    """Pure-jnp twin of walk_rows_t (identical payload bytes): lax.scan
    over query rows on whole (W, B) planes. Test-only oracle: production
    never routes here — CPU mesh shards run with interpret=True, where
    walk_fmt returns "packed2" and the rows walk is never selected."""
    B = moves.shape[2]
    W = w_band
    dlo = band_dlo(m_cap, n_cap, W)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    m2 = m.reshape(1, B).astype(jnp.int32)
    n2 = n.reshape(1, B).astype(jnp.int32)

    def row(carry, i):
        kvec, esc = carry
        slot = (i - 1) // _PACK
        u = (i - 1) % _PACK
        mvword = jax.lax.dynamic_slice(moves, (slot, 0, 0), (1, W, B))[0]
        mvplane = (mvword >> (2 * u)) & 3
        active = (i <= m2).astype(jnp.int32) * (1 - esc)
        rec, kvec, esc = _walk_rows_row(mvplane, kvec, esc, active, i, dlo,
                                        W, kcol)
        return (kvec, esc), rec[0]

    init = (n2 - m2 - dlo, jnp.zeros((1, B), jnp.int32))
    (kvec, esc), recs = jax.lax.scan(row, init,
                                     jnp.arange(m_cap, 0, -1,
                                                dtype=jnp.int32))
    recs = recs[::-1]  # scan ran rows m_cap..1; payload wants ascending
    jfin = dlo + kvec
    esc = esc | ((jfin < 0) | (jfin > 255)).astype(jnp.int32)
    payload = jnp.concatenate(
        [recs.T.astype(jnp.uint8),
         jnp.clip(jfin, 0, 255).T.astype(jnp.uint8),
         esc.T.astype(jnp.uint8)], axis=1)
    return payload, esc[0].astype(bool)


def align_walk_packed_core_rows_t(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band,
                                  match, mismatch, gap, big=False,
                                  interpret=False):
    """align_walk_packed_core with the row-synchronous walk: payload is
    (B, m_cap + 2) uint8 (rows_payload_width) — per-row records + the
    final-deletions byte + the escape flag. The sweep is the t8 (or, with
    big=True, the pre-windowed big-tier) kernel; the walk never gathers.
    interpret=True runs both pallas kernels in interpret mode (the
    end-to-end sweep->rows-walk parity test rides it on CPU)."""
    W = w_band
    qT, tpT, dcpT = _prep_panels_t8(q4, t4, dcb, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, gap=gap)
    sweep = nw_band_batch_t8big if big else nw_band_batch_t8
    moves, score = sweep(qT, tpT, dcpT, m_cap=m_cap, n_cap=n_cap, w_band=W,
                         match=match, mismatch=mismatch, gap=gap,
                         interpret=interpret)
    payload, _ = walk_rows_t(moves, m, n, m_cap=m_cap, n_cap=n_cap,
                             w_band=W, interpret=interpret)
    return payload, score.T


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "match", "mismatch", "gap"))
def align_walk_rows_batch(q4, t4, dcb, m, n, *, m_cap, n_cap, w_band, match,
                          mismatch, gap):
    return align_walk_packed_core_rows_t(
        q4, t4, dcb, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
        match=match, mismatch=mismatch, gap=gap,
        big=not t_kernel_fits(m_cap, n_cap, w_band))


def align_walk_gather_core_rows_t(qblob4, tblob4, dcbits, meta, *, m_cap,
                                  n_cap, w_band, match, mismatch, gap):
    """Device-resident gather variant of the rows-walk core (see
    align_walk_gather_core_t for the panel build)."""
    qs, m, ts, n = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    W = w_band
    qT = _gather_nib_cols(qblob4, qs, m, m_cap, 0, PAD_CODE).astype(jnp.int32)
    # the W band-pad rows on both sides are pure PAD fill (lengths are
    # <= n_cap by the stage contract) — gather only the n_cap real rows
    tpT = jnp.pad(_gather_nib_cols(tblob4, ts, n, n_cap, 0, PAD_CODE),
                  ((W, W), (0, 0)),
                  constant_values=PAD_CODE).astype(jnp.int32)
    dcT = _gather_bit_cols(dcbits, ts, n, n_cap, 1) * gap
    dcpT = jnp.pad(dcT, ((W, W), (0, 0)))
    moves, score = nw_band_batch_t8(qT, tpT, dcpT, m_cap=m_cap, n_cap=n_cap,
                                    w_band=W, match=match, mismatch=mismatch,
                                    gap=gap)
    payload, _ = walk_rows_t(moves, m, n, m_cap=m_cap, n_cap=n_cap,
                             w_band=W)
    return payload, score.T


def walk_fmt(m_cap: int, n_cap: int, w_band: int, interpret: bool,
             bp: int) -> str:
    """Central walk/payload format policy for a padded dispatch:
      "rows"    — row-synchronous walk (one record byte per query row; no
                  per-step gathers). The default on real chips wherever a
                  transposed sweep runs: its device time is bounded by
                  m_cap * O(scan W) vector work instead of path-length
                  gather iterations.
      "rle"     — per-step RLE event walk (gather per iteration, compact
                  payload). Used for the big overlap tiers where the rows
                  walk's every-row sweep would dominate, or when
                  RACON_TPU_WALK=rle.
      "packed2" — 2-bit step stream (lane-major kernel / interpret mode).
    """
    import os

    if interpret or bp % B_LANE != 0:
        return "packed2"
    small = t_kernel_fits(m_cap, n_cap, w_band)
    big = t_big_fits(m_cap, n_cap, w_band)
    if not (small or big):
        return "packed2"
    forced = os.environ.get("RACON_TPU_WALK", "auto")
    if forced in ("rows", "rle"):
        return forced
    # auto: rle. The rows walk wins on pure device time (3.4 vs 4.6 ms
    # steady at 640/128, BENCH_LEDGER kernel split) but its payload is 4x
    # the D2H bytes and ~3x the host decode work — on this 2-core tunneled
    # host the stage-level A/B (benchmarks/profile_walk_ab.py: 786 vs
    # 330 w/s) says rle, decisively. On a many-core PCIe-attached TPU VM
    # the tradeoff reverses; RACON_TPU_WALK=rows selects it there.
    return "rle"
