"""Myers bit-parallel banded edit-distance sweep (the align-stage kernel).

The scored banded-NW sweep (nw_kernel._nw_band_kernel_t8*) spends ~45-60
VPU ops per DP cell, ~80-95% of which is inherent to its max-plus
formulation (docs/PERF.md "Ops-per-cell ceilings"). For the overlap
ALIGNMENT stage the scores are fixed at (0, -1, -1) with uniform deletion
costs — pure edit distance — where Myers' bit-parallel recurrence
[Myers 1999; Hyyro 2003 banded variant] computes 32 DP cells per int32
word in ~20 word ops: ~1-2 ops/cell, an order of magnitude past the
scored sweep's op-count ceiling. This plays edlib's role in the reference
(vendor/meson.build:13-19, src/overlap.cpp:205-224) on the TPU itself.

Layout (transposed, batch on lanes, like nw_kernel's t8 family):
  - band of W target positions per query row, lane k <-> j = i + dlo + k,
    dlo = band_dlo(m_cap, n_cap, W) <= 0; W bits pack into nw = W/32
    int32 words along the sublane axis, batch B on the lane axis.
  - state between rows: PV/MV horizontal-delta bit vectors
    (D(i, j_k) - D(i, j_k - 1) == +1 / -1) in the CURRENT row's band
    coordinates; the band shift is a 1-bit funnel shift toward lower
    bits per row, top bit filled with PV=1/MV=0 (the soft band edge: a
    monotone +1 ramp that hard-edge DP values provably never prefer).
  - the j = 0 boundary column rides bit kz = -(i + dlo): its vertical
    delta is forced to +1 (D(i,0) = i) and all bits below kz are
    sanitized to zero so the add's carry chain enters the valid region
    with carry-in 0 — bit-exact hard-boundary semantics.
  - per row the sweep stores two W-bit planes: DIAG = Eq | ~D0
    (move 0 valid: D(i,j) == D(i-1,j-1) + [q_i != t_j]) and UP = HP
    (move 1 valid: D(i,j) == D(i-1,j) + 1). With the DIAG > UP > LEFT
    priority these reproduce the scored kernel's move choices exactly,
    so decoded op lists (and breaking points) are bit-identical to the
    packed2/rle/rows paths for (0,-1,-1) with uniform deletion costs.

The walk (myers_walk_*) consumes the planes word-wise — nearest
non-LEFT bit at-or-below the current lane via masked highest-set-bit,
O(nw) word ops per row instead of the rows walk's O(W) lane scan — and
emits the SAME payload bytes as nw_kernel.walk_rows_t (one record per
query row: REC_DIAG/REC_UP | deletions<<2, the final-deletions byte,
the escape flag), so the native decoder
(bindings.opstream_rows_to_ops_batch) is reused unchanged.

Scores are not produced (the align stage discards them); the score
output is zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nw_kernel import (band_dlo, rows_payload_width, B_LANE, PAD_CODE,
                        REC_DIAG, REC_UP)

NW_CODES = 6  # ACGTN + PAD


def guard_bits(w_band: int) -> int:
    """Zero-bit guard on each side of the Peq bitmask so every row's
    W-bit window load is in range (multiple of 32)."""
    return w_band // 2 + 32


def peq_words(n_cap: int, w_band: int) -> int:
    return (n_cap + 2 * guard_bits(w_band)) // 32


def build_peq_T(tT_codes, n_cap: int, w_band: int):
    """(n_cap, B) int32 target codes -> (NW_CODES, peq_words, B) int32
    bit planes: plane c bit p (word p>>5, bit p&31) = [t[p] == c], with
    guard_bits(w_band) zero bits below and above. XLA-side prep."""
    B = tT_codes.shape[1]
    g = guard_bits(w_band)
    nwp = peq_words(n_cap, w_band)
    codes = jnp.arange(NW_CODES, dtype=jnp.int32)
    bits = (tT_codes[None, :, :] == codes[:, None, None])  # (6, n_cap, B)
    weights = (jnp.int32(1) << (jnp.arange(32, dtype=jnp.int32)))
    packed = jnp.sum(
        bits.reshape(NW_CODES, n_cap // 32, 32, B)
        * weights[None, None, :, None], axis=2, dtype=jnp.int32)
    pad = jnp.zeros((NW_CODES, g // 32, B), jnp.int32)
    return jnp.concatenate([pad, packed, pad], axis=1).reshape(
        NW_CODES * nwp, B)


def peq_win_words(w_band: int, rg: int) -> int:
    """Words of Peq one sweep grid step (rg query rows) actually reads:
    the nw + 1 funnel words of the last row start at most
    ceil((rg - 1) / 32) words above the first row's base word."""
    return w_band // 32 + (rg + 30) // 32 + 1


def build_peq_win_T(tT_codes, m_cap: int, n_cap: int, w_band: int, rg: int):
    """Pre-windowed per-grid-step Peq panels (the t8big pattern): step g
    covers query rows i in [g*rg + 1, (g+1)*rg], whose funnel windows
    read Peq words [base_g, base_g + wpg) with
    base_g = (g*rg + dlo + guard) >> 5. Keeping only those words resident
    per step caps the sweep's Peq VMEM at ~NW_CODES*wpg words per lane
    group (~60-400 KB) instead of the full n_cap-bit mask (~4 MB at the
    40960/1024 tier, which blew the Mosaic scoped-vmem budget and kept
    the 40960-cap align tiers on the ~11x-slower scored sweep).
    Returns (steps, NW_CODES * wpg, B) int32; geometry is exact:
    base_{last} + wpg == peq_words for every supported tier."""
    B = tT_codes.shape[1]
    nwp = peq_words(n_cap, w_band)
    peq = build_peq_T(tT_codes, n_cap, w_band).reshape(NW_CODES, nwp, B)
    C = band_dlo(m_cap, n_cap, w_band) + guard_bits(w_band)
    wpg = peq_win_words(w_band, rg)
    steps = m_cap // rg
    base = np.array([((g * rg + C) >> 5) for g in range(steps)], np.int32)
    assert base[0] >= 0 and int(base[-1]) + wpg <= nwp
    idx = base[:, None] + np.arange(wpg, dtype=np.int32)[None, :]
    win = jnp.take(peq, jnp.asarray(idx), axis=1)  # (6, steps, wpg, B)
    return jnp.transpose(win, (1, 0, 2, 3)).reshape(
        steps, NW_CODES * wpg, B)


# ------------------------- word-vector helpers ------------------------- #
# arrays are (nw, B) int32; bit index b = 32*w + (b & 31), low-to-high.


def _lsr(x, s):
    """Logical shift right on int32 (s: python int, traced scalar, or
    matching array — broadcast explicitly for Mosaic)."""
    s = jnp.broadcast_to(jnp.asarray(s, x.dtype), x.shape)
    return jax.lax.shift_right_logical(x, s)


def _mask_ge(pos, nw: int, B: int):
    """Bits >= pos set (pos may be a traced scalar; pos <= 0 -> all)."""
    w32 = 32 * jax.lax.broadcasted_iota(jnp.int32, (nw, B), 0)
    sh = jnp.clip(pos - w32, 0, 32)
    full = jnp.int32(-1)
    return jnp.where(sh >= 32, 0, full << jnp.minimum(sh, 31))


def _mask_le(pos, nw: int, B: int):
    """Bits <= pos set; pos is (1, B) per-item. pos < 0 -> none,
    pos >= 32*nw - 1 -> all."""
    w32 = 32 * jax.lax.broadcasted_iota(jnp.int32, (nw, B), 0)
    sh = jnp.clip(pos - w32 + 1, 0, 32)  # number of low bits set per word
    ones = jnp.int32(-1)
    partial = ~(ones << jnp.clip(sh, 0, 31))  # sh in [0,31]: low sh bits
    return jnp.where(sh >= 32, ones, partial)


def _onehot(pos, nw: int, B: int):
    """Single bit at pos (scalar or (1,B)); out-of-range -> zeros."""
    w32 = 32 * jax.lax.broadcasted_iota(jnp.int32, (nw, B), 0)
    rel = pos - w32
    inw = (rel >= 0) & (rel < 32)
    return jnp.where(inw, jnp.int32(1) << (rel & 31), 0)


def _carry_out(x, y, s):
    """Bit 31 carry of the per-word add s = x + y, as 0/1 int32."""
    return _lsr((x & y) | ((x | y) & ~s), 31)


def _add_carry(x, y, roll_down):
    """Multi-word add x + y with cross-word carry propagation.
    roll_down(a) must return a shifted one word toward HIGHER word index
    (word w reads word w-1; word 0 reads 0)."""
    s0 = x + y
    g = _carry_out(x, y, s0)
    p = (s0 == -1)
    # ripple the carry chain: cin[w] = g[w-1] | (p[w-1] & cin[w-1]).
    # nw is small (4..128); the prefix runs in log2(nw) doubling steps on
    # (nw, B) arrays: after step k, acc[w] = carry generated within the
    # last 2^k words and propagated across them.
    gacc = roll_down(g)
    pacc = roll_down(p.astype(jnp.int32))
    nw = x.shape[0]
    step = 1
    while step < nw:
        gacc = gacc | (pacc & roll_down_n(gacc, step, roll_down))
        pacc = pacc & roll_down_n(pacc, step, roll_down)
        step *= 2
    cin = gacc
    return s0 + cin


def roll_down_n(a, n, roll_down):
    for _ in range(n):
        a = roll_down(a)
    return a


def _shl1(x, roll_down):
    """Whole-register shift toward higher bits by 1 (carry across words);
    bit 0 filled with 0."""
    prev = roll_down(x)
    return (x << 1) | (_lsr(prev, 31) & 1)


def _shr1(x, roll_up, fill_bit):
    """Whole-register shift toward lower bits by 1; top bit (bit
    32*nw - 1) filled with fill_bit (0/1)."""
    nxt = roll_up(x)
    nw = x.shape[0]
    widx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    top_fill = jnp.where(widx == nw - 1, jnp.int32(fill_bit) << 31, 0)
    hi = jnp.where(widx == nw - 1, top_fill, nxt << 31)
    return (_lsr(x, 1) & 0x7FFFFFFF) | hi


def _hibit(x):
    """Highest set bit index of each int32 (0..31); x == 0 -> 0.
    Branch-free binary search on the logical value."""
    r = jnp.zeros_like(x)
    v = x
    for sh, thr in ((16, jnp.int32(0xFFFF)), (8, jnp.int32(0xFF)),
                    (4, jnp.int32(0xF)), (2, jnp.int32(0x3)),
                    (1, jnp.int32(0x1))):
        big = _lsr(v, sh) != 0
        r = r + jnp.where(big, sh, 0)
        v = jnp.where(big, _lsr(v, sh), v)
    return r


def _myers_row_step(eq, PV, MV, kz, roll_down):
    """One Myers row on sanitized word vectors (nw, B). Returns
    (diag_plane, up_plane, PVn, MVn) in THIS row's band coordinates
    (callers band-shift + sanitize for the next row)."""
    nw, B = eq.shape
    X = eq | MV
    XP = X & PV
    S = _add_carry(XP, PV, roll_down)
    D0 = (S ^ PV) | X
    HN = PV & D0
    HP = MV | ~(PV | D0)
    oh = _onehot(kz, nw, B)  # j = 0 boundary column: vertical delta +1
    HP = HP | oh
    HN = HN & ~oh
    X2 = _shl1(HP, roll_down)
    PVn = _shl1(HN, roll_down) | ~(D0 | X2)
    MVn = D0 & X2
    return eq | ~D0, HP, PVn, MVn


def _sanitize(PV, MV, eq, kz, nw: int, B: int):
    """Zero every bit at or below the j = 0 boundary lane so the add's
    carry chain enters the valid region with carry-in 0."""
    keep = _mask_ge(kz + 1, nw, B)
    return PV & keep, MV & keep, eq & keep


# --------------------------- jnp reference ---------------------------- #


def _roll_down_jnp(a):
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _roll_up_jnp(a):
    return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)


def _funnel_window(peq, pos0, nw: int):
    """Extract nw words = bits [pos0, pos0 + 32*nw) from the (nwp, B)
    plane `peq` (pos0 traced scalar, guaranteed >= 0 and in range)."""
    w0 = pos0 >> 5
    r = pos0 & 31
    lo = jax.lax.dynamic_slice_in_dim(peq, w0, nw, axis=0)
    hi = jax.lax.dynamic_slice_in_dim(peq, w0 + 1, nw, axis=0)
    return jnp.where(r == 0, lo, _lsr(lo, r) | (hi << ((32 - r) & 31)))


def myers_sweep_ref(qT_codes, peqT, *, m_cap, n_cap, w_band):
    """qT_codes (m_cap, B) int32, peqT (NW_CODES * peq_words, B) int32.
    Returns planes (m_cap, 2, nw, B) int32: [row-1][0] = DIAG words,
    [row-1][1] = UP words, in row coordinates."""
    W = w_band
    nw = W // 32
    B = qT_codes.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    g = guard_bits(W)
    nwp = peq_words(n_cap, W)
    peq = peqT.reshape(NW_CODES, nwp, B)

    pv0 = _mask_ge(-(1 + dlo) + 1, nw, B)
    mv0 = jnp.zeros((nw, B), jnp.int32)

    def row(carry, i):
        PV, MV = carry
        kz = -(i + dlo)
        # Eq: W-bit windows of all 6 planes at p = i + dlo - 1 + guard,
        # selected by this row's per-item query code
        pos0 = i + dlo - 1 + g
        qi = qT_codes[i - 1][None, :]  # (1, B)
        eq = jnp.zeros((nw, B), jnp.int32)
        for c in range(NW_CODES):
            win = _funnel_window(peq[c], pos0, nw)
            eq = eq | jnp.where(qi == c, win, 0)
        PV, MV, eq = _sanitize(PV, MV, eq, kz, nw, B)
        diag, HP, PVn, MVn = _myers_row_step(eq, PV, MV, kz, _roll_down_jnp)
        planes = jnp.stack([diag, HP], axis=0)  # (2, nw, B)
        PV2 = _shr1(PVn, _roll_up_jnp, 1)
        MV2 = _shr1(MVn, _roll_up_jnp, 0)
        return (PV2, MV2), planes

    _, planes = jax.lax.scan(row, (pv0, mv0),
                             jnp.arange(1, m_cap + 1, dtype=jnp.int32))
    return planes


def myers_walk_ref(planes, m, n, *, m_cap, n_cap, w_band):
    """planes (m_cap, 2, nw, B) from myers_sweep_ref; m/n (B,) int32.
    Returns (payload (B, m_cap + 2) uint8, escaped (B,) bool) with the
    exact walk_rows_t payload format."""
    W = w_band
    nw = W // 32
    B = planes.shape[3]
    dlo = band_dlo(m_cap, n_cap, W)
    m2 = m.reshape(1, B).astype(jnp.int32)
    n2 = n.reshape(1, B).astype(jnp.int32)

    def row(carry, i):
        kvec, esc = carry  # (1, B) int32
        kz = -(i + dlo)
        diag = planes[i - 1, 0]
        up = planes[i - 1, 1]
        oh = _onehot(kz, nw, B)
        diag = diag & ~oh
        up = up | oh
        rec, kvec, esc = _walk_row_words(diag, up, kvec, esc,
                                         (i <= m2).astype(jnp.int32), nw, B)
        return (kvec, esc), rec[0]

    init = (n2 - m2 - dlo, jnp.zeros((1, B), jnp.int32))
    (kvec, esc), recs = jax.lax.scan(row, init,
                                     jnp.arange(m_cap, 0, -1,
                                                dtype=jnp.int32))
    recs = recs[::-1]
    jfin = dlo + kvec
    esc = esc | ((jfin < 0) | (jfin > 255)).astype(jnp.int32)
    payload = jnp.concatenate(
        [recs.T.astype(jnp.uint8),
         jnp.clip(jfin, 0, 255).T.astype(jnp.uint8),
         esc.T.astype(jnp.uint8)], axis=1)
    return payload, esc[0].astype(bool)


def _walk_row_words(diag, up, kvec, esc, active, nw: int, B: int):
    """One backward row step on word planes (nw, B). kvec/esc/active are
    (1, B) int32. Mirrors nw_kernel._walk_rows_row's semantics exactly:
    exit at the highest non-LEFT lane <= kvec, DIAG priority over UP,
    escape on no exit / out-of-band kvec / >63 deletions."""
    notleft = diag | up
    inband = (kvec >= 0) & (kvec < 32 * nw)
    masked = notleft & _mask_le(kvec, nw, B)
    nzw = masked != 0
    hib = _hibit(masked)
    w32 = 32 * jax.lax.broadcasted_iota(jnp.int32, (nw, B), 0)
    cand = jnp.where(nzw, w32 + hib, -1)
    k_exit = jnp.max(cand, axis=0, keepdims=True)  # (1, B)
    ohx = _onehot(k_exit, nw, B)
    # single-bit selects: sum over words isolates the one hit word (the
    # bit may be bit 31, so nonzero-test rather than max)
    diag_hit = jnp.sum(diag & ohx, axis=0, keepdims=True) != 0
    up_hit = jnp.sum(up & ohx, axis=0, keepdims=True) != 0
    nleft = kvec - k_exit
    bad = (~inband) | (k_exit < 0) | (nleft > 63)
    esc = esc | (active * bad.astype(jnp.int32))
    act2 = active * (1 - esc)
    op = jnp.where(diag_hit, REC_DIAG, REC_UP)
    rec = jnp.where(act2 != 0, op | (nleft << 2), 0)
    kvec = jnp.where(act2 != 0,
                     k_exit + (up_hit & ~diag_hit).astype(jnp.int32), kvec)
    return rec, kvec, esc


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band"))
def align_walk_myers_ref(qT_codes, tT_codes, m, n, *, m_cap, n_cap, w_band):
    """jnp reference of the fused Myers align+walk: transposed code
    panels in, walk_rows_t-format payload out. Score output is zeros
    (the align stage discards scores; reference src/overlap.cpp:205-224
    only consumes the CIGAR)."""
    peq = build_peq_T(tT_codes, n_cap, w_band)
    planes = myers_sweep_ref(qT_codes, peq, m_cap=m_cap, n_cap=n_cap,
                             w_band=w_band)
    payload, esc = myers_walk_ref(planes, m, n, m_cap=m_cap, n_cap=n_cap,
                                  w_band=w_band)
    score = jnp.zeros((qT_codes.shape[1], 1), jnp.int32)
    return payload, score


# ---------------------------- pallas kernels --------------------------- #


def sweep_rows_g(m_cap: int, w_band: int) -> int:
    """Query rows per sweep grid step: sized so the per-group plane
    block (rows_g * W/4 bytes per lane-item... rows_g * 2nw words) stays
    ~2 MB, and divides m_cap."""
    r = max(8, min(128, (2 << 20) // (w_band * 32)))
    while m_cap % r:
        r //= 2
    return max(r, 1)


def myers_fits(m_cap: int, n_cap: int, w_band: int) -> bool:
    """Eligibility of the Myers align path: equal caps (the align-stage
    contract), the t8 dlo regime, W a multiple of 32, and a VMEM model
    under the Mosaic scoped budget (double-buffered blocks + scratch +
    live temporaries). The sweep's Peq panels are pre-windowed per grid
    step (build_peq_win_T) so only ~NW_CODES * peq_win_words words ride
    VMEM — this is what lets the 40960-cap long-overlap tiers (which
    the full-mask layout pushed past the budget) run bit-parallel too."""
    import os

    if os.environ.get("RACON_TPU_MYERS", "1") == "0":
        return False
    if m_cap != n_cap or w_band % 32 or m_cap % 32:
        return False
    if band_dlo(m_cap, n_cap, w_band) > 0:
        return False
    nw = w_band // 32
    per_lane = 4 * B_LANE
    rg = sweep_rows_g(m_cap, w_band)
    if m_cap % rg:
        return False
    q = rg * per_lane
    peq = NW_CODES * peq_win_words(w_band, rg) * per_lane
    planes_blk = rg * 2 * nw * per_lane
    temps = 16 * nw * per_lane
    sweep = 2 * (q + peq + planes_blk) + 2 * nw * per_lane + temps
    rec = (m_cap // 4) * per_lane
    walk = 2 * planes_blk + rec + temps + 8 * per_lane
    return max(sweep, walk) <= (12 << 20)


def _roll_down_tpu(a):
    widx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    r = pltpu.roll(a, 1, 0)
    return jnp.where(widx == 0, 0, r)


def _roll_up_tpu(a):
    nw = a.shape[0]
    widx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    r = pltpu.roll(a, nw - 1, 0)
    return jnp.where(widx == nw - 1, 0, r)


def _myers_sweep_kernel(q_ref, peq_ref, planes_ref, pvscr, mvscr, *,
                        m_cap, n_cap, w_band, rows_g):
    """q (rows_g, BT) int32 codes of this group's rows; peq
    (1, NW_CODES * peq_win_words, BT) int32 pre-windowed Peq panel of
    THIS grid step (build_peq_win_T; word u of plane c is full-mask word
    base_g + u, base_g = (g*rows_g + dlo + guard) >> 5); planes
    (1, rows_g * 2 * nw, BT) int32 output block: per local row r, words
    [r*2nw, r*2nw+nw) = DIAG, next nw = UP. pv/mv scratch carry the
    band-shifted state across groups."""
    W = w_band
    nw = W // 32
    BT = q_ref.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    gd = guard_bits(W)
    wpg = peq_win_words(W, rows_g)
    g = pl.program_id(1)
    base_g = (g * rows_g + dlo + gd) >> 5

    @pl.when(g == 0)
    def _():
        pvscr[...] = _mask_ge(-(1 + dlo) + 1, nw, BT)
        mvscr[...] = jnp.zeros((nw, BT), jnp.int32)

    def body(r, carry):
        PV, MV = carry
        i = g * rows_g + r + 1
        kz = -(i + dlo)
        pos0 = i + dlo - 1 + gd
        w0 = (pos0 >> 5) - base_g
        rsh = pos0 & 31
        qi = q_ref[pl.ds(r, 1), :]
        eq = jnp.zeros((nw, BT), jnp.int32)
        for c in range(NW_CODES):
            win = peq_ref[0, pl.ds(c * wpg + w0, nw + 1), :]
            lo = jax.lax.slice(win, (0, 0), (nw, BT))
            hi = jax.lax.slice(win, (1, 0), (nw + 1, BT))
            wv = jnp.where(rsh == 0, lo,
                           _lsr(lo, rsh) | (hi << ((32 - rsh) & 31)))
            eq = eq | jnp.where(qi == c, wv, 0)
        PV, MV, eq = _sanitize(PV, MV, eq, kz, nw, BT)
        diag, hp, PVn, MVn = _myers_row_step(eq, PV, MV, kz, _roll_down_tpu)
        planes_ref[0, pl.ds(r * 2 * nw, nw), :] = diag
        planes_ref[0, pl.ds(r * 2 * nw + nw, nw), :] = hp
        PV2 = _shr1(PVn, _roll_up_tpu, 1)
        MV2 = _shr1(MVn, _roll_up_tpu, 0)
        return PV2, MV2

    pv, mv = jax.lax.fori_loop(0, rows_g, body, (pvscr[...], mvscr[...]))
    pvscr[...] = pv
    mvscr[...] = mv


def myers_sweep_t(qT, peq_win, *, m_cap, n_cap, w_band, interpret=False):
    """qT (m_cap, B) int32 codes, peq_win (m_cap // rows_g,
    NW_CODES * peq_win_words, B) int32 pre-windowed Peq panels
    (build_peq_win_T). Returns planes (m_cap // rows_g,
    rows_g * 2 * nw, B) int32."""
    B = qT.shape[1]
    W = w_band
    nw = W // 32
    rg = sweep_rows_g(m_cap, W)
    assert B % B_LANE == 0 and m_cap % rg == 0
    wpg = peq_win_words(W, rg)
    assert peq_win.shape[:2] == (m_cap // rg, NW_CODES * wpg)
    kernel = functools.partial(_myers_sweep_kernel, m_cap=m_cap,
                               n_cap=n_cap, w_band=W, rows_g=rg)
    return pl.pallas_call(
        kernel,
        grid=(B // B_LANE, m_cap // rg),
        out_shape=jax.ShapeDtypeStruct((m_cap // rg, rg * 2 * nw, B),
                                       jnp.int32),
        in_specs=[
            pl.BlockSpec((rg, B_LANE), lambda b, g: (g, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NW_CODES * wpg, B_LANE),
                         lambda b, g: (g, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rg * 2 * nw, B_LANE),
                               lambda b, g: (g, 0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nw, B_LANE), jnp.int32),
            pltpu.VMEM((nw, B_LANE), jnp.int32),
        ],
        interpret=interpret,
    )(qT, peq_win)


def _myers_walk_kernel(m_ref, n_ref, planes_ref, rec_ref, fin_ref, kscr,
                       escscr, *, m_cap, n_cap, w_band, rows_g):
    """Backward word-wise walk over the sweep's plane blocks. Grid
    (B//B_LANE, groups) with the group index REVERSED (top rows first);
    rec_ref is the whole (m_cap//4, BT) packed record block; fin_ref rows
    0-1 hold [final deletions, escape]."""
    W = w_band
    nw = W // 32
    BT = m_ref.shape[1]
    dlo = band_dlo(m_cap, n_cap, W)
    n_groups = m_cap // rows_g
    s = pl.program_id(1)
    g = n_groups - 1 - s

    @pl.when(s == 0)
    def _():
        kscr[...] = n_ref[...] - m_ref[...] - dlo
        escscr[...] = jnp.zeros_like(escscr)

    m = m_ref[...]

    def word_body(t, carry):
        kvec, esc = carry
        wg = rows_g // 4 - 1 - t
        word = jnp.zeros((1, BT), jnp.int32)
        for u in range(3, -1, -1):
            rl = 4 * wg + u
            i = g * rows_g + rl + 1
            kz = -(i + dlo)
            diag = planes_ref[0, pl.ds(rl * 2 * nw, nw), :]
            up = planes_ref[0, pl.ds(rl * 2 * nw + nw, nw), :]
            oh = _onehot(kz, nw, BT)
            diag = diag & ~oh
            up = up | oh
            active = (i <= m).astype(jnp.int32) * (1 - esc)
            rec, kvec, esc = _walk_row_words(diag, up, kvec, esc, active,
                                             nw, BT)
            word = word | (rec << (8 * u))
        rec_ref[pl.ds(g * (rows_g // 4) + wg, 1), :] = word
        return kvec, esc

    kvec, esc = jax.lax.fori_loop(0, rows_g // 4, word_body,
                                  (kscr[...], escscr[...]))
    kscr[...] = kvec
    escscr[...] = esc

    @pl.when(s == n_groups - 1)
    def _():
        jfin = dlo + kvec
        esc2 = esc | ((jfin < 0) | (jfin > 255)).astype(jnp.int32)
        fin_ref[pl.ds(0, 1), :] = jnp.clip(jfin, 0, 255)
        fin_ref[pl.ds(1, 1), :] = esc2


def myers_walk_t(planes, m, n, *, m_cap, n_cap, w_band, interpret=False):
    """planes from myers_sweep_t. Returns (payload (B, m_cap + 2) uint8,
    escaped (B,) bool) — the exact walk_rows_t payload format, decoded by
    bindings.opstream_rows_to_ops_batch."""
    B = planes.shape[2]
    W = w_band
    rg = sweep_rows_g(m_cap, W)
    assert B % B_LANE == 0 and rg % 4 == 0 and m_cap % rg == 0
    n_groups = m_cap // rg
    m2 = m.reshape(1, B).astype(jnp.int32)
    n2 = n.reshape(1, B).astype(jnp.int32)
    kernel = functools.partial(_myers_walk_kernel, m_cap=m_cap, n_cap=n_cap,
                               w_band=W, rows_g=rg)
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
            pl.BlockSpec((1, planes.shape[1], B_LANE),
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
    )(m2, n2, planes)
    rec8 = jax.lax.bitcast_convert_type(rec32.T, jnp.uint8).reshape(B, m_cap)
    fin8 = jnp.clip(fin[:2].T, 0, 255).astype(jnp.uint8)
    payload = jnp.concatenate([rec8, fin8], axis=1)
    return payload, fin[1].astype(bool)


# ------------------ compact-payload (rle) walk path ------------------- #
#
# The rows payload is m_cap + 2 bytes/item — at the 40960 long-read caps
# that is 41 KB/item vs ~10.7 KB for the scored rle payload, and on a
# measured-slow link the 4x D2H bytes invert the stage outcome even with
# async prefetch (bandwidth, not latency; benchmarks/profile_long_ab.py).
# The DIAG/UP bit planes store EXACTLY the scored kernel's move-equality
# predicates (DIAG bit <=> h == diag_c, UP bit <=> h == up_c — the same
# per-cell equivalence the rows walk's bit-identity rests on, PLAN.md
# round-4 notes), so decoding them under the shared DIAG > UP > LEFT
# priority reproduces nw_band_batch_t8's 2-bit move planes bit-for-bit at
# every cell a walk can read — and the EXISTING rle walk
# (nw_kernel.walk_moves_rle_t) then runs unchanged on the result.


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band"))
def myers_moves_from_planes(planes, m, *, m_cap, n_cap, w_band):
    """Scored-format move planes ((m_cap//16, W, B) int32, 16 rows' 2-bit
    codes per word — nw_band_batch_t8's layout) from the Myers sweep's
    plane blocks ((m_cap//rg, rg*2*nw, B) int32, myers_sweep_t's layout).

    Per cell: code 0 where the DIAG bit is set, else 1 where UP, else 2;
    3 outside the static band geometry (jrow < 1 or > n_cap) and beyond
    the item's real rows (i > m — the scored planes hold PAD-row dynamics
    there; no walk reads those cells, 3 keeps them inert either way).
    Group-chunked lax.map bounds the unpacked (rg, W, B) temporary to a
    few tens of MB — a flat (m_cap, W, B) intermediate would be ~17 GB at
    the 40960/1024 tier (see PERF.md on tiled-layout padding)."""
    W = w_band
    nw = W // 32
    G, blk, B = planes.shape
    rg = blk // (2 * nw)
    assert rg % 16 == 0 and G * rg == m_cap
    dlo = band_dlo(m_cap, n_cap, W)
    jbit = jnp.arange(32, dtype=jnp.int32).reshape(1, 1, 32, 1)
    kidx = jnp.arange(W, dtype=jnp.int32).reshape(1, W, 1)
    sh = (2 * jnp.arange(16, dtype=jnp.int32)).reshape(1, 16, 1, 1)
    m2 = m.astype(jnp.int32).reshape(1, 1, B)
    pl5 = planes.reshape(G, rg, 2, nw, B)

    def group(args):
        blk5, g = args  # (rg, 2, nw, B), scalar
        db = ((blk5[:, 0, :, None, :] >> jbit) & 1).reshape(rg, W, B)
        ub = ((blk5[:, 1, :, None, :] >> jbit) & 1).reshape(rg, W, B)
        mv = jnp.where(db != 0, 0, jnp.where(ub != 0, 1, 2))
        i = (g * rg
             + jnp.arange(1, rg + 1, dtype=jnp.int32)).reshape(rg, 1, 1)
        jrow = i + dlo + kidx
        valid = (jrow >= 1) & (jrow <= n_cap) & (i <= m2)
        mv = jnp.where(valid, mv, 3)
        return jnp.sum(mv.reshape(rg // 16, 16, W, B) << sh,
                       axis=1).astype(jnp.int32)

    moves = jax.lax.map(group, (pl5, jnp.arange(G, dtype=jnp.int32)))
    return moves.reshape(m_cap // 16, W, B)


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "interpret"))
def align_walk_myers_rle_batch(q4, t4, m, n, *, m_cap, n_cap, w_band,
                               interpret=False):
    """Fused Myers align + RLE walk: the Myers sweep's device-time win
    (7.4-11.9x over the scored sweep) with the scored path's COMPACT rle
    payload (~cap/4 bytes/item instead of the rows format's cap + 2) —
    the long-read tiers' D2H bottleneck on slow links. Payload format and
    decode are identical to the scored rle path
    (bindings.opstream_rle_to_ops_batch)."""
    from .nw_kernel import (_expand_nib_T, rle_events, walk_moves_rle_t)

    qT = _expand_nib_T(q4.T, m_cap).astype(jnp.int32)
    tT = _expand_nib_T(t4.T, n_cap).astype(jnp.int32)
    rg = sweep_rows_g(m_cap, w_band)
    peq = build_peq_win_T(tT, m_cap, n_cap, w_band, rg)
    planes = myers_sweep_t(qT, peq, m_cap=m_cap, n_cap=n_cap,
                           w_band=w_band, interpret=interpret)
    moves = myers_moves_from_planes(planes, m, m_cap=m_cap, n_cap=n_cap,
                                    w_band=w_band)
    events, escaped = walk_moves_rle_t(
        moves, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
        max_events=rle_events(m_cap, n_cap, w_band))
    payload = jnp.concatenate([events, escaped[:, None].astype(jnp.uint8)],
                              axis=1)
    score = jnp.zeros((q4.shape[0], 1), jnp.int32)
    return payload, score


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "interpret"))
def align_walk_myers_batch(q4, t4, m, n, *, m_cap, n_cap, w_band,
                           interpret=False):
    """Fused Myers align+walk for the (0,-1,-1) align stage: q4/t4
    (B, CAP//2) uint8 nibble-packed codes (pack_codes4 layout), m/n (B,)
    int32 real lengths. Returns (payload (B, m_cap + 2) uint8 in the
    walk_rows_t format incl. the escape column, score zeros (B, 1) —
    the align stage discards scores, reference src/overlap.cpp:205-224
    only consumes the CIGAR)."""
    from .nw_kernel import _expand_nib_T

    qT = _expand_nib_T(q4.T, m_cap).astype(jnp.int32)
    tT = _expand_nib_T(t4.T, n_cap).astype(jnp.int32)
    rg = sweep_rows_g(m_cap, w_band)
    peq = build_peq_win_T(tT, m_cap, n_cap, w_band, rg)
    planes = myers_sweep_t(qT, peq, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
                           interpret=interpret)
    payload, _esc = myers_walk_t(planes, m, n, m_cap=m_cap, n_cap=n_cap,
                                 w_band=w_band, interpret=interpret)
    score = jnp.zeros((q4.shape[0], 1), jnp.int32)
    return payload, score


def align_walk_myers_padded(q4, t4, m, n, *, m_cap, n_cap, w_band,
                            fixed_b=None, interpret=False, fmt="rows"):
    """Batch-size-canonicalizing wrapper (align_walk_padded's padding
    policy): pads the nibble-packed batch to the canonical size with
    all-PAD items and dispatches the fused Myers align+walk — sharded
    over the active mesh when one exists (parallel/mesh.py, fmt
    "myers"), single-device otherwise. fmt picks the payload walk:
    "rows" (walk_rows_t format, cap + 2 B/item) or "rle" (the compact
    scored-rle format via the plane->move transform, ~cap/4 B/item —
    single-device only; a mesh falls back to rows). Returns
    (payload, score, payload_fmt) with payload_fmt naming the drain
    decoder branch."""
    from .nw_kernel import padded_batch
    from ..parallel.mesh import active_mesh, sharded_align_walk

    B = q4.shape[0]
    mesh = active_mesh()
    bp = padded_batch(B, fixed_b, interpret,
                      mesh.devices.size if mesh is not None else 1)
    if bp != B:
        pad = bp - B
        q4 = np.pad(q4, ((0, pad), (0, 0)), constant_values=0x55)
        t4 = np.pad(t4, ((0, pad), (0, 0)), constant_values=0x55)
        m = np.pad(np.asarray(m), (0, pad))
        n = np.pad(np.asarray(n), (0, pad))
    m = np.asarray(m, np.int32)
    n = np.asarray(n, np.int32)
    if mesh is not None:
        dcb = np.full((bp, m_cap // 8), 0xFF, np.uint8)  # sharded filler
        payload, score = sharded_align_walk(
            mesh, q4, t4, dcb, m, n, m_cap=m_cap, n_cap=n_cap,
            w_band=w_band, match=0, mismatch=-1, gap=-1,
            interpret=interpret, fmt="myers")
        return payload, score, "rows"
    if fmt == "rle":
        payload, score = align_walk_myers_rle_batch(
            q4, t4, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
            interpret=interpret)
        return payload, score, "rle"
    payload, score = align_walk_myers_batch(
        q4, t4, m, n, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
        interpret=interpret)
    return payload, score, "rows"
