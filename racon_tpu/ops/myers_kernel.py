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


# ------------------------- word-vector helpers ------------------------- #
# arrays are (nw, B) int32; bit index b = 32*w + (b & 31), low-to-high.


def _lsr(x, s):
    """Logical shift right on int32."""
    return jax.lax.shift_right_logical(x, jnp.asarray(s, x.dtype))


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
        # boundary sanitize: bits <= kz of the state are zero
        keep = _mask_ge(kz + 1, nw, B)
        PV = PV & keep
        MV = MV & keep
        eq = eq & keep
        X = eq | MV
        XP = X & PV
        S = _add_carry(XP, PV, _roll_down_jnp)
        D0 = (S ^ PV) | X
        HN = PV & D0
        HP = MV | ~(PV | D0)
        oh = _onehot(kz, nw, B)
        HP = HP | oh
        HN = HN & ~oh
        X2 = _shl1(HP, _roll_down_jnp)
        PVn = _shl1(HN, _roll_down_jnp) | ~(D0 | X2)
        MVn = D0 & X2
        diag = eq | ~D0
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
    diag_hit = jnp.any((diag & ohx) != 0, axis=0, keepdims=True)
    up_hit = jnp.any((up & ohx) != 0, axis=0, keepdims=True)
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
