"""RLE traceback walk (nw_kernel.walk_moves_rle_t) vs the 2-bit step walk.

Both walks consume the same packed move planes and must decode to identical
forward op lists (the RLE stream is just a compressed emission of the same
backward path). The RLE walk is the production transposed-kernel path; the
2-bit walk stays for interpret/CPU mode. Moves come from nw_band_batch_ref
(bit-identical twin of the Pallas kernel), so this runs on CPU.
"""

import numpy as np
import pytest

from racon_tpu.native import loader
from racon_tpu.ops.nw_kernel import (encode, nw_band_batch_ref, rle_events,
                                     walk_moves_device, walk_moves_rle_t,
                                     walk_steps, PAD_CODE, RLE_UP, RLE_LEFT)

if not loader.available():
    pytest.skip("native runtime unavailable", allow_module_level=True)

M_CAP = N_CAP = 128
W = 64
ACGT = np.frombuffer(b"ACGT", np.uint8)


def _mutate(rng, t, n_mut):
    q = t.copy()
    for _ in range(n_mut):
        kind = rng.integers(0, 3)
        pos = int(rng.integers(0, max(1, len(q))))
        if kind == 0 and len(q):
            q[pos] = rng.choice(ACGT)
        elif kind == 1 and len(q) > 2:
            q = np.delete(q, pos)
        else:
            q = np.insert(q, pos, rng.choice(ACGT))
    return q


def _both_walks(pairs, scores, del_costs=None):
    from racon_tpu.native import bindings

    B = len(pairs)
    match, mismatch, gap = scores
    q = np.full((B, M_CAP), PAD_CODE, np.int32)
    t = np.full((B, N_CAP), PAD_CODE, np.int32)
    gc = np.zeros((B, N_CAP + 1), np.int32)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for b, (qa, ta) in enumerate(pairs):
        q[b, : len(qa)] = encode(qa)
        t[b, : len(ta)] = encode(ta)
        m[b], n[b] = len(qa), len(ta)
        dc = np.full(N_CAP, gap, np.int32)
        if del_costs is not None and del_costs[b] is not None:
            dc[: len(ta)] = del_costs[b]
        gc[b, 1:] = np.cumsum(dc)
    moves, _ = nw_band_batch_ref(q, t, gc, m_cap=M_CAP, n_cap=N_CAP,
                                 w_band=W, match=match, mismatch=mismatch,
                                 gap=gap)
    moves = np.asarray(moves)

    steps = walk_steps(M_CAP, N_CAP, W)
    codes, esc1 = walk_moves_device(moves, m, n, m_cap=M_CAP, n_cap=N_CAP,
                                    w_band=W, max_steps=steps, packed=True)
    ops1, off1, cnt1 = bindings.opstream_packed_to_ops_batch(
        np.asarray(codes), steps, m, n, 2)

    ev = rle_events(M_CAP, N_CAP, W)
    events, esc2 = walk_moves_rle_t(moves.transpose(1, 2, 0), m, n,
                                    m_cap=M_CAP, n_cap=N_CAP, w_band=W,
                                    max_events=ev)
    ops2, off2, cnt2 = bindings.opstream_rle_to_ops_batch(
        np.asarray(events), ev, m, n, 2)
    return (ops1, off1, cnt1, np.asarray(esc1)), (ops2, off2, cnt2,
                                                  np.asarray(esc2))


@pytest.mark.parametrize("scores", [(5, -4, -8), (0, -1, -1)])
def test_rle_walk_matches_step_walk(scores):
    rng = np.random.default_rng(17)
    pairs = []
    for _ in range(48):
        tlen = int(rng.integers(8, N_CAP))
        t = rng.choice(ACGT, tlen)
        qa = _mutate(rng, t, int(rng.integers(0, tlen // 3 + 1)))[: M_CAP]
        pairs.append((qa, t))
    (ops1, off1, cnt1, esc1), (ops2, off2, cnt2, esc2) = _both_walks(
        pairs, scores)
    assert not esc1.any() and not esc2.any()
    for b in range(len(pairs)):
        a = ops1[off1[b] : off1[b] + cnt1[b]]
        c = ops2[off2[b] : off2[b] + cnt2[b]]
        assert np.array_equal(a, c), f"item {b}: {a} vs {c}"


def test_rle_walk_free_deletion_columns():
    """Per-column zero deletion costs (optional columns in refinement
    passes) produce long deletion chains; both walks must agree."""
    rng = np.random.default_rng(23)
    pairs, dels = [], []
    for _ in range(32):
        tlen = int(rng.integers(30, N_CAP))
        t = rng.choice(ACGT, tlen)
        qa = _mutate(rng, t, int(rng.integers(0, 6)))[: M_CAP]
        dc = np.full(tlen, -8, np.int32)
        free = rng.random(tlen) < 0.3
        dc[free] = 0
        pairs.append((qa, t))
        dels.append(dc)
    (ops1, off1, cnt1, esc1), (ops2, off2, cnt2, esc2) = _both_walks(
        pairs, (5, -4, -8), dels)
    assert not esc1.any() and not esc2.any()
    for b in range(len(pairs)):
        a = ops1[off1[b] : off1[b] + cnt1[b]]
        c = ops2[off2[b] : off2[b] + cnt2[b]]
        assert np.array_equal(a, c), f"item {b}: {a} vs {c}"


def test_rle_walk_budget_overflow_flags_escape():
    """An event budget too small for the path must flag escape, not emit a
    truncated stream silently."""
    rng = np.random.default_rng(5)
    t = rng.choice(ACGT, 100)
    qa = rng.choice(ACGT, 100)  # unrelated -> many events
    B = 1
    q = np.full((B, M_CAP), PAD_CODE, np.int32)
    tt = np.full((B, N_CAP), PAD_CODE, np.int32)
    gc = np.zeros((B, N_CAP + 1), np.int32)
    q[0, :100] = encode(qa)
    tt[0, :100] = encode(t)
    gc[0, 1:] = np.cumsum(np.full(N_CAP, -1, np.int32))
    moves, _ = nw_band_batch_ref(q, tt, gc, m_cap=M_CAP, n_cap=N_CAP,
                                 w_band=W, match=0, mismatch=-1, gap=-1)
    m = np.array([100], np.int32)
    n = np.array([100], np.int32)
    # nw_band_batch_ref pads the batch to B_TILE and returns it padded
    _, esc = walk_moves_rle_t(np.asarray(moves)[:B].transpose(1, 2, 0), m, n,
                              m_cap=M_CAP, n_cap=N_CAP, w_band=W,
                              max_events=8)
    assert bool(np.asarray(esc)[0])
