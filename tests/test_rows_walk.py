"""Row-synchronous traceback walk (nw_kernel.walk_rows_*) vs the step walk.

The rows walk consumes the same packed move planes as the other walks and
must decode to identical forward op lists. walk_rows_ref is the pure-jnp
twin; the Pallas kernel (walk_rows_t, interpret mode here) must produce
byte-identical payloads to the twin. Moves come from nw_band_batch_ref.
"""

import numpy as np
import pytest

from racon_tpu.native import loader
from racon_tpu.ops.nw_kernel import (encode, nw_band_batch_ref, walk_moves_device,
                                     walk_rows_ref, walk_rows_t, walk_steps,
                                     PAD_CODE)

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


def _moves_for(pairs, scores, del_costs=None):
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
    return np.asarray(moves), m, n


def _decode_both(moves, m, n):
    from racon_tpu.native import bindings

    steps = walk_steps(M_CAP, N_CAP, W)
    codes, esc1 = walk_moves_device(moves, m, n, m_cap=M_CAP, n_cap=N_CAP,
                                    w_band=W, max_steps=steps, packed=True)
    ops1, off1, cnt1 = bindings.opstream_packed_to_ops_batch(
        np.asarray(codes), steps, m, n, 2)

    payload, esc2 = walk_rows_ref(moves.transpose(1, 2, 0), m, n,
                                  m_cap=M_CAP, n_cap=N_CAP, w_band=W)
    payload = np.asarray(payload)
    ops2, off2, cnt2 = bindings.opstream_rows_to_ops_batch(
        payload, M_CAP + 2, m, n, 2)
    return (ops1, off1, cnt1, np.asarray(esc1)), (ops2, off2, cnt2,
                                                  np.asarray(esc2))


def _random_pairs(rng, count, max_mut_frac=3):
    pairs = []
    for _ in range(count):
        tlen = int(rng.integers(8, N_CAP))
        t = rng.choice(ACGT, tlen)
        qa = _mutate(rng, t,
                     int(rng.integers(0, tlen // max_mut_frac + 1)))[: M_CAP]
        pairs.append((qa, t))
    return pairs


@pytest.mark.parametrize("scores", [(5, -4, -8), (0, -1, -1)])
def test_rows_walk_matches_step_walk(scores):
    rng = np.random.default_rng(31)
    pairs = _random_pairs(rng, 48)
    moves, m, n = _moves_for(pairs, scores)
    (ops1, off1, cnt1, esc1), (ops2, off2, cnt2, esc2) = _decode_both(
        moves, m, n)
    assert not esc1.any() and not esc2.any()
    for b in range(len(pairs)):
        a = ops1[off1[b] : off1[b] + cnt1[b]]
        c = ops2[off2[b] : off2[b] + cnt2[b]]
        assert np.array_equal(a, c), f"item {b}: {a} vs {c}"


def test_rows_walk_free_deletion_columns():
    rng = np.random.default_rng(37)
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
    moves, m, n = _moves_for(pairs, (5, -4, -8), dels)
    (ops1, off1, cnt1, esc1), (ops2, off2, cnt2, esc2) = _decode_both(
        moves, m, n)
    assert not esc1.any() and not esc2.any()
    for b in range(len(pairs)):
        a = ops1[off1[b] : off1[b] + cnt1[b]]
        c = ops2[off2[b] : off2[b] + cnt2[b]]
        assert np.array_equal(a, c), f"item {b}: {a} vs {c}"


def test_rows_walk_kernel_matches_ref():
    """Pallas kernel (interpret) payload is byte-identical to the jnp
    twin's, including escape flags."""
    rng = np.random.default_rng(41)
    pairs = _random_pairs(rng, 128)
    moves, m, n = _moves_for(pairs, (5, -4, -8))
    mt = moves.transpose(1, 2, 0)
    p_ref, e_ref = walk_rows_ref(mt, m, n, m_cap=M_CAP, n_cap=N_CAP,
                                 w_band=W)
    p_ker, e_ker = walk_rows_t(mt, m, n, m_cap=M_CAP, n_cap=N_CAP,
                               w_band=W, interpret=True)
    assert np.array_equal(np.asarray(p_ref), np.asarray(p_ker))
    assert np.array_equal(np.asarray(e_ref), np.asarray(e_ker))


def test_rows_walk_long_deletion_run_escapes():
    """A >63-deletion run in one row cannot be encoded in the 6-bit count;
    the item must be flagged escaped (host realign), never silently
    truncated."""
    rng = np.random.default_rng(43)
    t = rng.choice(ACGT, 120)
    qa = t[:30].copy()  # query is a prefix: one ~90-deletion run at the end
    moves, m, n = _moves_for([(qa, t)], (0, -1, -1))
    payload, esc = walk_rows_ref(moves[:1].transpose(1, 2, 0), m, n,
                                 m_cap=M_CAP, n_cap=N_CAP, w_band=W)
    assert bool(np.asarray(esc)[0])


@pytest.mark.parametrize("big", [False, True])
def test_fused_rows_pipeline_matches_packed2(big):
    """End-to-end fused rows pipeline (t8/t8big sweep -> walk_rows_t, both
    interpret mode) vs the lane-major packed2 fused path on the same
    inputs: the sweeps' packed move-word layout and the rows walk's
    slot/bit-plane reads must agree, decoded ops identical (ADVICE r3)."""
    import functools

    from racon_tpu.native import bindings
    from racon_tpu.ops.nw_kernel import (align_walk_packed_core,
                                         align_walk_packed_core_rows_t,
                                         nw_band_batch, pack_codes4,
                                         pack_delbits)

    rng = np.random.default_rng(47)
    B = 128  # B_LANE-aligned (the transposed kernels' batch unit)
    pairs = _random_pairs(rng, B)
    scores = (0, -1, -1)
    q8 = np.full((B, M_CAP), PAD_CODE, np.int8)
    t8 = np.full((B, N_CAP), PAD_CODE, np.int8)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for b, (qa, ta) in enumerate(pairs):
        q8[b, : len(qa)] = encode(qa)
        t8[b, : len(ta)] = encode(ta)
        m[b], n[b] = len(qa), len(ta)
    dc8 = np.full((B, N_CAP), scores[2], np.int8)
    q4, t4, dcb = pack_codes4(q8), pack_codes4(t8), pack_delbits(dc8)
    kw = dict(m_cap=M_CAP, n_cap=N_CAP, w_band=W, match=scores[0],
              mismatch=scores[1], gap=scores[2])

    rows_payload, rows_score = align_walk_packed_core_rows_t(
        q4, t4, dcb, m, n, big=big, interpret=True, **kw)
    rows_payload = np.asarray(rows_payload)
    assert not rows_payload[:, -1].any(), "unexpected escapes"
    ops2, off2, cnt2 = bindings.opstream_rows_to_ops_batch(
        rows_payload, M_CAP + 2, m, n, 2)

    p2_payload, p2_score = align_walk_packed_core(
        q4, t4, dcb, m, n,
        nw_fn=functools.partial(nw_band_batch, interpret=True), **kw)
    p2_payload = np.asarray(p2_payload)
    codes = np.ascontiguousarray(p2_payload[:, :-1])
    ops1, off1, cnt1 = bindings.opstream_packed_to_ops_batch(
        codes, walk_steps(M_CAP, N_CAP, W), m, n, 2)

    assert np.array_equal(np.asarray(rows_score), np.asarray(p2_score))
    for b in range(B):
        a = ops1[off1[b] : off1[b] + cnt1[b]]
        c = ops2[off2[b] : off2[b] + cnt2[b]]
        assert np.array_equal(a, c), f"item {b}: {a} vs {c}"
