"""Pallas banded-NW kernel vs the host oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from racon_tpu.ops import nw_host
from racon_tpu.ops.nw_kernel import nw_band_batch, encode, PAD_CODE
from racon_tpu.ops.nw_walk import walk_moves
from tests.test_nw_host import ops_consistent, score_of_ops

M_CAP = N_CAP = 128
W = 64


def _run(pairs, scores, del_costs=None):
    B = len(pairs)
    q = np.full((B, M_CAP), PAD_CODE, np.int32)
    t = np.full((B, N_CAP), PAD_CODE, np.int32)
    gc = np.zeros((B, N_CAP + 1), np.int32)
    gap = scores[2]
    for b, (qa, ta) in enumerate(pairs):
        q[b, : len(qa)] = encode(qa)
        t[b, : len(ta)] = encode(ta)
        dc = np.full(N_CAP, gap, np.int32)
        if del_costs is not None and del_costs[b] is not None:
            dc[: len(ta)] = del_costs[b]
        gc[b, 1:] = np.cumsum(dc)
    moves, score = nw_band_batch(q, t, gc, m_cap=M_CAP, n_cap=N_CAP, w_band=W,
                                 match=scores[0], mismatch=scores[1],
                                 gap=scores[2], interpret=True)
    moves = np.asarray(moves)
    score = np.asarray(score)
    out = []
    for b, (qa, ta) in enumerate(pairs):
        ops = walk_moves(moves[b], len(qa), len(ta), M_CAP, N_CAP, W)
        out.append((int(score[b, 0]), ops))
    return out


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


@pytest.mark.parametrize("scores", [(5, -4, -8), (3, -5, -4), (0, -1, -1)])
def test_kernel_matches_oracle_scores_and_ops(scores):
    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(8):
        t = rng.choice(ACGT, int(rng.integers(30, 60)))
        q = _mutate(rng, t, 4)
        pairs.append((q, t))
    results = _run(pairs, scores)
    for (q, t), (score, ops) in zip(pairs, results):
        want_score, _ = nw_host.nw_align(q, t, *scores)
        # kernel score includes the deterministic pad tail
        pad_score = scores[0] * min(M_CAP - len(q), N_CAP - len(t)) + \
            scores[2] * abs((M_CAP - len(q)) - (N_CAP - len(t)))
        assert score == want_score + pad_score
        assert ops_consistent(ops.tolist(), len(q), len(t))
        assert score_of_ops(ops.tolist(), q, t, *scores) == want_score


def test_kernel_exact_ops_vs_oracle_easy():
    """With comfortable band margin and no near-band paths, tie-breaking
    matches the oracle exactly."""
    rng = np.random.default_rng(12)
    scores = (5, -4, -8)
    pairs = []
    for _ in range(6):
        t = rng.choice(ACGT, 50)
        q = _mutate(rng, t, 2)
        pairs.append((q, t))
    results = _run(pairs, scores)
    for (q, t), (score, ops) in zip(pairs, results):
        _, want = nw_host.nw_align(q, t, *scores)
        assert ops.tolist() == want.tolist()


def test_kernel_per_column_deletion_costs():
    """Optional (zero-del-cost) columns: reads lacking the base skip it free;
    matches the oracle's percol mode."""
    scores = (5, -4, -8)
    t = np.frombuffer(b"AACCTTGG", np.uint8)
    # column 4 ('T') optional
    dc = np.full(len(t), scores[2], np.int32)
    dc[4] = 0
    qs = [b"AACCTTGG", b"AACCTGG", b"AACCGG"]
    pairs = [(np.frombuffer(x, np.uint8), t) for x in qs]
    results = _run(pairs, scores, del_costs=[dc] * 3)
    for (q, _), (score, ops) in zip(pairs, results):
        want_score, want_ops = nw_host.nw_align(q, t, *scores, del_cost=dc)
        assert ops_consistent(ops.tolist(), len(q), len(t))
        got_real = score - (scores[0] * min(M_CAP - len(q), N_CAP - len(t)) +
                            scores[2] * abs((M_CAP - len(q)) - (N_CAP - len(t))))
        assert got_real == want_score
        assert ops.tolist() == want_ops.tolist()


def test_kernel_identical_sequences():
    q = np.frombuffer(b"ACGTACGTACGT", np.uint8)
    results = _run([(q, q)], (5, -4, -8))
    score, ops = results[0]
    assert ops.tolist() == [[0, 12]]


def test_uplink_packing_roundtrip():
    """pack_codes4/pack_delbits (host) must invert exactly through the
    device-side unpackers."""
    import numpy as np
    import jax
    from racon_tpu.ops.nw_kernel import (pack_codes4, pack_delbits,
                                         unpack_codes4, unpack_delbits)

    rng = np.random.default_rng(5)
    q8 = rng.integers(0, 6, (7, 256)).astype(np.int8)
    got = np.asarray(jax.jit(unpack_codes4, static_argnums=1)(
        pack_codes4(q8), 256))
    np.testing.assert_array_equal(got, q8)

    gap = -8
    dc8 = np.where(rng.random((7, 256)) < 0.3, 0, gap).astype(np.int8)
    got = np.asarray(jax.jit(unpack_delbits, static_argnums=(1, 2))(
        pack_delbits(dc8), 256, gap))
    np.testing.assert_array_equal(got, dc8.astype(np.int32))
