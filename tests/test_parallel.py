"""Multi-device scale-out: pure-jax kernel twin + sharded polish step.

Runs on the virtual 8-device CPU mesh from conftest. Validates (a) that
nw_band_batch_ref is bit-identical to the Pallas kernel (interpret mode),
(b) that the sharded polish step produces the same op streams as the
unsharded path, and (c) the driver-facing __graft_entry__ hooks.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from racon_tpu.ops.nw_kernel import (  # noqa: E402
    nw_band_batch, nw_band_batch_ref, walk_moves_device, encode, PAD_CODE)


M_CAP = N_CAP = 128
W = 64
SCORES = dict(match=5, mismatch=-4, gap=-8)
ACGT = np.frombuffer(b"ACGT", np.uint8)


def _batch(B, seed=7):
    rng = np.random.default_rng(seed)
    q = np.full((B, M_CAP), PAD_CODE, np.int32)
    t = np.full((B, N_CAP), PAD_CODE, np.int32)
    gc = np.zeros((B, N_CAP + 1), np.int32)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for b in range(B):
        nlen = int(rng.integers(40, N_CAP))
        mlen = int(rng.integers(max(1, nlen - 20), min(M_CAP, nlen + 20)))
        tb = rng.choice(ACGT, nlen)
        qb = rng.choice(ACGT, mlen)
        k = min(mlen, nlen)
        qb[:k] = tb[:k]
        for pos in rng.choice(mlen, mlen // 10, replace=False):
            qb[pos] = rng.choice(ACGT)
        q[b, :mlen] = encode(qb)
        t[b, :nlen] = encode(tb)
        gc[b, 1:] = np.cumsum(np.full(N_CAP, SCORES["gap"], np.int32))
        m[b], n[b] = mlen, nlen
    return q, t, gc, m, n


def test_ref_matches_pallas_kernel_bitwise():
    q, t, gc, _, _ = _batch(16)
    mv1, s1 = nw_band_batch(q, t, gc, m_cap=M_CAP, n_cap=N_CAP, w_band=W,
                            interpret=True, **SCORES)
    mv2, s2 = nw_band_batch_ref(q, t, gc, m_cap=M_CAP, n_cap=N_CAP, w_band=W,
                                **SCORES)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    assert (np.asarray(mv1) == np.asarray(mv2)).all()


def test_sharded_step_matches_unsharded():
    from racon_tpu.parallel.mesh import window_mesh, polish_step_sharded

    devs = jax.devices("cpu")
    n_dev = min(8, len(devs))
    mesh = window_mesh(devs[:n_dev])
    step = polish_step_sharded(mesh, m_cap=M_CAP, n_cap=N_CAP, w_band=W,
                               interpret=True, **SCORES)
    B = 16 * n_dev
    q, t, gc, m, n = _batch(B)
    codes_s, esc_s, score_s = jax.device_get(step(q, t, gc, m, n))

    mv, score_u = nw_band_batch_ref(q, t, gc, m_cap=M_CAP, n_cap=N_CAP,
                                    w_band=W, **SCORES)
    codes_u, esc_u = jax.device_get(walk_moves_device(
        mv, m, n, m_cap=M_CAP, n_cap=N_CAP, w_band=W,
        max_steps=M_CAP + N_CAP))
    assert (score_s == np.asarray(score_u)).all()
    assert (codes_s == codes_u).all()
    assert (esc_s == esc_u).all()
    assert not esc_u.any()
    # op streams consume exactly the real characters of each item
    for b in range(0, B, 17):
        c = codes_s[b]
        assert ((c == 0) | (c == 1)).sum() == m[b]
        assert ((c == 0) | (c == 2)).sum() == n[b]


def test_graft_entry_hooks():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(min(8, len(jax.devices("cpu"))))
