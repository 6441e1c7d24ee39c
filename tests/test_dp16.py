"""int16 DP variant of the t8 sweeps (nw_kernel.dp16_eligible): moves and
scores must be bit-identical to the int32 kernels. The int16 path doubles
VPU width on real chips; eligibility bounds every intermediate inside
int16 range (see dp16_eligible's docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from racon_tpu.ops import nw_kernel as nk


def _panels(rng, B, cap, W, gap, err=0.15, free_dels=0.0):
    t8 = rng.integers(0, 4, (B, cap)).astype(np.int8)
    q8 = t8.copy()
    sub = rng.random((B, cap)) < err
    q8[sub] = rng.integers(0, 4, int(sub.sum()))
    m = rng.integers(cap // 2, cap + 1, B).astype(np.int32)
    n = rng.integers(cap // 2, cap + 1, B).astype(np.int32)
    for b in range(B):
        q8[b, m[b]:] = nk.PAD_CODE
        t8[b, n[b]:] = nk.PAD_CODE
    dc8 = np.full((B, cap), gap, np.int8)
    if free_dels:
        dc8[rng.random((B, cap)) < free_dels] = 0
    q4, t4 = nk.pack_codes4(q8), nk.pack_codes4(t8)
    dcb = nk.pack_delbits(dc8)
    return nk._prep_panels_t8(jnp.asarray(q4), jnp.asarray(t4),
                              jnp.asarray(dcb), m_cap=cap, n_cap=cap,
                              w_band=W, gap=gap)


def test_dp16_eligibility_bounds(monkeypatch):
    monkeypatch.setenv("RACON_TPU_DP16", "1")
    assert nk.dp16_eligible(640, 640, 5, -4, -8)
    assert nk.dp16_eligible(256, 256, 5, -4, -8)
    assert nk.dp16_eligible(2560, 2560, 0, -1, -1)
    assert not nk.dp16_eligible(1280, 1280, 5, -4, -8)
    assert not nk.dp16_eligible(10240, 10240, 0, -1, -1)
    monkeypatch.delenv("RACON_TPU_DP16")
    assert not nk.dp16_eligible(640, 640, 5, -4, -8)  # opt-in default off


@pytest.mark.parametrize("big", [False, True])
def test_dp16_bit_identical(monkeypatch, big):
    rng = np.random.default_rng(5)
    B, cap, W = 128, 256, 128
    scores = dict(match=5, mismatch=-4, gap=-8)
    qT, tpT, dcpT = _panels(rng, B, cap, W, -8, free_dels=0.3)
    fn = nk.nw_band_batch_t8big if big else nk.nw_band_batch_t8
    kws = dict(m_cap=cap, n_cap=cap, w_band=W, **scores)
    monkeypatch.setenv("RACON_TPU_DP16", "1")
    assert nk.dp16_eligible(cap, cap, **scores)
    mv16, sc16 = fn(qT, tpT, dcpT, **kws, interpret=True)
    monkeypatch.setenv("RACON_TPU_DP16", "0")
    mv32, sc32 = fn(qT, tpT, dcpT, **kws, interpret=True)
    assert np.array_equal(np.asarray(mv16), np.asarray(mv32))
    assert np.array_equal(np.asarray(sc16), np.asarray(sc32))
