"""Ablation microbenchmark of the transposed banded-NW kernel: time variants
with pieces removed to find where the per-dispatch milliseconds go.
Run on the real chip.

Variants:
  full      — production kernel body (nw + packed moves)
  noclosure — horizontal max-plus closure removed (wrong results)
  nomoves   — move packing/stores removed (only final H written)
  noload    — dynamic sublane-offset loads replaced by static row-0 loads
  nwonly    — production NW kernel without the fused walk
  walkonly  — the RLE walk alone on precomputed moves
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from racon_tpu.ops.nw_kernel import (  # noqa: E402
    NEG, PAD_CODE, _GROUP, _PACK, B_LANE, band_dlo, nw_band_batch_t,
    pack_codes4, pack_delbits, walk_moves_rle_t, rle_events,
    align_walk_rle_batch)


def make_kernel(m_cap, n_cap, w_band, match, mismatch, gap, *, closure=True,
                moves=True, dynload=True, empty=False):
    def kern(q_ref, tp_ref, gcp_ref, moves_ref, score_ref, hscr):
        if empty:
            # minimal body: one add per 16-row pack step, one store
            g0 = pl.program_id(1)

            def body(p, hp):
                moves_ref[pl.ds(p, 1), :, :] = hp[None]
                return hp + 1

            h = jax.lax.fori_loop(0, _GROUP // _PACK, body,
                                  gcp_ref[pl.ds(0, w_band), :])
            hscr[...] = h

            @pl.when(g0 == m_cap // _GROUP - 1)
            def _():
                score_ref[...] = jax.lax.slice(h, (0, 0),
                                               (1, q_ref.shape[1]))
            return
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
                off = (i - 1 + PADL + dlo) if dynload else (PADL + dlo)
                t_row = tp_ref[pl.ds(off, W), :]
                gc_here = gcp_ref[pl.ds(off + 1, W), :]
                qi = q_ref[pl.ds(i - 1, 1), :] if dynload else q_ref[pl.ds(0, 1), :]
                jrow = i + dlo + kcol
                valid = (jrow >= 1) & (jrow <= n_cap)
                same = t_row == qi
                one_pad = (t_row == PAD_CODE) ^ (qi == PAD_CODE)
                sub = jnp.where(one_pad, NEG,
                                jnp.where(same, match, mismatch))
                diag_c = hp + sub
                up = pltpu.roll(hp, W - 1, 0)
                up_c = jnp.where(kcol == W - 1, NEG, up) + gap
                cand = jnp.maximum(diag_c, up_c)
                cand = jnp.where(jrow == 0, i * gap, cand)
                cand = jnp.where(valid | (jrow == 0), cand, NEG)
                if closure:
                    a = cand - gc_here
                    s = 1
                    while s < W:
                        r = pltpu.roll(a, s, 0)
                        a = jnp.maximum(a, jnp.where(kcol < s, 2 * NEG, r))
                        s *= 2
                    h = a + gc_here
                else:
                    h = cand
                h = jnp.where(valid | (jrow == 0), h, NEG)
                if moves:
                    mv = jnp.where(h == diag_c, 0,
                                   jnp.where(h == up_c, 1, 2))
                    mv = jnp.where(valid, mv, 3)
                    pack = pack | (mv << (2 * u))
                hp = h
            if moves:
                moves_ref[pl.ds(p, 1), :, :] = pack[None]
            return hp

        h_final = jax.lax.fori_loop(0, _GROUP // _PACK, pack_body, hscr[...])
        hscr[...] = h_final

        @pl.when(g == n_groups - 1)
        def _():
            k_end = n_cap - m_cap - dlo
            score_ref[...] = jax.lax.slice(h_final, (k_end, 0),
                                           (k_end + 1, BT))
    return kern


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "variant"))
def run_variant(qT, tpT, gcpT, *, m_cap, n_cap, w_band, variant):
    W = w_band
    B = qT.shape[1]
    kw = dict(closure=True, moves=True, dynload=True)
    if variant == "noclosure":
        kw["closure"] = False
    elif variant == "nomoves":
        kw["moves"] = False
    elif variant == "noload":
        kw["dynload"] = False
    elif variant == "empty":
        kw["empty"] = True
    kernel = make_kernel(m_cap, n_cap, W, 5, -4, -8, **kw)
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
        scratch_shapes=[pltpu.VMEM((W, B_LANE), jnp.int32)],
    )(qT, tpT, gcpT)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rng = np.random.default_rng(0)
    hi = min(520, cap)
    mlen = rng.integers(hi - 100, hi, B).astype(np.int32)
    nlen = np.minimum(mlen + rng.integers(-20, 20, B), cap).astype(np.int32)
    q8 = np.full((B, cap), PAD_CODE, np.int8)
    t8 = np.full((B, cap), PAD_CODE, np.int8)
    for i in range(B):
        q8[i, : mlen[i]] = rng.integers(0, 4, mlen[i])
        t8[i, : nlen[i]] = rng.integers(0, 4, nlen[i])
        L = min(mlen[i], nlen[i])
        t8[i, :L] = q8[i, :L]

    qT = np.ascontiguousarray(q8.T).astype(np.int32)
    tpT = np.pad(np.ascontiguousarray(t8.T).astype(np.int32),
                 ((W, W), (0, 0)), constant_values=PAD_CODE)
    dc = np.full((cap, B), -8, np.int32)
    gc = np.pad(np.cumsum(dc, axis=0), ((1, 0), (0, 0)))
    gcpT = np.concatenate([np.zeros((W, B), np.int32), gc,
                           np.broadcast_to(gc[-1:], (W, B))]).astype(np.int32)

    devs = [jax.device_put(x) for x in (qT, tpT, gcpT)]

    def timeit(fn, reps=5):
        # force real completion: fetch a scalar reduction of every output
        # (block_until_ready alone can lie through the tunnel's async queue)
        def force():
            r = fn()
            leaves = jax.tree_util.tree_leaves(r)
            return [np.asarray(jnp.max(x)) for x in leaves]

        force()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            force()
            ts.append(time.monotonic() - t0)
        return sorted(ts)[len(ts) // 2]

    for variant in ("full", "noclosure", "nomoves", "noload", "empty"):
        dt = timeit(lambda: run_variant(devs[0], devs[1], devs[2], m_cap=cap,
                                        n_cap=cap, w_band=W, variant=variant))
        print(f"{variant:10s}: {dt*1e3:7.1f} ms")

    # nw only (production, jitted once) and walk only
    nw_jit = jax.jit(lambda a, b, c: nw_band_batch_t(
        a, b, c, m_cap=cap, n_cap=cap, w_band=W, match=5, mismatch=-4,
        gap=-8))
    moves, score = nw_jit(devs[0], devs[1], devs[2])
    jax.block_until_ready(moves)
    dt = timeit(lambda: nw_jit(devs[0], devs[1], devs[2]))
    print(f"{'nwonly':10s}: {dt*1e3:7.1f} ms")
    mj = jax.device_put(np.asarray(moves))
    mdev = jax.device_put(np.asarray(mlen))
    ndev = jax.device_put(np.asarray(nlen))
    dt = timeit(lambda: walk_moves_rle_t(mj, mdev, ndev, m_cap=cap, n_cap=cap,
                                         w_band=W,
                                         max_events=rle_events(cap, cap, W)))
    print(f"{'walkonly':10s}: {dt*1e3:7.1f} ms")

    # full fused production path (includes H2D of packed rows)
    q4 = pack_codes4(q8)
    t4 = pack_codes4(t8)
    dcb = pack_delbits(np.full((B, cap), -8, np.int8))
    dt = timeit(lambda: align_walk_rle_batch(
        q4, t4, dcb, mlen, nlen, m_cap=cap, n_cap=cap, w_band=W, match=5,
        mismatch=-4, gap=-8))
    print(f"{'fused+h2d':10s}: {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
