"""Is the RLE walk's fixed cost the int8 output transpose? Times the walk
with the production (B, E) output vs a transposed (E, B) variant that skips
outs.T on device."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from racon_tpu.ops.nw_kernel import (walk_moves_rle_t, rle_events,
                                     RLE_SKIP, band_dlo, _PACK)


@functools.partial(jax.jit, static_argnames=("m_cap", "n_cap", "w_band",
                                             "max_events"))
def walk_rle_not(moves, m, n, *, m_cap, n_cap, w_band, max_events):
    """walk_moves_rle_t body without the final outs.T (returns (E, B))."""
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
        z = (word.astype(jnp.uint32)) << (2 * (_PACK - 1 - p)).astype(
            jnp.uint32)
        nlz = jnp.zeros_like(z, jnp.int32)
        for sh, thr_ in ((16, 0x0000FFFF), (8, 0x00FFFFFF), (4, 0x0FFFFFFF),
                         (2, 0x3FFFFFFF), (1, 0x7FFFFFFF)):
            take = z <= jnp.uint32(thr_)
            nlz = nlz + jnp.where(take, sh, 0)
            if sh > 1:
                z = jnp.where(take, z << jnp.uint32(sh), z)
        d = jnp.minimum(nlz >> 1, p + 1)
        d = jnp.where(interior & ~esc, jnp.minimum(d, jnp.minimum(i, j)), 0)
        single = jnp.where(mv == 1, 201, jnp.where(mv == 2, 202, 0))
        out = jnp.where(d > 0, d, single)
        out = jnp.where(esc | at_origin, RLE_SKIP, out).astype(jnp.uint8)
        di = jnp.where(esc | at_origin, 0,
                       jnp.where(d > 0, d, jnp.where(mv == 1, 1, 0)))
        dj = jnp.where(esc | at_origin, 0,
                       jnp.where(d > 0, d, jnp.where(mv == 2, 1, 0)))
        return (i - di, j - dj, esc), out

    buf0 = jnp.full((max_events, B), RLE_SKIP, jnp.uint8)

    def cond(carry):
        s, i, j, escaped, _ = carry
        return (s < max_events) & jnp.any(((i != 0) | (j != 0)) & ~escaped)

    def body(carry):
        s, i, j, escaped, buf = carry
        (i2, j2, esc2), out = step((i, j, escaped))
        buf = jax.lax.dynamic_update_slice(buf, out[None, :], (s, 0))
        return (s + 1, i2, j2, esc2, buf)

    init = (jnp.int32(0), m, n, jnp.zeros((B,), bool), buf0)
    _, fi, fj, escaped, outs = jax.lax.while_loop(cond, body, init)
    escaped = escaped | (fi != 0) | (fj != 0)
    return outs, escaped


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cap, W = 640, 128
    slots = cap // 16
    rngm = np.random.default_rng(1)
    bits = (rngm.random((slots, W, B, 16)) < 0.12).astype(np.int64)
    ops = rngm.integers(1, 3, (slots, W, B, 16))
    words = np.zeros((slots, W, B), np.int64)
    for u in range(16):
        words |= (bits[..., u] * ops[..., u]) << (2 * u)
    mj = jax.device_put(words.astype(np.int32))
    m = np.full(B, 500, np.int32)
    n = np.full(B, 500, np.int32)

    def timeit(fn, reps=5):
        def force():
            r = fn()
            return [np.asarray(jnp.max(x))
                    for x in jax.tree_util.tree_leaves(r)]
        force()
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            force()
            ts.append(time.monotonic() - t0)
        return sorted(ts)[len(ts) // 2]

    E = rle_events(cap, cap, W)
    dt1 = timeit(lambda: walk_moves_rle_t(mj, m, n, m_cap=cap, n_cap=cap,
                                          w_band=W, max_events=E))
    print(f"walk with outs.T   : {dt1*1e3:7.1f} ms")
    dt2 = timeit(lambda: walk_rle_not(mj, m, n, m_cap=cap, n_cap=cap,
                                      w_band=W, max_events=E))
    print(f"walk transposed out: {dt2*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
