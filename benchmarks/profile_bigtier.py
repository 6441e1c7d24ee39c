"""Can the t8 transposed kernel run the align-stage big tiers directly?
Times nw_band_batch_t8 + RLE walk at (cap, W) vs the lane-major fallback
currently used there. Usage: profile_bigtier.py [B] [cap] [W]"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from racon_tpu.ops import nw_kernel as nk


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 10240
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    rng = np.random.default_rng(0)
    m = np.full(B, int(cap * 0.78), np.int32)
    n = (m + rng.integers(-40, 40, B)).astype(np.int32)
    q8 = np.full((B, cap), nk.PAD_CODE, np.int8)
    t8 = np.full((B, cap), nk.PAD_CODE, np.int8)
    for i in range(B):
        q8[i, : m[i]] = rng.integers(0, 4, m[i])
        L = min(m[i], n[i])
        t8[i, : n[i]] = rng.integers(0, 4, n[i])
        t8[i, :L] = q8[i, :L]
        # sprinkle ~12% errors so runs look ONT-like
        errs = rng.choice(L, L // 8, replace=False)
        t8[i, errs] = rng.integers(0, 4, len(errs))
    q4 = nk.pack_codes4(q8)
    t4 = nk.pack_codes4(t8)
    dcb = np.full((B, cap // 8), 0xFF, np.uint8)

    def timeit(fn, reps=3):
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

    kw = dict(m_cap=cap, n_cap=cap, w_band=W, match=0, mismatch=-1, gap=-1)

    # transposed + RLE walk (big-tier pre-windowed kernel when the full
    # panels don't fit)
    try:
        t0 = time.monotonic()
        core = (nk.align_walk_packed_core_rle_t
                if nk.t_kernel_fits(cap, cap, W)
                else nk.align_walk_packed_core_rle_tbig)
        print(f"core: {core.__name__}")
        fused = jax.jit(functools.partial(core, **kw))
        r = fused(q4, t4, dcb, m, n)
        jax.block_until_ready(r)
        print(f"t8 compile+first: {time.monotonic()-t0:.1f}s")
        dt = timeit(lambda: fused(q4, t4, dcb, m, n))
        print(f"t8 fused rle     : {dt*1e3:8.1f} ms for B={B}")
    except Exception as e:
        print(f"t8 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # production fallback (lane-major + packed2 walk)
    try:
        t0 = time.monotonic()
        r = nk.align_walk_batch(q4, t4, dcb, m, n, **kw)
        jax.block_until_ready(r)
        print(f"fallback compile+first: {time.monotonic()-t0:.1f}s")
        dt = timeit(lambda: nk.align_walk_batch(q4, t4, dcb, m, n, **kw))
        print(f"lane-major+packed walk: {dt*1e3:8.1f} ms for B={B}")
    except Exception as e:
        print(f"fallback FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
