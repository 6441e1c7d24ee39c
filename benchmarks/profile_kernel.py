"""Raw device align+walk throughput for one tier shape: how fast is the
fused dispatch itself (H2D + NW kernel + walk + D2H), excluding all host
pipeline work. Run on the real chip.

Usage: python benchmarks/profile_kernel.py [B] [cap] [band]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    from racon_tpu.ops.nw_kernel import (align_walk_padded, pack_codes4,
                                         pack_delbits, PAD_CODE)

    rng = np.random.default_rng(0)
    hi = min(520, cap)
    mlen = rng.integers(hi - 100, hi, B).astype(np.int32)
    nlen = (mlen + rng.integers(-20, 20, B)).astype(np.int32)
    q8 = np.full((B, cap), PAD_CODE, np.int8)
    t8 = np.full((B, cap), PAD_CODE, np.int8)
    for i in range(B):
        q8[i, : mlen[i]] = rng.integers(0, 4, mlen[i])
        t8[i, : nlen[i]] = rng.integers(0, 4, nlen[i])
        # make them mostly alignable (copy with noise)
        L = min(mlen[i], nlen[i])
        t8[i, :L] = q8[i, :L]
    dc8 = np.full((B, cap), -8, np.int8)

    q4 = pack_codes4(q8)
    t4 = pack_codes4(t8)
    dcb = pack_delbits(dc8)

    # warm-up/compile
    payload, score, fmt = align_walk_padded(
        q4, t4, dcb, mlen, nlen, m_cap=cap, n_cap=cap, w_band=W,
        match=5, mismatch=-4, gap=-8, prepacked=True)
    np.asarray(payload)

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        payload, score, fmt = align_walk_padded(
            q4, t4, dcb, mlen, nlen, m_cap=cap, n_cap=cap, w_band=W,
            match=5, mismatch=-4, gap=-8, prepacked=True)
        np.asarray(payload)  # block
        times.append(time.monotonic() - t0)
    dt = sorted(times)[len(times) // 2]
    cells = B * cap * W
    print(f"B={B} cap={cap} W={W} fmt={fmt}: {dt*1e3:.1f} ms/dispatch, "
          f"{B/dt:.0f} items/s, {cells/dt/1e9:.1f} Gcell/s  "
          f"times={[f'{t*1e3:.0f}' for t in times]}")


if __name__ == "__main__":
    main()
