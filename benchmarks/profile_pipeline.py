"""Do back-to-back fused dispatches pipeline through the tunnel, or
serialize? Times 1 chunk sync vs N chunks dispatched then drained."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from racon_tpu.ops.nw_kernel import (align_walk_rle_batch, pack_codes4,
                                     pack_delbits, PAD_CODE)


def make(B, cap, seed):
    rng = np.random.default_rng(seed)
    hi = min(520, cap)
    mlen = rng.integers(hi - 100, hi, B).astype(np.int32)
    nlen = np.minimum(mlen + rng.integers(-20, 20, B), cap).astype(np.int32)
    q8 = np.full((B, cap), PAD_CODE, np.int8)
    t8 = np.full((B, cap), PAD_CODE, np.int8)
    for i in range(B):
        q8[i, : mlen[i]] = rng.integers(0, 4, mlen[i])
        L = min(mlen[i], nlen[i])
        t8[i, : nlen[i]] = rng.integers(0, 4, nlen[i])
        t8[i, :L] = q8[i, :L]
    dc8 = np.full((B, cap), -8, np.int8)
    return (pack_codes4(q8), pack_codes4(t8), pack_delbits(dc8), mlen, nlen)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cap, W = 640, 128
    chunks = [make(B, cap, s) for s in range(4)]

    def dispatch(c):
        payload, score, fmt = align_walk_rle_batch(
            c[0], c[1], c[2], c[3], c[4], m_cap=cap, n_cap=cap, w_band=W,
            match=5, mismatch=-4, gap=-8), None, None
        return payload[0]

    # warm
    np.asarray(dispatch(chunks[0])[0])

    # single chunk, synchronized
    for trial in range(2):
        t0 = time.monotonic()
        p = dispatch(chunks[0])[0]
        np.asarray(p)
        print(f"1 chunk sync: {(time.monotonic()-t0)*1e3:.0f} ms")

    # 4 chunks dispatched back-to-back, then drained in order
    for trial in range(2):
        t0 = time.monotonic()
        ps = [dispatch(c)[0] for c in chunks]
        t1 = time.monotonic()
        for p in ps:
            p.copy_to_host_async()
        for p in ps:
            np.asarray(p)
        t2 = time.monotonic()
        print(f"4 chunks: dispatch={1e3*(t1-t0):.0f} ms  "
              f"drain={1e3*(t2-t1):.0f} ms  total={1e3*(t2-t0):.0f} ms")


if __name__ == "__main__":
    main()
