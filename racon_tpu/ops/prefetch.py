"""Background device->host payload prefetch shared by the TPU stages.

On a degraded tethered link every blocking payload fetch (np.asarray on a
jax array) pays a fixed sync round trip of ~200-300 ms on top of the
bandwidth cost; fetched inline on the stage thread those latencies SUM
(the r4 consensus headline fell 749 -> 388 w/s on exactly this — 12
fetches/run, profiled as device_wait_s in BENCH_LEDGER). Submitting the
fetch to a small worker pool right after dispatch lets the latencies
overlap each other, the device compute, and the host merge/decode: the
workers block in np.asarray with the GIL released.

This is the role the reference's producer/consumer batch overlap plays
for its CUDA batches (src/cuda/cudapolisher.cpp:83-144,254-333), done
the host-runtime way: the device work is already async under jax; only
the host-side drain needed unserializing.

RACON_TPU_FETCH_THREADS sizes the pool (default 4; 0 disables prefetch —
fetches then block inline at drain time, the pre-r5 behavior).
"""

from __future__ import annotations

import os

import numpy as np

_pool = None


def submit(payload):
    """Start pulling `payload` to host on a worker thread. Returns a
    Future, or None when prefetch is disabled (caller then fetches
    inline with np.asarray)."""
    global _pool
    try:
        n = int(os.environ.get("RACON_TPU_FETCH_THREADS", 4))
    except ValueError:
        n = 4
    if n <= 0:
        return None
    if _pool is None:
        import concurrent.futures

        _pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(2, min(n, 8)),
            thread_name_prefix="racon-fetch")
    return _pool.submit(np.asarray, payload)


def resolve(payload, fut) -> np.ndarray:
    """The host copy of a dispatched payload: the prefetched result when
    a worker pulled it, else a blocking inline fetch."""
    return fut.result() if fut is not None else np.asarray(payload)
