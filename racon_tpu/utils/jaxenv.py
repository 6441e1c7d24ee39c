"""JAX process-level setup shared by the TPU stages.

The CLI is a batch tool (one process per run, reference: src/main.cpp), so
without a persistent compilation cache every run would re-pay full XLA
compilation of the kernel tiers (minutes on a tethered chip). The cache
keys on program + compile options, and the stage's canonical (cap, band)
tiers keep the program set small and stable across inputs.
"""

from __future__ import annotations

import os
import threading

_done = False
_warm = None


def setup_jax() -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "RACON_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "racon_tpu", "jax"))
    if cache_dir:  # RACON_TPU_JAX_CACHE="" disables
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


def tunneled_link() -> bool:
    """True when the chip sits behind a high-latency/low-bandwidth proxy
    (the axon tunnel) rather than a local PCIe attach. Payload-size
    tradeoffs invert on such links (docs/PERF.md "The tunnel lies to
    wall clocks"); routing policies may consult this."""
    try:
        from jax._src import xla_bridge

        return "axon" in xla_bridge.backends()
    except Exception:
        return False


def warmup_async() -> None:
    """Open the device link early: on a tethered/tunneled chip the FIRST
    host<->device roundtrip of a process can cost tens of seconds (link
    bring-up + server-side init). Kick it off on a daemon thread so it
    overlaps with input parsing instead of blocking the first real batch."""
    global _warm
    if _warm is not None:
        return

    def _ping():
        try:
            import numpy as np
            import jax
            np.asarray(jax.device_put(np.zeros(8, np.uint8)))
        except Exception:
            pass

    _warm = threading.Thread(target=_ping, daemon=True)
    _warm.start()


def warmup_wait(timeout: float | None = None) -> None:
    if _warm is not None:
        _warm.join(timeout)
