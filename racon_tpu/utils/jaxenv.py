"""JAX process-level setup shared by the TPU stages.

The CLI is a batch tool (one process per run, reference: src/main.cpp), so
without a persistent compilation cache every run would re-pay full XLA
compilation of the kernel tiers (minutes on a tethered chip). The cache
keys on program + compile options, and the stage's canonical (cap, band)
tiers keep the program set small and stable across inputs.
"""

from __future__ import annotations

import os

_done = False


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
