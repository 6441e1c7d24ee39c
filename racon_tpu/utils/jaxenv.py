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
    (the axon tunnel) rather than a local PCIe attach, by backend NAME.
    Only a fallback hint: routing consults the MEASURED link probe
    (slow_link / link_probe_ms) and uses this sniff only when no
    measurement is available."""
    try:
        from jax._src import xla_bridge

        return "axon" in xla_bridge.backends()
    except Exception:
        return False


# measured link probe: sync+D2H round trip for a 4 MB payload, the same
# quantity bench.py stamps every ledger with. Payload-size routing
# tradeoffs (device-gather vs dense uplink, Myers rows payload vs scored
# compact payloads) key on this number, not on the backend name: a local
# PCIe attach measures ~1-5 ms, the axon tunnel 25-800 ms session-
# dependent (docs/PERF.md "The tunnel lies to wall clocks").
_probe = {"ms": None, "measured": False, "logged": False}
_probe_lock = threading.Lock()

SLOW_LINK_MS_DEFAULT = 20.0  # ms per 4 MB sync D2H


def _measure_probe_ms() -> float:
    """One-time 4 MB sync D2H measurement (min of 3; a fresh jit output
    per rep so jax cannot serve a cached host copy)."""
    import time as _time

    import numpy as np
    import jax

    x = jax.device_put(np.zeros((4096, 1024), np.uint8))
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))  # compile + first-touch of the D2H path
    best = float("inf")
    for _ in range(3):
        t0 = _time.perf_counter()
        np.asarray(f(x))
        best = min(best, _time.perf_counter() - t0)
    return best * 1e3


def _probe_inline() -> None:
    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            _probe["ms"] = 0.0  # host-local backend: nothing to probe
        else:
            _probe["ms"] = _measure_probe_ms()
    except Exception:
        _probe["ms"] = None
    _probe["measured"] = True


def link_probe_ms(timeout: float = 30.0) -> float | None:
    """Measured (cached per-process) ms per 4 MB sync D2H round trip, or
    the RACON_TPU_LINK_MS override, or None when no measurement could be
    made (routing then falls back to the backend-name sniff). The
    measurement normally runs on the warmup_async daemon thread so it
    overlaps input parsing; this call joins it (bounded)."""
    v = os.environ.get("RACON_TPU_LINK_MS")
    if v:
        try:
            return float(v)
        except ValueError:
            pass
    if not _probe["measured"]:
        if _warm is not None:
            _warm.join(timeout)
        with _probe_lock:
            if not _probe["measured"]:
                _probe_inline()
    return _probe["ms"]


def slow_link() -> bool:
    """True when the measured link cost says payload-size tradeoffs
    invert (device-gather uplink saving wins; Myers rows payloads lose at
    long caps). Threshold: RACON_TPU_SLOW_LINK_MS ms per 4 MB sync D2H
    (default 20 — local PCIe measures ~1-5, tunnels 25-800). The probe
    value and threshold are logged once so routing is auditable."""
    import sys

    thresh = SLOW_LINK_MS_DEFAULT
    try:
        thresh = float(os.environ.get("RACON_TPU_SLOW_LINK_MS", thresh))
    except ValueError:
        pass
    ms = link_probe_ms()
    if ms is None:
        return tunneled_link()
    if not _probe["logged"]:
        _probe["logged"] = True
        sys.stderr.write(
            f"[racon_tpu] link probe {ms:.1f} ms/4MB "
            f"(slow-link threshold {thresh:g} ms) -> "
            f"{'slow' if ms >= thresh else 'fast'}-link routing\n")
    return ms >= thresh


def warmup_async() -> None:
    """Open the device link early: on a tethered/tunneled chip the FIRST
    host<->device roundtrip of a process can cost tens of seconds (link
    bring-up + server-side init). Kick it off on a daemon thread so it
    overlaps with input parsing instead of blocking the first real batch.
    The thread also measures the 4 MB link probe routing keys on."""
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
        with _probe_lock:
            if not _probe["measured"]:
                _probe_inline()

    _warm = threading.Thread(target=_ping, daemon=True)
    _warm.start()


def warmup_wait(timeout: float | None = None) -> None:
    if _warm is not None:
        _warm.join(timeout)
