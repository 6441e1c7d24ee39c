#!/usr/bin/env python
"""Device-timeline profile of one big-tier (overlap alignment) dispatch:
where do the ava stage's device seconds go — sweep, walk while-loop, or
panel prep? Uses the same jax-profiler method as bench._trace_device_ms."""

import collections
import glob
import gzip
import json
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from racon_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

from racon_tpu.ops.nw_kernel import (  # noqa: E402
    align_walk_rle_batch, pack_codes4, pack_delbits)


def main(B=256, cap=10240, band=1024, err=0.15, reps=2):
    rng = np.random.default_rng(7)
    t8 = rng.integers(0, 4, (B, cap)).astype(np.int8)
    q8 = t8.copy()
    sub = rng.random((B, cap)) < err
    q8[sub] = rng.integers(0, 4, int(sub.sum()))
    m = np.full(B, cap - 128, np.int32)
    n = np.full(B, cap - 128, np.int32)
    q4, t4 = pack_codes4(q8), pack_codes4(t8)
    dcb = pack_delbits(np.full((B, cap), -1, np.int8))
    kw = dict(m_cap=cap, n_cap=cap, w_band=band, match=0, mismatch=-1,
              gap=-1)

    out = align_walk_rle_batch(q4, t4, dcb, m, n, **kw)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        outs = [align_walk_rle_batch(q4, t4, dcb, m, n, **kw)
                for _ in range(reps)]
        jax.block_until_ready(outs)
        jax.profiler.stop_trace()
        f = glob.glob(td + "/**/*.trace.json.gz", recursive=True)[0]
        evs = json.load(gzip.open(f)).get("traceEvents", [])
    pids = {e["pid"]: e.get("args", {}).get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, nm in pids.items()
           if "TPU" in nm or "device" in nm.lower()}
    tot = collections.defaultdict(float)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev:
            tot[e["name"]] += float(e.get("dur", 0.0))
    for nm, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{nm[:70]:70s} {dur/reps/1e3:10.2f} ms/dispatch")


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v) if v.isdigit() else float(v)
    main(**kwargs)
