"""Multi-chip scale-out: window/overlap batches sharded over a device mesh.

The reference's only parallelism is one process's thread pool plus optional
multi-GPU batch queues (SURVEY.md sec 2.3). Here the unit of distribution is
the same as the device batch: padded alignment items (window layers or
overlap slices). They are embarrassingly parallel, so the mapping is a 1-D
mesh over all chips with the batch dimension sharded -- no collectives in the
hot loop; XLA keeps each shard's kernel local to its chip. Hosts gather
consensus bytes for stitching (DCN, outside the hot loop; multi-host entry
via jax.distributed.initialize()).

dryrun_multichip in __graft_entry__.py validates this path on a virtual CPU
mesh.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: check_rep was renamed/replaced by check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.nw_kernel import (align_walk_gather_core, align_walk_gather_core_t,
                             align_walk_gather_core_rows_t,
                             align_walk_packed_core, align_walk_packed_core_t,
                             align_walk_packed_core_rle_t,
                             align_walk_packed_core_rle_tbig,
                             align_walk_packed_core_rows_t, nw_band_batch,
                             nw_band_batch_ref, t_big_fits, t_kernel_fits,
                             walk_moves_device, B_LANE)


def _nw_impl(interpret):
    """Kernel selection: the Pallas kernel on real chips; its pure-jax twin
    (bit-identical outputs, see nw_kernel.nw_band_batch_ref) on CPU meshes,
    where interpret-mode pallas_call deadlocks under multi-device SPMD."""
    if interpret:
        return functools.partial(nw_band_batch_ref)
    return functools.partial(nw_band_batch, interpret=False)


def distributed_init(**kwargs) -> None:
    """Multi-host entry: initialize jax.distributed (DCN) before building
    the mesh, so window_mesh() spans every host's chips. Each host feeds
    its own input shard; host 0 gathers consensus bytes for stitching.
    No-op when already initialized (reference has no distributed mode —
    SURVEY.md sec 2.3/5.8 defines this mapping)."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def window_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis "win" shards batches."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("win",))


def sharded_nw_band_batch(mesh: Mesh, q, t, gc, *, m_cap, n_cap, w_band,
                          match, mismatch, gap, interpret=False):
    """Run the banded-NW kernel with the batch dim sharded over the mesh.

    Each chip processes its local shard with the single-chip Pallas kernel;
    there is no cross-chip communication (pure data parallelism over windows,
    the TPU analog of the reference's multi-GPU batch queues).
    """
    n_dev = mesh.devices.size
    impl = _nw_impl(interpret)

    def local(qs, ts, gcs):
        return impl(qs, ts, gcs, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
                    match=match, mismatch=mismatch, gap=gap)

    fn = shard_map(local, mesh=mesh, in_specs=(P("win"), P("win"), P("win")),
                   out_specs=(P("win"), P("win")), check_rep=False)
    assert q.shape[0] % n_dev == 0, "pad batch to a multiple of mesh size"
    return fn(q, t, gc)


_active_mesh_cache: list = []


def set_active_mesh(mesh: "Mesh | None") -> None:
    """Explicitly pin (or clear, with None+clear()) the stage-dispatch mesh
    for this process — the supported override for harnesses that build
    their own mesh (e.g. __graft_entry__.dryrun_multichip) instead of
    reaching into the cache."""
    _active_mesh_cache.clear()
    _active_mesh_cache.append(mesh)


def clear_active_mesh() -> None:
    """Drop the pinned/derived mesh so the next active_mesh() re-derives
    it from the current device topology."""
    _active_mesh_cache.clear()


def active_mesh() -> Mesh | None:
    """Mesh over this process's devices when more than one is present (the
    production stages shard their batches over it); None single-device.
    Under multi-host (jax.distributed) the mesh spans LOCAL devices only:
    work is already sharded per process by parallel/dist.py, and each
    process dispatches its own shard onto its own chips (the v5e-pod
    topology of SURVEY.md §5.8 — dist over DCN x local mesh over ICI).
    RACON_TPU_MESH=0 disables."""
    import os

    if _active_mesh_cache:
        return _active_mesh_cache[0]
    mesh = None
    if os.environ.get("RACON_TPU_MESH", "1") != "0":
        try:
            devices = (jax.local_devices() if jax.process_count() > 1
                       else jax.devices())
            if len(devices) > 1:
                mesh = window_mesh(devices)
        except Exception:
            mesh = None
    _active_mesh_cache.append(mesh)
    return mesh


_sharded_cache: dict = {}


def sharded_align_walk(mesh: Mesh, q4, t4, dcb, m, n, *, m_cap, n_cap,
                       w_band, match, mismatch, gap, interpret=False,
                       fmt="packed2"):
    """The production fused align+walk dispatch with the batch dimension
    sharded over the mesh — each chip unpacks + runs the single-chip Pallas
    kernel on its shard; no cross-chip communication (pure window/overlap
    data parallelism, the TPU analog of the reference's multi-GPU batch
    queues, src/cuda/cudapolisher.cpp:165-180). Inputs are uplink-packed
    (nw_kernel.pack_codes4 / pack_delbits); the batch must be a multiple of
    the mesh size (align_walk_padded arranges both)."""
    key = (tuple(mesh.devices.flat), m_cap, n_cap, w_band, match, mismatch,
           gap, interpret, fmt)
    fn = _sharded_cache.get(key)
    if fn is None:
        impl = _nw_impl(interpret)

        def local(q4s, t4s, dcbs, ms, ns):
            # shapes are trace-time constants, so this picks per batch shape
            eligible = (not interpret and t_kernel_fits(m_cap, n_cap, w_band)
                        and q4s.shape[0] % B_LANE == 0)
            big = (not interpret and t_big_fits(m_cap, n_cap, w_band)
                   and q4s.shape[0] % B_LANE == 0)
            if fmt == "myers":
                # edit-distance align tiers: the Myers bit-parallel
                # kernel per shard (dcbs unused — uniform unit deletion
                # costs are the eligibility contract). CPU mesh shards
                # run the jnp twin (interpret-mode pallas deadlocks
                # under SPMD).
                kwm = dict(m_cap=m_cap, n_cap=n_cap, w_band=w_band)
                if interpret:
                    from ..ops.myers_kernel import align_walk_myers_ref
                    from ..ops.nw_kernel import _expand_nib_T
                    import jax.numpy as jnp

                    qT = _expand_nib_T(q4s.T, m_cap).astype(jnp.int32)
                    tT = _expand_nib_T(t4s.T, n_cap).astype(jnp.int32)
                    return align_walk_myers_ref(qT, tT, ms, ns, **kwm)
                from ..ops.myers_kernel import align_walk_myers_batch

                return align_walk_myers_batch(q4s, t4s, ms, ns, **kwm)
            if fmt == "rows":
                assert eligible or big, ("rows payloads need a transposed "
                                         "kernel")
                return align_walk_packed_core_rows_t(
                    q4s, t4s, dcbs, ms, ns, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap,
                    big=not eligible)
            if fmt == "rle":
                assert eligible or big, ("rle payloads need a transposed "
                                         "kernel")
                core = (align_walk_packed_core_rle_t if eligible
                        else align_walk_packed_core_rle_tbig)
                return core(
                    q4s, t4s, dcbs, ms, ns, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap)
            if eligible:
                # real chips run the transposed (sublane-band) kernel
                return align_walk_packed_core_t(
                    q4s, t4s, dcbs, ms, ns, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap)
            return align_walk_packed_core(
                q4s, t4s, dcbs, ms, ns, m_cap=m_cap, n_cap=n_cap,
                w_band=w_band, match=match, mismatch=mismatch, gap=gap,
                nw_fn=impl)

        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P("win"), P("win"), P("win"), P("win"), P("win")),
            out_specs=(P("win"), P("win")), check_rep=False))
        _sharded_cache[key] = fn
    return fn(q4, t4, dcb, m, n)


_sharded_gather_cache: dict = {}


def sharded_align_walk_gather(mesh: Mesh, qblob4, tblob4, dcbits, meta, *,
                              m_cap, n_cap, w_band, match, mismatch, gap,
                              interpret=False, fmt="packed2"):
    """Device-resident gather variant of sharded_align_walk: the flat code
    blobs are REPLICATED over the mesh (uploaded once per pass via
    nw_kernel.device_put_blob) and only the (B, 4) per-item metadata is
    sharded; each chip gathers its own row matrices locally — still no
    cross-chip communication in the hot loop."""
    key = (tuple(mesh.devices.flat), m_cap, n_cap, w_band, match, mismatch,
           gap, interpret, fmt)
    fn = _sharded_gather_cache.get(key)
    if fn is None:
        impl = _nw_impl(interpret)

        def local(qb, tb, db, metas):
            if fmt == "rows":
                return align_walk_gather_core_rows_t(
                    qb, tb, db, metas, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap)
            if fmt == "rle":
                from ..ops.nw_kernel import align_walk_gather_core_rle_t

                return align_walk_gather_core_rle_t(
                    qb, tb, db, metas, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap)
            if not interpret and t_kernel_fits(m_cap, n_cap, w_band):
                # real chips run the transposed (sublane-band) kernel
                return align_walk_gather_core_t(
                    qb, tb, db, metas, m_cap=m_cap, n_cap=n_cap,
                    w_band=w_band, match=match, mismatch=mismatch, gap=gap)
            return align_walk_gather_core(
                qb, tb, db, metas, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
                match=match, mismatch=mismatch, gap=gap, nw_fn=impl)

        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P("win")),
            out_specs=(P("win"), P("win")), check_rep=False))
        _sharded_gather_cache[key] = fn
    return fn(qblob4, tblob4, dcbits, meta)


def polish_step_sharded(mesh: Mesh, *, m_cap, n_cap, w_band, match, mismatch,
                        gap, interpret=False):
    """The full device-side polish step (align + traceback walk), sharded.

    Returns a jitted fn (q, t, gc, m, n) -> (op code streams, escape flags),
    i.e. everything the device contributes per refinement round; graph merge
    and stitching stay on the hosts.
    """

    impl = _nw_impl(interpret)

    def local(qs, ts, gcs, ms, ns):
        moves, score = impl(
            qs, ts, gcs, m_cap=m_cap, n_cap=n_cap, w_band=w_band, match=match,
            mismatch=mismatch, gap=gap)
        codes, escaped = walk_moves_device(
            moves, ms, ns, m_cap=m_cap, n_cap=n_cap, w_band=w_band,
            max_steps=m_cap + n_cap)
        return codes, escaped, score

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("win"), P("win"), P("win"), P("win"), P("win")),
                   out_specs=(P("win"), P("win"), P("win")), check_rep=False)
    return jax.jit(fn)
