"""TPU consensus stage (interpreted kernel on CPU) vs native backend."""

import numpy as np
import pytest

from racon_tpu.models.polish_model import PolisherConfig
from racon_tpu.native import loader

if not loader.available():
    pytest.skip("native runtime unavailable", allow_module_level=True)

from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
from racon_tpu.native.consensus_stage import NativeConsensusStage
from racon_tpu.polisher import create_polisher
from racon_tpu.utils.logger import Logger


def _build_windows(tmp_path, seed=5, n_reads=14, glen=900, wlen=150):
    rng = np.random.default_rng(seed)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    true = rng.choice(ACGT, glen)
    draft = true.copy()
    for pos in rng.choice(glen, 12, replace=False):
        draft[pos] = rng.choice(ACGT)
    # delete a few bases from the draft so insertions must be recovered
    draft = np.delete(draft, rng.choice(glen, 5, replace=False))
    reads, paf = [], []
    for r in range(n_reads):
        s = int(rng.integers(0, 120))
        e = int(rng.integers(glen - 120, glen))
        read = true[s:e].copy()
        for pos in rng.choice(len(read), len(read) // 40, replace=False):
            read[pos] = rng.choice(ACGT)
        reads.append((b"r%d" % r, read.tobytes()))
        paf.append(b"\t".join([
            b"r%d" % r, b"%d" % len(read), b"0", b"%d" % len(read), b"+",
            b"ctg", b"%d" % len(draft), b"%d" % s,
            b"%d" % min(len(draft), e), b"9", b"9", b"60"]))
    (tmp_path / "reads.fasta").write_bytes(
        b"".join(b">" + n + b"\n" + d + b"\n" for n, d in reads))
    (tmp_path / "ovl.paf").write_bytes(b"\n".join(paf) + b"\n")
    (tmp_path / "draft.fasta").write_bytes(b">ctg\n" + draft.tobytes() + b"\n")
    cfg = PolisherConfig(backend="native", num_threads=2, window_length=wlen,
                         match=5, mismatch=-4, gap=-8)
    p = create_polisher(str(tmp_path / "reads.fasta"),
                        str(tmp_path / "ovl.paf"),
                        str(tmp_path / "draft.fasta"), cfg)
    p.initialize()
    return p, cfg, true


def test_tpu_stage_matches_native(tmp_path):
    p, cfg, true = _build_windows(tmp_path)
    native = NativeConsensusStage(cfg)
    want_cons, want_pol = native.consensus_windows(p.windows, cfg, Logger())

    cfg_tpu = PolisherConfig(**{**cfg.__dict__, "backend": "tpu"})
    tpu = TpuConsensusStage.try_create(cfg_tpu)
    assert tpu is not None
    got_cons, got_pol = tpu.consensus_windows(p.windows, cfg_tpu, Logger())

    assert got_pol == want_pol
    n_diff = sum(1 for a, b in zip(got_cons, want_cons) if a != b)
    # banded device DP can tie-break differently near band edges; demand
    # near-total agreement and identical total length scale
    assert n_diff <= 1, f"{n_diff} of {len(want_cons)} windows differ"

    # and quality: stitched consensus close to the truth
    from racon_tpu.native import bindings
    full = b"".join(got_cons)
    d = bindings.edit_distance(full, true.tobytes())
    assert d <= 8


def test_tpu_stage_polish_quality(tmp_path):
    """Full pipeline with the TPU stage (interpreted): corrects the draft."""
    from racon_tpu.native import bindings
    p, cfg, true = _build_windows(tmp_path, seed=9)
    cfg_tpu = PolisherConfig(**{**cfg.__dict__, "backend": "tpu",
                                "trim": False})
    tpu = TpuConsensusStage.try_create(cfg_tpu)
    cons, pol = tpu.consensus_windows(p.windows, cfg_tpu, Logger())
    full = b"".join(cons)
    d = bindings.edit_distance(full, true.tobytes())
    assert d <= 8


def test_gather_form_per_cohort_blobs_match_dense(tmp_path, monkeypatch):
    """RACON_TPU_DEVGATHER=1 routes through the device-resident gather
    dispatch; r5 made the layer blob per-COHORT (compact offsets via
    rebase_dev) to break the 2^31 gather-index ceiling. Forced 2-cohort
    gather output must match the dense-path output byte-for-byte (same
    kernel semantics, different uplink form)."""
    p, cfg, true = _build_windows(tmp_path, seed=11)
    cfg_tpu = PolisherConfig(**{**cfg.__dict__, "backend": "tpu"})
    tpu = TpuConsensusStage.try_create(cfg_tpu)
    assert tpu is not None

    monkeypatch.setenv("RACON_TPU_DEVGATHER", "0")
    want_cons, want_pol = tpu.consensus_windows(p.windows, cfg_tpu, Logger())

    monkeypatch.setenv("RACON_TPU_DEVGATHER", "1")
    monkeypatch.setenv("RACON_TPU_COHORTS", "2")
    got_cons, got_pol = tpu.consensus_windows(p.windows, cfg_tpu, Logger())

    assert got_pol == want_pol
    assert got_cons == want_cons

    # a tiny per-cohort element cap must force MORE cohorts (the 2^31
    # ceiling scaled down) and still reproduce the same bytes
    monkeypatch.delenv("RACON_TPU_COHORTS")
    monkeypatch.setenv("RACON_TPU_GATHER_BLOB_ELEMS", "512")
    got_cons2, got_pol2 = tpu.consensus_windows(p.windows, cfg_tpu,
                                                Logger())
    assert got_pol2 == want_pol
    assert got_cons2 == want_cons


def test_accelerator_depth_cap_and_band_knobs():
    """--max-window-depth caps layers per window on the accelerator path
    (reference GPU MAX_DEPTH_PER_WINDOW, src/cuda/cudapolisher.cpp:226);
    --band-width sets a minimum device band for overlap alignment."""
    import numpy as np
    from racon_tpu.core.store import SequenceStore
    from racon_tpu.core.windows import WindowSet, WINDOW_TYPE_TGS
    from racon_tpu.ops.consensus_stage_tpu import _StaticItems
    import racon_tpu.ops.align_stage_tpu as astm
    from racon_tpu.models.polish_model import PolisherConfig

    # tiny store: one 100bp target + 8 reads of 100bp
    parts = [np.full(100, 65, np.uint8)] * 9
    off = np.arange(10, dtype=np.int64) * 100
    store = SequenceStore([b"t"] + [b"r%d" % i for i in range(8)],
                          np.concatenate(parts), off,
                          np.zeros(0, np.uint8), np.zeros(10, np.int64))
    ws = WindowSet(store, 1, 100, WINDOW_TYPE_TGS)
    bp = np.array([[0, 0, 99, 99]], np.int64)  # (t_first, q_first, t_last, q_last)
    for r in range(8):
        ws.assign_overlap(bp, r + 1, 0, False, 10.0)
    ws.freeze()
    st_all = _StaticItems(ws, [0])
    st_cap = _StaticItems(ws, [0], depth_cap=3)
    assert st_all.n_items == 8 and st_cap.n_items == 3

    # band knob: only tiers with band >= requested survive
    cfg = PolisherConfig(band_width=2048)
    stage = astm.TpuAlignStage(cfg, interpret=True)
    tiers = astm._TIERS
    filtered = tuple(t for t in tiers if t[1] >= cfg.band_width)
    assert filtered and all(b >= 2048 for _, b in filtered)


def test_prefetch_pool_and_disable(monkeypatch):
    """ops/prefetch basics: RACON_TPU_FETCH_THREADS=0 disables the pool
    (callers then fetch inline), a positive count returns a future whose
    resolve() yields the host array; resolve(payload, None) is the
    inline path."""
    import numpy as np

    from racon_tpu.ops import prefetch

    monkeypatch.setenv("RACON_TPU_FETCH_THREADS", "0")
    assert prefetch.submit(np.arange(4)) is None
    arr = np.arange(4)
    assert np.array_equal(prefetch.resolve(arr, None), arr)

    monkeypatch.setenv("RACON_TPU_FETCH_THREADS", "2")
    fut = prefetch.submit(np.arange(3))
    assert fut is not None
    assert np.array_equal(prefetch.resolve(None, fut), np.arange(3))

    # malformed env falls back to the default worker count
    monkeypatch.setenv("RACON_TPU_FETCH_THREADS", "bogus")
    fut = prefetch.submit(np.arange(2))
    assert fut is not None and np.array_equal(fut.result(), np.arange(2))
