"""TPU overlap-alignment stage (interpreted on CPU) vs native backend."""

import numpy as np
import pytest

from racon_tpu.models.polish_model import PolisherConfig
from racon_tpu.native import loader

if not loader.available():
    pytest.skip("native runtime unavailable", allow_module_level=True)

from racon_tpu.ops.align_stage_tpu import TpuAlignStage
from racon_tpu.native.align_stage import NativeAlignStage
from racon_tpu.polisher import create_polisher
from racon_tpu.utils.logger import Logger


def _build(tmp_path, seed=21):
    rng = np.random.default_rng(seed)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    glen = 700
    true = rng.choice(ACGT, glen)
    draft = true.copy()
    for pos in rng.choice(glen, 8, replace=False):
        draft[pos] = rng.choice(ACGT)
    reads, paf = [], []
    for r in range(10):
        s = int(rng.integers(0, 80))
        e = int(rng.integers(glen - 80, glen))
        read = true[s:e].copy()
        for pos in rng.choice(len(read), len(read) // 30, replace=False):
            read[pos] = rng.choice(ACGT)
        if r % 2:  # reverse-strand overlaps exercise revcomp coordinates
            rc = read[::-1].copy()
            comp = np.frombuffer(bytes(rc).translate(
                bytes.maketrans(b"ACGT", b"TGCA")), np.uint8)
            reads.append((b"r%d" % r, comp.tobytes()))
            strand = b"-"
        else:
            reads.append((b"r%d" % r, read.tobytes()))
            strand = b"+"
        paf.append(b"\t".join([
            b"r%d" % r, b"%d" % len(read), b"0", b"%d" % len(read), strand,
            b"ctg", b"%d" % glen, b"%d" % s, b"%d" % e, b"9", b"9", b"60"]))
    (tmp_path / "reads.fasta").write_bytes(
        b"".join(b">" + n + b"\n" + d + b"\n" for n, d in reads))
    (tmp_path / "ovl.paf").write_bytes(b"\n".join(paf) + b"\n")
    (tmp_path / "draft.fasta").write_bytes(b">ctg\n" + draft.tobytes() + b"\n")
    cfg = PolisherConfig(backend="native", num_threads=2, window_length=100)
    p = create_polisher(str(tmp_path / "reads.fasta"),
                        str(tmp_path / "ovl.paf"),
                        str(tmp_path / "draft.fasta"), cfg)
    # run ingest only up to overlaps (initialize would consume breaking points)
    return p, cfg


def test_tpu_align_stage_matches_native(tmp_path):
    p, cfg = _build(tmp_path)
    # drive initialize twice with different stages by monkeypatching config
    import racon_tpu.backends as backends

    cfg_native = cfg
    p.config = cfg_native
    p.initialize()
    # rebuild a fresh polisher for the tpu stage (initialize is one-shot)
    p2, _ = _build(tmp_path)
    cfg_tpu = PolisherConfig(**{**cfg.__dict__, "backend": "tpu"})
    p2.config = cfg_tpu
    p2.initialize()

    # identical layer assignment implies identical breaking points downstream
    w1, w2 = p.windows, p2.windows
    assert np.array_equal(w1.lay_win, w2.lay_win)
    assert np.array_equal(w1.lay_begin, w2.lay_begin)
    assert np.array_equal(w1.lay_end, w2.lay_end)
    assert np.array_equal(w1.lay_qbegin, w2.lay_qbegin)
    assert np.array_equal(w1.lay_qlen, w2.lay_qlen)


def test_small_batch_auto_routes_to_host(tmp_path, monkeypatch):
    """A non-interpret TPU align stage must route batches under
    DEVICE_MIN_OVERLAPS to the native host aligner WITHOUT touching any
    device API (measured crossover in BENCH_LEDGER; reference analog: the
    GPU path's CPU fallback, src/cuda/cudapolisher.cpp:204-213). Runs on
    CPU: if the route is taken, no jax dispatch happens at all."""
    p, cfg = _build(tmp_path)
    p.initialize()  # native reference run for comparison
    p2, _ = _build(tmp_path)
    stage = TpuAlignStage(cfg, interpret=False)  # pretend real chip

    calls = {}
    orig = NativeAlignStage.breaking_points

    def spy(self, *a, **k):
        calls["native"] = calls.get("native", 0) + 1
        return orig(self, *a, **k)

    monkeypatch.setattr(NativeAlignStage, "breaking_points", spy)

    from racon_tpu.core.overlaps import OverlapTable  # noqa: F401

    # drive the polisher's breaking-point dispatch through the tpu stage
    import racon_tpu.backends as backends

    monkeypatch.setattr(backends, "get_align_stage", lambda c: stage)
    p2.initialize()
    assert calls.get("native", 0) >= 1  # routed, not dispatched
    assert np.array_equal(p.windows.lay_win, p2.windows.lay_win)
    assert np.array_equal(p.windows.lay_begin, p2.windows.lay_begin)


def test_tier_myers_payload_routing(monkeypatch):
    """Myers tier routing: interpret mode always scored; the payload-size
    gate applies only on a measured-slow link (rows payloads are cap + 2
    bytes/item — 41 KB at the 40960 caps, which loses to the scored
    compact payloads on slow links); RACON_TPU_MYERS_PAYLOAD_MAX
    overrides the threshold on slow links ONLY (fast attaches run Myers
    regardless); RACON_TPU_MYERS=0 kills the kernel."""
    from racon_tpu.ops.align_stage_tpu import tier_myers
    from racon_tpu.utils import jaxenv

    assert not tier_myers(2560, 512, True)  # interpret -> scored path

    monkeypatch.setattr(jaxenv, "slow_link", lambda: True)
    assert tier_myers(2560, 512, False)
    assert tier_myers(10240, 1024, False)
    assert not tier_myers(40960, 1024, False)   # 41 KB payload
    assert not tier_myers(40960, 4096, False)

    monkeypatch.setattr(jaxenv, "slow_link", lambda: False)
    assert tier_myers(40960, 1024, False)       # fast attach: Myers always

    monkeypatch.setattr(jaxenv, "slow_link", lambda: True)
    monkeypatch.setenv("RACON_TPU_MYERS_PAYLOAD_MAX", "65536")
    assert tier_myers(40960, 1024, False)
    monkeypatch.setenv("RACON_TPU_MYERS_PAYLOAD_MAX", "1024")
    assert not tier_myers(2560, 512, False)
    # the override only applies behind a slow link (ADVICE r4)
    monkeypatch.setattr(jaxenv, "slow_link", lambda: False)
    assert tier_myers(2560, 512, False)
    monkeypatch.setattr(jaxenv, "slow_link", lambda: True)
    monkeypatch.delenv("RACON_TPU_MYERS_PAYLOAD_MAX")
    monkeypatch.setenv("RACON_TPU_MYERS", "0")
    assert not tier_myers(2560, 512, False)


def test_link_probe_threshold_routing(monkeypatch):
    """Routing keys on the MEASURED ms/4MB link probe (VERDICT r4 item 4):
    both sides of the slow-link threshold, via the RACON_TPU_LINK_MS
    override (no device needed), for slow_link itself, the Myers payload
    gate, and the consensus stage's devgather auto decision."""
    from racon_tpu.models.polish_model import PolisherConfig
    from racon_tpu.ops.align_stage_tpu import tier_myers
    from racon_tpu.ops.consensus_stage_tpu import TpuConsensusStage
    from racon_tpu.utils import jaxenv

    monkeypatch.delenv("RACON_TPU_DEVGATHER", raising=False)
    cfg = PolisherConfig(backend="auto")
    stage = TpuConsensusStage(cfg, interpret=False)

    monkeypatch.setenv("RACON_TPU_LINK_MS", "5")   # fast side
    assert not jaxenv.slow_link()
    assert tier_myers(40960, 1024, False)
    assert not stage._will_use_gather()

    monkeypatch.setenv("RACON_TPU_LINK_MS", "100")  # slow side
    assert jaxenv.slow_link()
    assert not tier_myers(40960, 1024, False)
    assert stage._will_use_gather()

    # threshold itself is a knob
    monkeypatch.setenv("RACON_TPU_SLOW_LINK_MS", "200")
    assert not jaxenv.slow_link()

    # forced devgather beats the probe
    monkeypatch.delenv("RACON_TPU_SLOW_LINK_MS")
    monkeypatch.setenv("RACON_TPU_DEVGATHER", "0")
    assert not stage._will_use_gather()
    monkeypatch.setenv("RACON_TPU_DEVGATHER", "1")
    assert stage._will_use_gather()


def test_myers_tier_fmt_routing(monkeypatch):
    """Payload-format routing for the Myers kernel (r5): rows on fast
    attaches and small payloads; the compact myers_rle walk at long caps
    on slow links; RACON_TPU_MYERS_RLE=0 falls back to the scored path
    (None); RACON_TPU_MYERS=0 kills everything."""
    from racon_tpu.ops.align_stage_tpu import myers_tier_fmt, tier_myers
    from racon_tpu.utils import jaxenv

    assert myers_tier_fmt(2560, 512, True) is None  # interpret -> scored

    monkeypatch.setattr(jaxenv, "slow_link", lambda: False)
    assert myers_tier_fmt(40960, 1024, False) == "rows"

    monkeypatch.setattr(jaxenv, "slow_link", lambda: True)
    assert myers_tier_fmt(2560, 512, False) == "rows"    # 2.5 KB payload
    assert myers_tier_fmt(10240, 1024, False) == "rows"  # 10 KB payload
    assert myers_tier_fmt(40960, 1024, False) == "myers_rle"
    assert myers_tier_fmt(40960, 4096, False) == "myers_rle"
    # tier_myers stays the rows-gate predicate (back-compat)
    assert tier_myers(10240, 1024, False)
    assert not tier_myers(40960, 1024, False)

    monkeypatch.setenv("RACON_TPU_MYERS_RLE", "0")
    assert myers_tier_fmt(40960, 1024, False) is None  # scored fallback
    monkeypatch.delenv("RACON_TPU_MYERS_RLE")
    monkeypatch.setenv("RACON_TPU_MYERS", "0")
    assert myers_tier_fmt(2560, 512, False) is None
