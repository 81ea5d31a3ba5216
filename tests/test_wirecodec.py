"""Wire codec (ops/wirecodec.py + native packer): lossless roundtrips,
C++/numpy encoder equivalence, on-device (jit) decoder, and the engine's
packed transfer path producing bit-identical embeddings."""

import jax
import numpy as np
import pytest

from nomad_tpu.ops import wirecodec as wc

rng = np.random.default_rng(0)


def _speech_like(b=2, t=163840):
    tt = np.arange(t) / 16000
    x = 0.1 * np.sin(2 * np.pi * 100 * tt) * np.clip(
        np.sin(2 * np.pi * 0.7 * tt), 0, 1
    ) + 0.001 * rng.standard_normal(tt.shape)
    return np.round(
        np.clip(np.stack([x * (1 - 0.1 * i) for i in range(b)]), -0.99, 0.99)
        * 32768
    ).astype(np.int16)


CASES = {
    "speech": _speech_like(),
    "noisy-tone": np.round(np.clip(
        0.1 * np.sin(2 * np.pi * 97 * np.arange(163840) / 16000)
        + 0.02 * rng.standard_normal(163840), -0.99, 0.99
    ) * 32768).astype(np.int16)[None].repeat(3, 0),
    "random": rng.integers(-32768, 32768, (4, 8192), dtype=np.int16),
    "zeros": np.zeros((2, 4096), np.int16),
    "extremes": np.tile(np.array([[-32768, 32767]], np.int16), (1, 2048)),
    "constant": np.full((3, 4096), -1234, np.int16),
}


@pytest.mark.parametrize("name", list(CASES))
def test_roundtrip_exact(name):
    arr = CASES[name]
    enc = wc.encode(arr)
    assert np.array_equal(wc.decode_numpy(enc), arr)
    # the jit decoder must agree bit-for-bit with the host decoder
    dec = np.asarray(wc.decode_on_device(enc))
    assert np.array_equal(dec, arr)


def test_native_and_numpy_encoders_identical():
    from nomad_tpu.io import native as nat

    if nat.get_lib() is None or not hasattr(nat.get_lib(), "nomad_pack_i16"):
        pytest.skip("native lib unavailable")
    arr = _speech_like(4)
    e_nat = wc.encode(arr)

    import nomad_tpu.io.native as NN

    orig = NN.native_pack_i16
    NN.native_pack_i16 = lambda *a, **k: None
    try:
        e_np = wc.encode(arr)
    finally:
        NN.native_pack_i16 = orig
    for k in ("packed", "widths", "offsets", "firsts"):
        assert np.array_equal(e_nat[k], e_np[k]), k


def test_compression_ratios():
    assert wc.encode(CASES["speech"])["nbytes"] < 0.7 * CASES["speech"].nbytes
    assert (
        wc.encode(CASES["noisy-tone"])["nbytes"]
        < 0.9 * CASES["noisy-tone"].nbytes
    )
    # random data must be detected as incompressible by the caller's ratio
    assert wc.encode(CASES["random"])["nbytes"] > CASES["random"].nbytes


def test_pack_bucket_bounded_waste():
    for n in (1, 5000, 100_000, 1_000_000, 6_600_000):
        b = wc._pack_bucket(n)
        assert b >= n
        if n >= 16 * wc.MIN_PACK_WORDS:  # above the 16 KB-floor regime
            assert (b - n) / n <= 1.0 / 16 + 1e-9


def test_engine_packed_path_bit_identical(rng=np.random.default_rng(3)):
    """embed_waves through the packed wire path must give bit-identical
    embeddings to the raw path (decode is exact, model identical)."""
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring.engine import EmbeddingEngine

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    waves = [w for w in _speech_like(6, 8192)]

    raw = EmbeddingEngine(model, params, wire_codec="off")
    e_raw = raw.embed_waves(waves)
    packed = EmbeddingEngine(
        model, params, wire_codec="on", parallel_put_min_bytes=1024
    )
    e_packed = packed.embed_waves(waves)
    np.testing.assert_array_equal(e_raw, e_packed)
    stats = packed.transfer_stats()
    assert stats["codec_hits"] >= 1
    assert stats["codec_saved_MB"] >= 0


def test_engine_skips_incompressible():
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring.engine import EmbeddingEngine

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    waves = [
        rng.integers(-32768, 32768, 8192).astype(np.int16) for _ in range(6)
    ]
    eng = EmbeddingEngine(
        model, params, wire_codec="on", parallel_put_min_bytes=1024
    )
    eng.embed_waves(waves)
    assert eng.transfer_stats()["codec_skips"] >= 1
    assert eng.transfer_stats()["codec_hits"] == 0


def test_codec_race_decides_and_stays_exact(monkeypatch):
    """wire_codec='auto' races raw vs packed transport on a real batch,
    records both rates, picks a winner — and embeddings stay bit-identical
    either way (the probe ships half raw + half decoded-packed)."""
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import engine as eng

    monkeypatch.setattr(eng.jax, "default_backend", lambda: "tpu")
    # faking a tpu backend makes engine __post_init__'s
    # enable_compilation_cache REALLY enable the persistent cache — a
    # process-global jax.config leak into later tests; neutralize it
    from nomad_tpu.utils import cache as cache_mod

    monkeypatch.setattr(cache_mod, "enable_compilation_cache",
                        lambda cache_dir=None: None)
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    # batch large enough that the combined frame (packed stream + the
    # >=16 KB meta tail row) clears the ship gate — on tiny batches the
    # meta floor makes packed honestly unattractive and the race refuses
    waves = [w for w in _speech_like(8, 40960)]
    off = eng.EmbeddingEngine(model, params, wire_codec="off")
    e_off = off.embed_waves(waves)
    auto = eng.EmbeddingEngine(
        model, params, wire_codec="auto", parallel_put_min_bytes=1024
    )
    e_auto = auto.embed_waves(waves)
    np.testing.assert_array_equal(e_off, e_auto)
    stats = auto.transfer_stats()
    assert stats["codec_in_use"] in (True, False)
    assert set(stats["codec_race_MBps"]) == {"raw", "packed"}


def test_codec_two_wins_gate():
    """Packed transport must win TWO consecutive races before it ships
    (a one-shot cold-wire fluke steered a whole bench run packed), and a
    single loss reverts to raw."""
    from nomad_tpu.scoring.engine import EmbeddingEngine

    eng = EmbeddingEngine.__new__(EmbeddingEngine)
    eng.probe_interval = 8
    eng.probe_interval_max = 64
    eng._codec_probes = {}
    eng._codec_wins = 0
    eng._use_codec = None
    eng._codec_interval = 0

    def race(raw, packed):
        eng._codec_probes = {"raw": raw, "packed": packed}
        eng._codec_decide()

    race(10.0, 20.0)  # clear win #1 — not enough yet
    assert eng._use_codec is False
    race(10.0, 20.0)  # win #2 — enable (a verdict flip resets the interval)
    assert eng._use_codec is True
    assert eng._codec_interval == 8
    # the race rates are DELIVERED throughput (wire + encode charged in
    # _probe_codec), so the hysteresis bar is a small 1.08x residue guard
    race(10.0, 10.5)  # 1.05x: below the bar — revert immediately
    assert eng._use_codec is False
    race(10.0, 10.7)  # 1.07x: still below; verdict stable -> backoff
    assert eng._use_codec is False
    assert eng._codec_interval == 16
    race(10.0, 10.7)
    assert eng._codec_interval == 32
    race(10.0, 11.5)
    race(10.0, 11.5)
    assert eng._use_codec is True
    assert eng._codec_interval == 8  # flip reset


def test_probe_backoff():
    """Stable probe verdicts double the re-probe interval (capped at
    probe_interval_max); a flip resets it — probes serialize the pipeline,
    so steady state must not pay them every probe_interval puts forever."""
    from nomad_tpu.scoring.engine import EmbeddingEngine

    eng = EmbeddingEngine.__new__(EmbeddingEngine)
    eng.probe_interval = 8
    eng.probe_interval_max = 64
    cur, seen = 0, []
    for stable in (True, True, True, True, False, True):
        cur = eng._backoff(cur, stable=stable)
        seen.append(cur)
    assert seen == [16, 32, 64, 64, 8, 16]


def test_fused_packed_forward_prewarmed_and_dispatched():
    """prewarm_codec AOT-compiles the fused decode+forward executable for
    the dominant combined-frame shape; a forced-packed embed then
    dispatches through the ("pk", ...) key with no new compiles — the
    packed path costs raw's RPC count (one transfer, one dispatch)."""
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring.engine import EmbeddingEngine

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    waves = [w for w in _speech_like(8, 8192)]
    eng = EmbeddingEngine(
        model, params, wire_codec="on", parallel_put_min_bytes=1024,
        batch_sample_budget=8 * 8192,  # full batch == the 8 waves shipped
    )
    eng.prewarm_codec(waves)
    pk_keys = [k for k in eng._aot if k[0] == "pk"]
    assert pk_keys, "fused executable not prewarmed"
    compiled_before = set(eng._compiled_keys) | set(eng._aot)
    e_packed = eng.embed_waves(waves)
    assert eng.transfer_stats()["codec_hits"] >= 1
    # the packed batches reused the prewarmed fused executable
    new_keys = (set(eng._compiled_keys) | set(eng._aot)) - compiled_before
    assert not [k for k in new_keys if k[0] == "pk"], new_keys
    ref = EmbeddingEngine(model, params, wire_codec="off").embed_waves(waves)
    np.testing.assert_array_equal(ref, e_packed)


def test_combined_frame_fuzz_roundtrip():
    """Randomized shapes/content through encode -> combined frame ->
    decode_combined_call: bit-exact for every (B, T) and payload class,
    and the frame layout invariants hold (uint32, MIN_PACK_WORDS rows,
    meta rows as predicted by meta_rows)."""
    r = np.random.default_rng(42)
    for trial in range(12):
        b = int(r.integers(1, 12))
        t = int(r.integers(1, 9)) * wc.S
        kind = trial % 4
        if kind == 0:  # speech-ish
            tt = np.arange(t) / 16000
            x = np.round(3000 * np.sin(2 * np.pi * 120 * tt))[None] * (
                1 - 0.05 * np.arange(b)[:, None]
            )
            arr = (x + r.integers(-30, 30, (b, t))).astype(np.int16)
        elif kind == 1:  # random (likely skipped by ratio gates, still exact)
            arr = r.integers(-32768, 32768, (b, t), dtype=np.int16)
        elif kind == 2:  # constant runs
            arr = np.full((b, t), int(r.integers(-32768, 32767)), np.int16)
        else:  # sparse spikes
            arr = np.zeros((b, t), np.int16)
            idx = r.integers(0, t, size=max(1, t // 100))
            arr[:, idx] = r.integers(-32768, 32768, size=len(idx))
        enc = wc.encode(arr)
        assert enc is not None
        rows = wc.combined_rows(enc)
        assert rows.dtype == np.uint32
        assert rows.shape[1] == wc.MIN_PACK_WORDS
        assert rows.shape[0] == (
            len(enc["packed"]) // wc.MIN_PACK_WORDS + wc.meta_rows(b, t)
        )
        dec = np.asarray(wc.decode_combined_call(rows, b=b, t=t))
        np.testing.assert_array_equal(dec, arr, err_msg=f"trial {trial}")


def test_prewarm_async_registry_and_atexit_join():
    """Async prewarm threads register in _prewarm_threads and are pruned
    when done; _join_prewarms (the atexit hook) drains in-flight ones so
    the interpreter never tears down PJRT mid-compile — a daemon thread
    still compiling at exit made bench_large abort (rc=134) AFTER a clean
    run."""
    arr = np.zeros((4, 2 * wc.S), np.int16)
    enc = wc.encode(arr)
    rows = wc.combined_rows(enc)
    th = wc.prewarm_decode_combined_async(rows.shape, 4, 2 * wc.S)
    if th is not None:  # None when this shape is already warm
        assert th in wc._prewarm_threads
        wc._join_prewarms(timeout=120.0)
        assert not th.is_alive()
    assert th not in wc._prewarm_threads
    assert wc.decode_combined_ready(rows.shape, 4, 2 * wc.S)
    # idempotent: warm key starts no new thread
    assert wc.prewarm_decode_combined_async(rows.shape, 4, 2 * wc.S) is None
    assert wc._prewarm_threads == []


def test_encode_overlap_fraction_banked_and_charged():
    """embed_waves banks the measured assemble-encode overlap fraction
    (futures already done when the submit loop needs them) and the race
    charges packed only the NON-overlapped encode fraction: whether the
    pool encode rides under the pipeline is regime-dependent (measured
    both ways on-chip, NOTES_ROUND5), so it must be observed, not
    assumed."""
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import engine as eng

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    e = eng.EmbeddingEngine(model, params, wire_codec="on")
    waves = [w for w in _speech_like(12, 40960)]
    assert e.transfer_stats()["encode_ready_frac"] is None
    e.embed_waves(waves)
    frac = e.transfer_stats()["encode_ready_frac"]
    # multi-chunk 'on' call with attempted encodes -> an observation lands
    if frac is not None:  # single-chunk plans bank nothing (can't pipeline)
        assert 0.0 <= frac <= 1.0
    # the charge itself (pure math, deterministic): no observation =
    # full encode wall; fully-overlapped = wire only; half = half
    e._encode_ready_frac = None
    assert e._packed_wall(2.0, 0.5) == 2.5
    e._encode_ready_frac = 1.0
    e.reset_codec_race()
    assert e._encode_ready_frac == 1.0  # reset keeps the host observation
    assert e._packed_wall(2.0, 0.5) == 2.0
    e._encode_ready_frac = 0.5
    assert e._packed_wall(2.0, 0.5) == 2.25
