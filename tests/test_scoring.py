"""Scoring engine + predict pipeline end-to-end (tiny model), including CSV
format parity with the reference (`/root/reference/src/nomad_audio/
nomad.py:82-140`) and score parity vs the torch batch-1 oracle loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy.spatial.distance import cdist as scipy_cdist

from nomad_tpu.convert import canonicalize, merge_into, to_flax_params
from nomad_tpu.convert.oracle import TorchNomadOracle
from nomad_tpu.io import write_wav
from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.scoring import EmbeddingEngine, bucket_length, build_result_frames


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Wav2Vec2Config.tiny()
    oracle = TorchNomadOracle(cfg, emb_dim=16, seed=0)
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    params = merge_into(
        params,
        to_flax_params(
            canonicalize(oracle.state_dict()), cfg.num_layers, len(cfg.conv_dim)
        ),
    )
    return cfg, oracle, model, params


def test_bucket_length():
    assert bucket_length(1) == 4096
    assert bucket_length(4096) == 4096
    assert bucket_length(4097) == 8192
    assert bucket_length(16000) == 16384
    # 10 s @ 16 kHz: fine-grained quantization keeps waste low (~2%)
    assert bucket_length(160000) == 163840
    for n in [5000, 12345, 99999, 160000, 300000]:
        b = bucket_length(n)
        assert b >= n
        if n >= 8 * 4096:  # above the min-bucket regime the waste is bounded
            assert (b - n) / n <= 0.34


def test_prewarm_compiles_planned_shapes(tiny_setup):
    """prewarm() fills the jit cache for the full-batch and batch-1 shapes
    of each duration, and embed_waves on those durations adds no new
    compiled entries (prediction matches the plan)."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(model, params)
    engine.prewarm((0.25, 0.5), int16=False)
    keys = set(engine._jitted)
    assert len(keys) >= 2
    for sec in (0.25, 0.5):
        blen = bucket_length(int(sec * 16000))
        assert (engine.batch_size_for(blen), blen, False) in keys

    rng = np.random.default_rng(0)
    waves = [
        (0.1 * rng.standard_normal(int(s * 16000))).astype(np.float32)
        for s in (0.25, 0.5, 0.25)
    ]
    emb = engine.embed_waves(waves)
    assert emb.shape == (3, 16)
    # warm shapes were reused where the plan matched (batch-1 and the
    # 2-row tail compile is the only potentially new entry)
    assert all(k in engine._jitted for k in keys)


def test_file_cache_mixed_hits_preserve_order(tiny_setup, tmp_path, rng):
    """Cached + fresh files interleaved must come back in request order,
    bit-identical to an uncached run."""
    from nomad_tpu.io import write_wav

    cfg, _oracle, model, params = tiny_setup
    paths = []
    for i in range(5):
        w = (0.1 * rng.standard_normal(700 + 60 * i)).astype(np.float32)
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, w[None], 16000, bits=16)
        paths.append(p)

    plain = EmbeddingEngine(model, params)
    want = plain.embed_files(paths)

    cached = EmbeddingEngine(model, params, file_cache={})
    # seed the cache with files 1 and 3 only
    cached.embed_files([paths[1], paths[3]])
    assert cached.cache_hits == 0
    got = cached.embed_files(paths)  # 2 hits + 3 misses, interleaved
    assert cached.cache_hits == 2
    np.testing.assert_array_equal(got, want)
    # full second pass: all hits
    np.testing.assert_array_equal(cached.embed_files(paths), want)
    assert cached.cache_hits == 7


def test_engine_matches_direct_apply(tiny_setup):
    cfg, oracle, model, params = tiny_setup
    rng = np.random.default_rng(5)
    waves = [
        (0.2 * rng.standard_normal(n)).astype(np.float32)
        for n in [900, 5000, 1300, 4200, 700]
    ]
    engine = EmbeddingEngine(model, params, batch_sample_budget=8192)
    emb = engine.embed_waves(waves)
    assert emb.shape == (5, 16)
    for i, w in enumerate(waves):
        direct = np.asarray(model.apply(params, jnp.asarray(w[None, :])))
        np.testing.assert_allclose(emb[i], direct[0], atol=1e-5)


def test_embed_waves_device_matches_host_path(tiny_setup):
    """embed_waves_device (the bench headline's device-resident scoring
    path — skips the host collect + cdist re-upload round trips) must
    return bit-identical embeddings to embed_waves, in input order,
    including padded tail batches and the empty call."""
    cfg, oracle, model, params = tiny_setup
    rng = np.random.default_rng(17)
    waves = [
        (0.2 * rng.standard_normal(n)).astype(np.float32)
        for n in [900, 5000, 1300, 4200, 700, 2600, 3100]
    ]
    engine = EmbeddingEngine(model, params, batch_sample_budget=8192)
    host = engine.embed_waves(waves)
    dev = engine.embed_waves_device(waves)
    assert dev.shape == host.shape
    np.testing.assert_array_equal(np.asarray(dev), host)
    assert engine._backlog == 0
    empty = engine.embed_waves_device([])
    assert np.asarray(empty).shape == (0, 16)


def test_serialized_pipeline_matches_pipelined(tiny_setup):
    """serialize_pipeline (the bench overlap leg's reference-style serial
    loop) must be a pure scheduling change: identical embeddings, and the
    backlog counter ends drained."""
    cfg, oracle, model, params = tiny_setup
    rng = np.random.default_rng(11)
    waves = [
        (0.2 * rng.standard_normal(n)).astype(np.float32)
        for n in [900, 5000, 1300, 4200, 700, 2600]
    ]
    piped = EmbeddingEngine(model, params)
    want = piped.embed_waves(waves)
    serial = EmbeddingEngine(model, params, serialize_pipeline=True)
    got = serial.embed_waves(waves)
    np.testing.assert_array_equal(got, want)
    assert serial._backlog == 0


def test_engine_matches_torch_oracle_loop(tiny_setup):
    cfg, oracle, model, params = tiny_setup
    rng = np.random.default_rng(6)
    waves = [
        (0.2 * rng.standard_normal(n)).astype(np.float32)
        for n in [1100, 2000, 3100]
    ]
    engine = EmbeddingEngine(model, params)
    ours = engine.embed_waves(waves)
    ref = oracle.embed_files(waves)
    assert np.max(np.abs(ours - ref)) < 1e-4


def _write_demo_tree(tmp_path, rng, n_nmr=3, n_deg=2):
    nmr_dir = tmp_path / "nmr-data"
    deg_dir = tmp_path / "test-data"
    nmr_dir.mkdir()
    deg_dir.mkdir()
    for i in range(n_nmr):
        w = (0.2 * rng.standard_normal(1000 + 700 * i)).astype(np.float32)
        write_wav(str(nmr_dir / f"ref_{i}.wav"), w[None], 16000, bits=32)
    for i in range(n_deg):
        w = (0.2 * rng.standard_normal(1500 + 900 * i)).astype(np.float32)
        write_wav(str(deg_dir / f"deg_{i}.wav"), w[None], 16000, bits=32)
    return str(nmr_dir), str(deg_dir)


def test_predict_dir_mode_end_to_end(tiny_setup, tmp_path, rng, monkeypatch):
    """Full predict vs a reference-faithful torch pipeline: batch-1 loop,
    scipy cdist, 3-decimal rounding, CSV naming."""
    from nomad_tpu.api import Nomad
    from nomad_tpu.io import read_wav

    cfg, oracle, model, params = tiny_setup
    nmr_dir, deg_dir = _write_demo_tree(tmp_path, rng)

    nomad = Nomad(config=cfg, emb_dim=16, params=params)
    out_dir = tmp_path / "results"
    out_dir.mkdir()
    df_avg, df_dm = nomad.predict("dir", nmr_dir, deg_dir, str(out_dir))

    # torch reference computation (same os.listdir order)
    nmr_paths = [os.path.join(nmr_dir, x) for x in os.listdir(nmr_dir)]
    deg_paths = [os.path.join(deg_dir, x) for x in os.listdir(deg_dir)]
    nmr_emb = oracle.embed_files([read_wav(p)[0][0] for p in nmr_paths])
    deg_emb = oracle.embed_files([read_wav(p)[0][0] for p in deg_paths])
    dm_ref = scipy_cdist(deg_emb, nmr_emb)
    avg_ref = np.mean(dm_ref, axis=1)

    assert list(df_avg.index) == [
        os.path.basename(p).split(".")[0] for p in deg_paths
    ]
    np.testing.assert_allclose(df_avg["NOMAD"].values, np.round(avg_ref, 3), atol=2e-3)
    np.testing.assert_allclose(df_dm.values, np.round(dm_ref, 3), atol=2e-3)

    # CSV artifacts in reference layout
    avg_csv = pd.read_csv(out_dir / "nomad_avg.csv")
    assert list(avg_csv.columns) == ["Test File", "NOMAD"]
    scores_csv = pd.read_csv(out_dir / "nomad_scores.csv")
    assert list(scores_csv.columns) == ["Test File"] + [
        os.path.basename(p).split(".")[0] for p in nmr_paths
    ]


def test_predict_csv_mode(tiny_setup, tmp_path, rng):
    from nomad_tpu.api import Nomad

    cfg, oracle, model, params = tiny_setup
    nmr_dir, deg_dir = _write_demo_tree(tmp_path, rng)
    nmr_csv = tmp_path / "nmr.csv"
    deg_csv = tmp_path / "deg.csv"
    pd.DataFrame(
        {"filename": [os.path.join(nmr_dir, x) for x in os.listdir(nmr_dir)]}
    ).to_csv(nmr_csv, index=False)
    pd.DataFrame(
        {"filename": [os.path.join(deg_dir, x) for x in os.listdir(deg_dir)]}
    ).to_csv(deg_csv, index=False)

    nomad = Nomad(config=cfg, emb_dim=16, params=params)
    out_dir = tmp_path / "res2"
    out_dir.mkdir()
    df_avg, df_dm = nomad.predict("csv", str(nmr_csv), str(deg_csv), str(out_dir))
    assert df_dm.shape == (2, 3)


def test_predict_validation_errors(tiny_setup, tmp_path):
    from nomad_tpu.api import Nomad

    cfg, oracle, model, params = tiny_setup
    nomad = Nomad(config=cfg, emb_dim=16, params=params)
    with pytest.raises(Exception, match="not found"):
        nomad.predict("dir", str(tmp_path / "nope"), str(tmp_path))
    with pytest.raises(Exception, match="unknown mode"):
        nomad.predict("banana", str(tmp_path), str(tmp_path))
    with pytest.raises(Exception, match="missing nmr"):
        nomad.predict("dir", None, str(tmp_path))


def test_get_embeddings_frame(tiny_setup, tmp_path, rng):
    from nomad_tpu.api import Nomad

    cfg, oracle, model, params = tiny_setup
    nmr_dir, _ = _write_demo_tree(tmp_path, rng)
    nomad = Nomad(config=cfg, emb_dim=16, params=params)
    df = nomad.get_embeddings(nmr_dir)
    assert df.shape == (3, 17)
    assert df.columns[0] == "filename"


def test_build_result_frames_format(rng):
    dm = rng.random((2, 3))
    df_avg, df_dm = build_result_frames(
        ["/a/b/deg_x.wav", "/a/b/deg.y.wav"], ["n1.wav", "d/n2.wav", "n3.flac"], dm
    )
    # Q2: label = basename before first dot
    assert list(df_avg.index) == ["deg_x", "deg"]
    assert list(df_dm.columns) == ["n1", "n2", "n3"]
    np.testing.assert_allclose(
        df_avg["NOMAD"].values, np.round(dm.mean(axis=1), 3), atol=1e-9
    )


def test_predict_default_results_layout(tiny_setup, tmp_path, rng, monkeypatch):
    """results_path=None -> results-csv/<dd-mm-YYYY_HH-MM-SS>/{ts}_nomad_avg.csv
    + {ts}_nomad_scores.csv (reference nomad.py:123-135)."""
    import re

    from nomad_tpu.api import Nomad

    cfg, oracle, model, params = tiny_setup
    nmr_dir, deg_dir = _write_demo_tree(tmp_path, rng)
    monkeypatch.chdir(tmp_path)
    nomad = Nomad(config=cfg, emb_dim=16, params=params)
    nomad.predict("dir", nmr_dir, deg_dir, None)
    root = tmp_path / "results-csv"
    assert root.is_dir()
    (ts_dir,) = list(root.iterdir())
    assert re.fullmatch(r"\d{2}-\d{2}-\d{4}_\d{2}-\d{2}-\d{2}", ts_dir.name)
    names = sorted(p.name for p in ts_dir.iterdir())
    assert names == [f"{ts_dir.name}_nomad_avg.csv", f"{ts_dir.name}_nomad_scores.csv"]


def test_batch_size_snapping():
    """batch_size_for snaps to multiples of 32 (powers of two below 32):
    the 96x10s sample budget really yields B=96 — the measured optimum the
    old power-of-two floor rejected (round-2 advisor finding)."""
    model = NomadModel(Wav2Vec2Config.base(), emb_dim=256)
    e = EmbeddingEngine(model, params={})
    blen = bucket_length(160_000)  # 10 s
    assert e.batch_size_for(blen) == 96
    # tails: next 32-multiple above the remainder (pow2 at/below 32)
    assert e.batch_size_for(blen, remaining=40) == 64
    assert e.batch_size_for(blen, remaining=33) == 64
    assert e.batch_size_for(blen, remaining=32) == 32
    assert e.batch_size_for(blen, remaining=20) == 32
    assert e.batch_size_for(blen, remaining=3) == 4
    assert e.batch_size_for(blen, remaining=1) == 1


def test_chunk_batches_tile_plan():
    """_chunk_batches is the single source of truth for the shapes a run
    executes: 288 10-s files tile as 3 full B=96 batches (no tail), and the
    plan for any count matches what embed_waves actually runs."""
    model = NomadModel(Wav2Vec2Config.base(), emb_dim=256)
    e = EmbeddingEngine(model, params={})
    blen = bucket_length(160_000)
    assert e._chunk_batches(288, blen) == [96, 96, 96]
    assert e._chunk_batches(100, blen) == [96, 4]
    assert e._chunk_batches(97, blen) == [96, 1]
    assert sum(min(b, 1) for b in e._chunk_batches(1, blen)) == 1


def test_prewarm_counts_covers_every_executed_shape(tiny_setup, rng):
    """prewarm(durations, counts=...) compiles the full-batch AND tail
    shapes as AOT executables; the subsequent embed_waves dispatches every
    batch through them (no jit compile inside the timed region)."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(model, params)
    n = 5
    engine.prewarm((0.25,), counts=(n,), int16=False, single=False)
    assert len(engine._aot) >= 1
    planned = set(engine._aot)
    waves = [
        (0.1 * rng.standard_normal(int(0.25 * 16000))).astype(np.float32)
        for _ in range(n)
    ]
    emb = engine.embed_waves(waves)
    assert emb.shape == (n, 16)
    # every executed shape had an AOT executable waiting for it
    blen = bucket_length(int(0.25 * 16000))
    for bsz in engine._chunk_batches(n, blen):
        assert (bsz, blen, False) in planned


def test_aot_dispatch_matches_jit(tiny_setup, rng):
    """Embeddings produced through the retained AOT executables are
    identical to the plain jit path."""
    cfg, _oracle, model, params = tiny_setup
    waves = [
        (0.1 * rng.standard_normal(4000 + 700 * i)).astype(np.float32)
        for i in range(3)
    ]
    cold = EmbeddingEngine(model, params)
    ref = cold.embed_waves(waves)
    warm = EmbeddingEngine(model, params)
    warm.prewarm((0.25,), counts=(3,), int16=False)
    out = warm.embed_waves(waves)
    np.testing.assert_array_equal(ref, out)


def test_transfer_probe_both_modes_same_batch(tiny_setup, rng):
    """The adaptive h2d probe times single-stream and parallel on the SAME
    (first) large batch — half the rows each, blocking on the raw
    transfers — so neither probe absorbs another batch's compute (round-2
    advisor: consecutive-batch probing biased the result)."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(model, params, parallel_put_min_bytes=1024)
    waves = [
        (0.1 * rng.standard_normal(4000)).astype(np.float32) for _ in range(8)
    ]
    engine.embed_waves(waves)
    stats = engine.transfer_stats()
    assert stats["mode"] in ("single", "parallel")
    assert set(stats["probes_MBps"]) == {"single", "parallel"}
    assert all(v > 0 for v in stats["probes_MBps"].values())


def test_transfer_mode_reprobes_periodically(tiny_setup, rng):
    """A stale probe reading must not pin the slower mode forever: every
    probe_interval large batches both modes are re-timed (EWMA-merged) and
    the winner re-chosen (the r03 cold bench locked 'parallel' from a
    1.1 MB/s fluke reading while single-stream sustained 24 MB/s)."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, probe_interval=2
    )
    waves = [
        (0.1 * rng.standard_normal(4000)).astype(np.float32)
        for _ in range(8)
    ]
    for _ in range(4):  # 4 large batches with interval 2 -> >= 2 probes
        engine.embed_waves(waves)
    stats = engine.transfer_stats()
    assert stats["probe_count"] >= 2
    assert set(stats["probes_MBps"]) == {"single", "parallel"}


def test_midsize_batches_still_converge_on_a_mode(tiny_setup, rng):
    """A workload made only of batches too small to split into two
    timeable halves (parallel_put_min_bytes <= nbytes <
    2*parallel_put_min_bytes) must still converge on a MEASURED transfer
    mode via the whole-batch alternating probe — the r3 deferral branch
    hardcoded 'parallel' forever and never set _put_mode (advisor
    finding)."""
    cfg, _oracle, model, params = tiny_setup
    # 8 rows x 4000 f32 = 128 KB; threshold 100 KB -> mid-size band
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=100 * 1024, probe_interval=2
    )
    waves = [
        (0.1 * rng.standard_normal(4000)).astype(np.float32)
        for _ in range(8)
    ]
    for _ in range(3):
        engine.embed_waves(waves)
    stats = engine.transfer_stats()
    assert stats["mode"] in ("single", "parallel")
    assert set(stats["probes_MBps"]) == {"single", "parallel"}


def test_codec_probe_accounting_separate_from_hits(tiny_setup, rng):
    """The raw-vs-packed race counts its ships in codec_probe_ships, not
    codec_hits, and never records NEGATIVE saved bytes (advisor r3: an
    incompressible race payload whose padded frame exceeded the raw half
    deflated codec_saved_MB)."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="auto"
    )
    # int16 waves on the PCM grid so the codec path is applicable;
    # wire_codec='auto' on the CPU backend is inapplicable, so force the
    # probe by calling it directly on a compressible batch. The rows must
    # be LONG enough that the combined frame's row padding amortizes —
    # at (8, 4096) the padded frame rounds up to exactly raw size and the
    # engine (correctly) skips the race entirely.
    batch = np.zeros((8, 32768), np.int16)
    batch[:, :16384] = (
        200 * np.sin(np.arange(16384) / 8.0)[None, :]
    ).astype(np.int16)
    engine._probe_codec(batch)
    stats = engine.transfer_stats()
    assert stats["codec_probe_ships"] == 1
    assert stats["codec_hits"] == 0
    assert engine._codec_saved_bytes >= 0


def test_codec_race_charges_encode(tiny_setup, monkeypatch):
    """The raw-vs-packed race banks DELIVERED rates: the packed half's
    host-side encode wall sits inside its timed window (VERDICT r4 item
    3 — the wire-only metric let packed 'win' races it lost end-to-end,
    because the ~0.15 s/half C++ pack was outside the race)."""
    import time as _time

    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="auto"
    )
    batch = np.zeros((8, 32768), np.int16)
    batch[:, :16384] = (
        200 * np.sin(np.arange(16384) / 8.0)[None, :]
    ).astype(np.int16)
    real_encode = EmbeddingEngine._encode_batch

    def slow_encode(self, b):
        _time.sleep(0.25)
        return real_encode(self, b)

    monkeypatch.setattr(EmbeddingEngine, "_encode_batch", slow_encode)
    engine._probe_codec(batch)
    half_bytes = batch[4:].nbytes
    # >=0.25 s of encode wall must be inside the packed rate's denominator
    assert engine._codec_probes["packed"] <= half_bytes / 0.25
    assert engine._codec_probes["raw"] > engine._codec_probes["packed"]


def test_race_backlog_gating(tiny_setup, monkeypatch):
    """Races only fire on a SHALLOW pipeline: the fair-timing drain that
    precedes a race costs the whole queued backlog (8-20 s each in the
    r4 10k artifact), so a deep-pipeline put keeps the banked verdict
    and ships without racing."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="auto"
    )
    # 'auto' codec applicability requires a TPU backend; the gating logic
    # under test is backend-independent
    monkeypatch.setattr(
        EmbeddingEngine, "_codec_applicable",
        lambda self, b: b.dtype == np.int16 and b.nbytes >= 1024,
    )
    batch = np.zeros((8, 32768), np.int16)
    batch[:, :16384] = (
        200 * np.sin(np.arange(16384) / 8.0)[None, :]
    ).astype(np.int16)
    lengths = np.full((8,), 32768, np.int32)
    engine._backlog = 50  # deep pipeline: no race, raw ship
    engine._put(batch, lengths)
    assert engine.transfer_stats()["codec_probe_ships"] == 0
    engine._backlog = 0  # drained: the race fires
    engine._put(batch, lengths)
    assert engine.transfer_stats()["codec_probe_ships"] == 1
    # bootstrap: with one win pending the NEXT shallow put re-races so
    # the two-consecutive-wins gate resolves immediately
    engine._codec_wins = 1
    engine._backlog = 1
    engine._put(batch, lengths)
    assert engine.transfer_stats()["codec_probe_ships"] == 2


def test_race_gated_on_wire_warm(tiny_setup, monkeypatch):
    """Races (and their synchronous readbacks) must not fire while the
    background d2h channel warm is still in flight: the readback would
    absorb the one-time 36-430 s channel setup and bank sub-MB/s garbage
    into the rate EWMAs (the round-5 10k re-drive paid 55.4 s of a
    185.7 s wall in race 1 this way)."""
    from nomad_tpu.scoring import engine as eng_mod

    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="auto"
    )
    monkeypatch.setattr(
        EmbeddingEngine, "_codec_applicable",
        lambda self, b: b.dtype == np.int16 and b.nbytes >= 1024,
    )
    batch = np.zeros((8, 32768), np.int16)
    batch[:, :16384] = (
        200 * np.sin(np.arange(16384) / 8.0)[None, :]
    ).astype(np.int16)
    lengths = np.full((8,), 32768, np.int32)

    class _Alive:
        def is_alive(self):
            return True

    monkeypatch.setattr(eng_mod, "_wire_thread", _Alive())
    assert not eng_mod.warm_wire_ready()
    engine._backlog = 0  # shallow — only the warm gate holds the race
    engine._put(batch, lengths)
    assert engine.transfer_stats()["codec_probe_ships"] == 0
    monkeypatch.setattr(eng_mod, "_wire_thread", None)
    assert eng_mod.warm_wire_ready()
    engine._put(batch, lengths)
    assert engine.transfer_stats()["codec_probe_ships"] == 1


def test_capped_codec_race_roundtrip(tiny_setup, monkeypatch):
    """With probe_cap_bytes below the batch size, the race times only a
    small head (bounding its worst-case cost to ~cap/weather) and the
    tail ships untimed; the reassembled device batch must be bit-exact
    and in row order."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="auto"
    )
    engine.probe_cap_bytes = 1 << 16  # 64 KB per timed side
    monkeypatch.setattr(
        EmbeddingEngine, "_codec_applicable",
        lambda self, b: b.dtype == np.int16 and b.nbytes >= 1024,
    )
    rng = np.random.default_rng(3)
    batch = (200 * np.sin(
        np.arange(32768)[None, :] / (3.0 + np.arange(8)[:, None])
    )).astype(np.int16) + rng.integers(-3, 3, (8, 32768)).astype(np.int16)
    lengths = np.full((8,), 32768, np.int32)
    assert engine._probe_head_rows(batch) == 4  # 64 KB rows -> head of 4
    payload, _len_dev, pk = engine._put(batch, lengths)
    assert pk is None
    assert engine.transfer_stats()["codec_probe_ships"] == 1
    np.testing.assert_array_equal(np.asarray(payload), batch)


def test_capped_put_probe_roundtrip(tiny_setup):
    """Same bound for the single-vs-parallel transfer probe: a capped
    head decides the mode, the tail rides the decision, order and values
    are preserved."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="off"
    )
    engine.probe_cap_bytes = 1 << 16
    batch = np.arange(8 * 32768, dtype=np.float32).reshape(8, 32768)
    out = np.asarray(engine._put_array(batch))
    np.testing.assert_array_equal(out, batch)
    assert engine.transfer_stats()["mode"] in ("single", "parallel")


def test_collect_single_group_drain(tiny_setup):
    """Default collect (no progress bar) drains all pending chunks in ONE
    concatenate + readback (relay round trips are ~0.5-1 s each); order
    and values must survive the group concat, including ragged tails."""
    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(model, params)
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    chunks = [[0, 1], [2, 3, 4], [5]]
    embs = [
        jnp.asarray(rng.standard_normal((len(c), 4)).astype(np.float32))
        for c in chunks
    ]
    out = {}
    engine._collect(list(zip(chunks, embs)), out)
    for chunk, e in zip(chunks, embs):
        for row, i in enumerate(chunk):
            np.testing.assert_array_equal(out[i], np.asarray(e)[row])


def test_wire_throttle_env(monkeypatch):
    """NOMAD_WIRE_THROTTLE_MBPS paces the put path to the synthetic rate
    (the bench's bad-weather regime leg); unset, it adds nothing."""
    import time as _time

    from nomad_tpu.scoring import engine as eng_mod

    monkeypatch.setenv("NOMAD_WIRE_THROTTLE_MBPS", "100")
    t0 = _time.perf_counter()
    eng_mod._throttle_to(10_000_000, _time.perf_counter())  # 0.1 s @ 100
    assert _time.perf_counter() - t0 >= 0.09
    monkeypatch.delenv("NOMAD_WIRE_THROTTLE_MBPS")
    t0 = _time.perf_counter()
    eng_mod._throttle_to(10_000_000, t0)
    assert _time.perf_counter() - t0 < 0.05


def test_remap_to_compiled_logic():
    """pad_to_compiled planning: a never-compiled shape pads up to the
    SMALLEST covering compiled shape; shapes planned in the same call
    count as available (a tail rides its bucket's full batch, so one
    shape compiles per bucket); compiled/exact shapes pass through; a
    shape with no cover keeps its size (compiling small is cheaper than
    compiling big)."""
    e = EmbeddingEngine.__new__(EmbeddingEngine)
    blen = 4096
    e._compiled_keys = {(96, blen, True), (8, blen, True)}
    e._aot = {}
    # 2 -> 8 (smallest cover), 8 stays (compiled), 128 stays (no cover)
    assert e._remap_to_compiled(
        [(2, blen, True), (8, blen, True), (128, blen, True)]
    ) == [(8, blen, True), (8, blen, True), (128, blen, True)]
    # int16-ness and bucket must match for a cover
    assert e._remap_to_compiled([(2, blen, False)]) == [(2, blen, False)]
    assert e._remap_to_compiled([(2, 8192, True)]) == [(2, 8192, True)]
    # nothing compiled: the tail rides the full batch planned in-call
    e._compiled_keys = set()
    assert e._remap_to_compiled(
        [(96, blen, True), (2, blen, True)]
    ) == [(96, blen, True), (96, blen, True)]
    # lone small request with nothing compiled: keep the small shape
    assert e._remap_to_compiled([(2, blen, True)]) == [(2, blen, True)]


def test_pad_to_compiled_reuses_covering_shape(tiny_setup, rng):
    """A warmed engine answers a small request through the covering
    compiled executable: zero new compiles, identical embeddings (padded
    rows are dropped)."""
    cfg, _oracle, model, params = tiny_setup
    baseline = EmbeddingEngine(model, params, pad_to_compiled=False)
    waves = [
        (0.1 * rng.standard_normal(3500 + 100 * i)).astype(np.float32)
        for i in range(2)
    ]
    ref = baseline.embed_waves(waves)

    warm = EmbeddingEngine(model, params)
    warm.prewarm((0.25,), int16=False, single=False)  # full batch only
    compiled_before = set(warm._compiled_keys) | set(warm._aot)
    out = warm.embed_waves(waves)
    compiled_after = set(warm._compiled_keys) | set(warm._aot)
    assert compiled_after == compiled_before  # no new shapes
    np.testing.assert_allclose(ref, out, atol=1e-6)


def test_pad_to_compiled_files_path(tiny_setup, tmp_path, rng):
    """The native embed_files plan honors pad_to_compiled too: after a
    ladder prewarm, a small file request adds no compiled shapes and
    matches the unpadded engine bit-for-bit."""
    cfg, _oracle, model, params = tiny_setup
    paths = []
    for i in range(3):
        p = tmp_path / f"w{i}.wav"
        write_wav(
            str(p),
            (0.1 * rng.standard_normal(3600 + 50 * i)).astype(np.float32)[None],
            16000, bits=16,
        )
        paths.append(str(p))
    ref = EmbeddingEngine(model, params, pad_to_compiled=False).embed_files(paths)

    warm = EmbeddingEngine(model, params)
    warm.prewarm((0.25,), ladder=True)
    compiled_before = set(warm._compiled_keys) | set(warm._aot)
    out = warm.embed_files(paths)
    assert (set(warm._compiled_keys) | set(warm._aot)) == compiled_before
    np.testing.assert_array_equal(ref, out)


def test_codec_cold_race_ships_raw_then_warms(tiny_setup):
    """A race whose standalone-decode executable is COLD must not compile
    it inline (round-4 BENCH_LARGE: 6 such compiles burned 118 s of a
    457 s wall inside engine.put.codec_race). Cold race: packed half is
    timed, discarded, re-shipped raw — result still bit-exact — and the
    compile moves to a daemon thread; once warm, the same-shape race takes
    the data-bearing decode path with no further cold races."""
    import time as _time

    from nomad_tpu.ops import wirecodec as wc

    cfg, _oracle, model, params = tiny_setup
    engine = EmbeddingEngine(
        model, params, parallel_put_min_bytes=1024, wire_codec="auto"
    )
    batch = np.zeros((8, 32768), np.int16)
    batch[:, :16384] = (
        200 * np.sin(np.arange(16384) / 8.0)[None, :]
    ).astype(np.int16)
    # derive the race half's decode-shape key and ensure it starts cold
    h = batch.shape[0] // 2
    enc_h = wc.encode(batch[h:])
    rows_h = wc.combined_rows(enc_h)
    key = ("c", tuple(rows_h.shape), h, batch.shape[1])
    wc._decode_aot.pop(key, None)
    assert not wc.decode_combined_ready(rows_h.shape, h, batch.shape[1])

    out = engine._probe_codec(batch)
    np.testing.assert_array_equal(np.asarray(out), batch)
    assert engine._codec_cold_races == 1
    assert engine._codec_saved_bytes == 0  # raw shipped twice: nothing saved

    # the daemon prewarm lands shortly; then the SAME shape races warm
    deadline = _time.time() + 60
    while not wc.decode_combined_ready(rows_h.shape, h, batch.shape[1]):
        if _time.time() > deadline:  # pragma: no cover - diagnosis aid
            raise AssertionError("background decode prewarm never landed")
        _time.sleep(0.05)
    out2 = engine._probe_codec(batch)
    np.testing.assert_array_equal(np.asarray(out2), batch)
    assert engine._codec_cold_races == 1  # warm path: no new cold race
    assert engine.transfer_stats()["codec_cold_races"] == 1
