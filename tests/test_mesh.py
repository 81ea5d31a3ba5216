"""Sharding layer tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.ops import cdist
from nomad_tpu.parallel import data_mesh, grid_mesh, sharded_cdist
from nomad_tpu.scoring import EmbeddingEngine


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_data_mesh_engine_matches_single_device(eight_devices, rng):
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    waves = [
        (0.2 * rng.standard_normal(n)).astype(np.float32)
        for n in [900, 1100, 700, 1300, 800, 1000, 950, 1050, 990]
    ]
    mesh = data_mesh(8)
    sharded = EmbeddingEngine(model, params, mesh=mesh).embed_waves(waves)
    single = EmbeddingEngine(model, params).embed_waves(waves)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_cdist_matches_dense(eight_devices, rng):
    mesh = grid_mesh(2, 4)
    a = rng.standard_normal((16, 32)).astype(np.float32)
    b = rng.standard_normal((8, 32)).astype(np.float32)
    d_sharded = np.asarray(sharded_cdist(jnp.asarray(a), jnp.asarray(b), mesh))
    d_dense = np.asarray(cdist(a, b))
    np.testing.assert_allclose(d_sharded, d_dense, atol=1e-5)


def test_dp_training_step_matches_single_device(eight_devices, rng):
    """Gradient all-reduce over the mesh must reproduce single-device
    training exactly (same global batch)."""
    from nomad_tpu.training.triplet import Training

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    config = {
        "experiment_name": "none",
        "lr": 1e-3,
        "freeze_convnet": True,
        "freeze_all": False,
        "emb_dim": 16,
        "masked_pool": True,
    }

    def one_step(mesh):
        tr = Training(dict(config), mesh=mesh, params=params, model_config=cfg)
        tr.margin = 0.2
        tr._build_optimizer()
        r = np.random.default_rng(7)
        mk = lambda: jnp.asarray(r.standard_normal((8, 800)).astype(np.float32))
        lengths = jnp.full((8,), 800, jnp.int32)
        step = tr._get_step((8, 800))
        p2, _, loss = step(
            tr.params, tr.opt_state, mk(), mk(), mk(), lengths, lengths,
            lengths, jnp.float32(1e-5), jnp.float32(1e-3), jax.random.key(3),
        )
        return float(loss), jax.device_get(p2)

    loss_m, p_m = one_step(data_mesh(8))
    loss_s, p_s = one_step(None)
    assert abs(loss_m - loss_s) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 256)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_graft_entry_multichip(eight_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
