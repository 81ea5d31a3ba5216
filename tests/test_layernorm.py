"""Fused LayerNorm kernel vs XLA math and torch (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.ops.layernorm import layer_norm, layer_norm_xla


@pytest.fixture(scope="module")
def data(rng):
    x = rng.standard_normal((6, 37, 768)).astype(np.float32)
    scale = rng.standard_normal(768).astype(np.float32)
    bias = rng.standard_normal(768).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)


def test_xla_matches_torch(data):
    import torch

    x, scale, bias = data
    ours = np.asarray(layer_norm_xla(x, scale, bias, eps=1e-5))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(np.asarray(x)), (768,),
        torch.from_numpy(np.asarray(scale)), torch.from_numpy(np.asarray(bias)),
        eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pallas_matches_xla(data):
    x, scale, bias = data
    ref = np.asarray(layer_norm_xla(x, scale, bias))
    out = np.asarray(
        layer_norm(x, scale, bias, impl="pallas", interpret=True, block_rows=32)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_row_padding(data):
    """Row counts not divisible by the block must still be exact."""
    x, scale, bias = data
    x2 = x[:1, :5, :]  # 5 rows, block 32
    ref = np.asarray(layer_norm_xla(x2, scale, bias))
    out = np.asarray(
        layer_norm(x2, scale, bias, impl="pallas", interpret=True, block_rows=32)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_grad_fallback(data):
    x, scale, bias = data

    def loss_p(x, s, b):
        return jnp.sum(
            layer_norm(x, s, b, impl="pallas", interpret=True, block_rows=32) ** 2
        )

    def loss_x(x, s, b):
        return jnp.sum(layer_norm_xla(x, s, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-3)


def test_model_with_pallas_layernorm(rng):
    from nomad_tpu.models import NomadModel, Wav2Vec2Config

    cfg_x = Wav2Vec2Config.tiny()
    cfg_p = Wav2Vec2Config.tiny(layernorm_impl="pallas")
    wav = jnp.asarray(0.2 * rng.standard_normal((2, 1600)).astype(np.float32))
    model_x = NomadModel(cfg_x, emb_dim=16)
    model_p = NomadModel(cfg_p, emb_dim=16)
    params = model_x.init(jax.random.key(0), wav, method=NomadModel.init_all)
    e_x = model_x.apply(params, wav)
    e_p = model_p.apply(params, wav)
    np.testing.assert_allclose(np.asarray(e_x), np.asarray(e_p), atol=1e-5)
