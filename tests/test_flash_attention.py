"""Pallas flash attention vs XLA einsum attention (interpret mode on CPU;
the driver/bench exercise the compiled TPU path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.ops.attention import mha_xla
from nomad_tpu.ops.flash_attention import mha_pallas


@pytest.fixture(scope="module")
def qkv(rng):
    B, T, H, D = 2, 200, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    return mk(), mk(), mk()


def test_matches_xla_unmasked(qkv):
    q, k, v = qkv
    ref = mha_xla(q, k, v)
    out = mha_pallas(q, k, v, interpret=True)
    assert np.max(np.abs(np.asarray(ref) - np.asarray(out))) < 1e-5


def test_matches_xla_masked(qkv):
    q, k, v = qkv
    lengths = np.array([150, 200])
    mask = jnp.arange(q.shape[1])[None, :] < jnp.asarray(lengths)[:, None]
    ref = np.asarray(mha_xla(q, k, v, mask))
    out = np.asarray(mha_pallas(q, k, v, mask, interpret=True))
    for b, l in enumerate(lengths):  # padded query rows are unspecified
        assert np.max(np.abs(ref[b, :l] - out[b, :l])) < 1e-5


def test_nonaligned_seq_len(rng):
    B, T, H, D = 1, 77, 2, 64  # T not a multiple of any block
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        for _ in range(3)
    )
    ref = mha_xla(q, k, v)
    out = mha_pallas(q, k, v, interpret=True)
    assert np.max(np.abs(np.asarray(ref) - np.asarray(out))) < 1e-5


def test_grad_falls_back_to_xla(qkv):
    q, k, v = qkv
    mask = jnp.arange(q.shape[1])[None, :] < jnp.array([180, 120])[:, None]

    def loss_p(q):
        return jnp.sum(mha_pallas(q, k, v, mask, interpret=True) ** 2)

    def loss_x(q):
        return jnp.sum(mha_xla(q, k, v, mask) ** 2)

    gp = jax.grad(loss_p)(q)
    gx = jax.grad(loss_x)(q)
    assert bool(jnp.all(jnp.isfinite(gp)))
    assert np.max(np.abs(np.asarray(gp) - np.asarray(gx))) < 1e-3


def test_model_with_pallas_attention(rng):
    """Backbone with attention_impl='pallas' matches the xla build."""
    from nomad_tpu.models import NomadModel, Wav2Vec2Config

    cfg_x = Wav2Vec2Config.tiny()
    cfg_p = Wav2Vec2Config.tiny(attention_impl="pallas")
    wav = jnp.asarray(0.2 * rng.standard_normal((2, 2000)).astype(np.float32))
    model_x = NomadModel(cfg_x, emb_dim=16)
    model_p = NomadModel(cfg_p, emb_dim=16)
    params = model_x.init(jax.random.key(0), wav, method=NomadModel.init_all)
    e_x = model_x.apply(params, wav, lengths=jnp.array([1500, 2000]))
    e_p = model_p.apply(params, wav, lengths=jnp.array([1500, 2000]))
    assert np.max(np.abs(np.asarray(e_x) - np.asarray(e_p))) < 1e-5


@pytest.mark.parametrize("t", [600, 1100, 130])
def test_nondivisible_block_lengths(rng, t):
    """Regression: t_pad not divisible by block_q used to skip trailing
    query rows entirely."""
    B, H, D = 1, 2, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, t, H, D)).astype(np.float32))
        for _ in range(3)
    )
    ref = np.asarray(mha_xla(q, k, v))
    out = np.asarray(mha_pallas(q, k, v, interpret=True))
    assert np.max(np.abs(ref - out)) < 1e-5  # ALL rows, incl. the tail
