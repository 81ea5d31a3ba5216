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


def _row_mask(q, lengths):
    return (
        jnp.arange(q.shape[1])[None, :] < jnp.asarray(lengths)[:, None]
    ).astype(q.dtype)[:, :, None, None]


def test_flash_backward_matches_xla(qkv):
    """The Pallas flash backward (dQ + dK/dV kernels, P recomputed from the
    saved LSE) must match XLA attention grads. Cotangents on padded query
    rows are zeroed — both impls leave those outputs unspecified."""
    q, k, v = qkv
    lengths = [180, 120]
    mask = jnp.arange(q.shape[1])[None, :] < jnp.array(lengths)[:, None]
    rm = _row_mask(q, lengths)

    def loss_p(q, k, v):
        return jnp.sum((mha_pallas(q, k, v, mask, interpret=True) * rm) ** 2)

    def loss_x(q, k, v):
        return jnp.sum((mha_xla(q, k, v, mask) * rm) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        assert bool(jnp.all(jnp.isfinite(a))), name
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 2e-4, name


def test_flash_backward_multiblock(rng):
    """Small blocks force the online-softmax forward AND the blocked
    backward loops (num_kb > 1, num_qb > 1)."""
    B, T, H, D = 2, 512, 2, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    lengths = [512, 300]
    mask = jnp.arange(T)[None, :] < jnp.array(lengths)[:, None]
    rm = _row_mask(q, lengths)

    def loss_p(q, k, v):
        out = mha_pallas(q, k, v, mask, block_q=128, block_k=128,
                         interpret=True)
        return jnp.sum((out * rm) ** 2)

    def loss_x(q, k, v):
        return jnp.sum((mha_xla(q, k, v, mask) * rm) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 2e-4, name
    # padded keys must receive exactly zero grad
    assert np.all(np.asarray(gp[1])[1, 300:] == 0)
    assert np.all(np.asarray(gp[2])[1, 300:] == 0)


def test_model_grad_with_pallas_attention(rng):
    """End-to-end: jax.grad through the backbone with the flash kernel
    matches the xla build (training path)."""
    from nomad_tpu.models import NomadModel, Wav2Vec2Config

    wav = jnp.asarray(0.2 * rng.standard_normal((2, 2000)).astype(np.float32))
    lengths = jnp.array([1500, 2000])
    params = NomadModel(Wav2Vec2Config.tiny(), emb_dim=16).init(
        jax.random.key(0), wav, method=NomadModel.init_all
    )

    def loss(p, impl):
        model = NomadModel(Wav2Vec2Config.tiny(attention_impl=impl), emb_dim=16)
        e = model.apply(p, wav, lengths=lengths)
        return jnp.sum(e * e)

    gx = jax.grad(lambda p: loss(p, "xla"))(params)
    gp = jax.grad(lambda p: loss(p, "pallas"))(params)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_x, flat_p):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 2e-4


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


def test_auto_dispatch(qkv, monkeypatch):
    """impl='auto' flips to the flash kernel ONLY for bf16-class score
    configs (score_prec='default') inside the [1024, 4096] window on TPU
    — round-5 verdict (ops/attention.py): flash-HIGHEST measured 0.651x
    end-to-end in that regime and is retired; flash-bf16 measured 1.192x
    at 6.73e-4 parity. Everything else resolves to the einsum path."""
    from nomad_tpu.ops import attention as att

    q, k, v = qkv  # short T -> xla regardless
    np.testing.assert_array_equal(
        np.asarray(att.mha(q, k, v, impl="auto", score_prec="default")),
        np.asarray(att.mha_xla(q, k, v)),
    )

    calls = {}

    def fake_flash(q, k, v, key_mask=None, precision=None, **kw):
        calls["called"] = True
        calls["precision"] = precision
        return att.mha_xla(q, k, v, key_mask=key_mask)

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        "nomad_tpu.ops.flash_attention.mha_pallas", fake_flash
    )
    long_q = jnp.zeros((1, 2048, 2, 8), jnp.float32)
    # parity-class scores ('high'/None): auto never reaches the kernel,
    # at any length
    for sp in (None, "high", "highest"):
        for t in (1024, 2048, 4097):
            x = jnp.zeros((1, t, 2, 8), jnp.float32)
            att.mha(x, x, x, impl="auto", score_prec=sp)
    assert not calls
    # bf16-class scores inside the window: kernel, at its DEFAULT
    # precision (inherits the caller's bf16 matmul context)
    att.mha(long_q, long_q, long_q, impl="auto", score_prec="default")
    assert calls.get("called") and calls["precision"] is None
    calls.clear()
    # bf16 scores but beyond the VMEM-safe window: xla again
    very_long = jnp.zeros((1, 4097, 2, 8), jnp.float32)
    att.mha(very_long, very_long, very_long, impl="auto",
            score_prec="default")
    assert not calls
    att.mha(q, k, v, impl="pallas")
    assert calls.get("called")  # forced mode always reaches the kernel


def test_auto_flash_window_numerics(rng):
    """Window-sized sequence through the real kernel (interpret mode,
    HIGHEST precision, small B/H to keep it fast): matches einsum."""
    B, T, H, D = 1, 1024, 1, 16
    mk = lambda: jnp.asarray(
        (0.3 * rng.standard_normal((B, T, H, D))).astype(np.float32)
    )
    q, k, v = mk(), mk(), mk()
    out = mha_pallas(q, k, v, interpret=True,
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mha_xla(q, k, v)), atol=2e-5
    )


def test_attn_batch_cap_flash_vs_xla(monkeypatch):
    """The engine's quadratic score cap mirrors mha's 'auto' rule: only
    a forced kernel or a bf16-score config inside the flash window
    escapes to the linear sample budget."""
    import jax as _jax

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import engine as eng

    model = NomadModel(Wav2Vec2Config.base(attention_impl="xla"), emb_dim=256)
    e = eng.EmbeddingEngine(model, params={})
    quad = e._attn_batch_cap(1_310_720)  # 80 s -> T'=4095
    assert quad <= 5  # two 9 GB score buffers at B=12 OOMed the chip
    assert e.batch_size_for(1_310_720) <= 4  # power-of-two floor

    monkeypatch.setattr(eng.jax, "default_backend", lambda: "tpu")
    # 'auto' on a parity-class config ('exact': scores at 'high'): the
    # flip never fires, quadratic cap at every length
    model_auto = NomadModel(
        Wav2Vec2Config.base(attention_impl="auto"), emb_dim=256
    )
    e2 = eng.EmbeddingEngine(model_auto, params={})
    assert e2._attn_batch_cap(655_360) == e._attn_batch_cap(655_360)
    assert e2._attn_batch_cap(1_310_720) <= 5
    # 'auto' on the bf16-score default ('balanced'): flash inside the
    # window -> linear budget; beyond it -> quadratic again
    model_bal = NomadModel(
        Wav2Vec2Config.balanced(attention_impl="auto"), emb_dim=256
    )
    e3 = eng.EmbeddingEngine(model_bal, params={})
    assert e3._attn_batch_cap(655_360) == eng.MAX_BATCH  # T'=2047
    assert e3._attn_batch_cap(1_310_720) == eng.MAX_BATCH  # T'=4095
    assert e3._attn_batch_cap(2_621_440) <= 2  # T'=8191: beyond window
    model_p = NomadModel(
        Wav2Vec2Config.base(attention_impl="pallas"), emb_dim=256
    )
    e4 = eng.EmbeddingEngine(model_p, params={})
    assert e4._attn_batch_cap(1_310_720) == eng.MAX_BATCH  # forced kernel
