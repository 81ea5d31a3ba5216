"""Backbone + heads unit tests (tiny config; fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.models import (
    NomadModel,
    Wav2Vec2Config,
    feature_frame_lengths,
    masked_mean,
    nomad_loss,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 800)).astype(np.float32)
    )
    params = model.init(jax.random.key(0), wav, method=NomadModel.init_all)
    return cfg, model, params, wav


def test_embedding_shape_and_norm(tiny):
    cfg, model, params, wav = tiny
    emb = model.apply(params, wav)
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5
    )


def test_frame_length_arithmetic(tiny):
    cfg, *_ = tiny
    # conv (10,5),(3,2),(2,2): 800 -> 159 -> 79 -> 39
    assert feature_frame_lengths(np.array([800]), cfg)[0] == 39
    res_cfg = Wav2Vec2Config.base()
    # BASE: stride 320, RF 400 -> 16000 samples -> 49 frames
    assert feature_frame_lengths(np.array([16000]), res_cfg)[0] == 49


def test_masked_batching_matches_unpadded(tiny):
    """THE TPU-batching invariant: padded+masked batched inference must equal
    the reference's unpadded batch-1 (`nomad.py:172-183`) to float noise."""
    cfg, model, params, wav = tiny
    w1 = wav[:1, :500]
    e_ref = model.apply(params, w1)
    padded = jnp.concatenate([w1, jnp.zeros((1, 300))], axis=1)
    e_masked = model.apply(params, padded, lengths=jnp.array([500]))
    np.testing.assert_allclose(np.asarray(e_ref), np.asarray(e_masked), atol=1e-5)

    # mixed-length batch
    w2 = wav[1:2, :800]
    batch = jnp.concatenate([padded, w2], axis=0)
    e_b = model.apply(params, batch, lengths=jnp.array([500, 800]))
    e2_ref = model.apply(params, w2)
    np.testing.assert_allclose(np.asarray(e_b[0:1]), np.asarray(e_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_b[1:2]), np.asarray(e2_ref), atol=1e-5)


def test_unmasked_mode_pools_over_padding(tiny):
    """Quirk Q6 parity: lengths=None mean-pools padded frames, so a padded
    item must NOT match its unpadded embedding."""
    cfg, model, params, wav = tiny
    w1 = wav[:1, :500]
    e_ref = model.apply(params, w1)
    padded = jnp.concatenate([w1, jnp.zeros((1, 300))], axis=1)
    e_unmasked = model.apply(params, padded)
    assert float(jnp.max(jnp.abs(e_ref - e_unmasked))) > 1e-4


def test_forward_layers_13_elements(tiny):
    cfg, model, params, wav = tiny
    layers = model.apply(params, wav, method=NomadModel.forward_layers)
    assert len(layers) == cfg.num_layers + 1
    assert layers[0].shape == (2, 39, cfg.hidden_size)
    assert layers[-1].shape == (2, 16)
    # final transformer layer == backbone 'x' (post-norm: no trailing LN)
    res = model.apply(params, wav, method=lambda m, w: m.backbone(w))
    np.testing.assert_allclose(
        np.asarray(layers[cfg.num_layers - 1]), np.asarray(res["x"]), atol=1e-6
    )


def test_lossnet_head_is_independent(tiny):
    """Quirk Q7: the loss path embedding head is separate from the scoring
    head (reference leaves it untrained, `nomad.py:71`)."""
    cfg, model, params, wav = tiny
    emb_scoring = model.apply(params, wav)
    layers = model.apply(params, wav, method=NomadModel.forward_layers)
    assert float(jnp.max(jnp.abs(emb_scoring - layers[-1]))) > 1e-4


def test_nomad_loss_matches_torch_l1(tiny):
    cfg, model, params, wav = tiny
    from nomad_tpu.convert.oracle import nomad_loss_torch

    la = model.apply(params, wav, method=NomadModel.forward_layers)
    lb = model.apply(params, wav * 0.9, method=NomadModel.forward_layers)
    ours = float(nomad_loss(la, lb))
    theirs = nomad_loss_torch(
        [np.asarray(x) for x in la], [np.asarray(x) for x in lb]
    )
    assert abs(ours - theirs) < 1e-5
    # identical inputs -> zero loss
    assert float(nomad_loss(la, la)) == 0.0


def test_masked_mean():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    m = masked_mean(x, jnp.array([2, 3]))
    np.testing.assert_allclose(
        np.asarray(m[0]), np.asarray(jnp.mean(x[0, :2], axis=0)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m[1]), np.asarray(jnp.mean(x[1], axis=0)), atol=1e-6
    )


def test_grad_through_loss(tiny):
    """BASELINE config 3: gradients must flow through the 13-layer loss into
    the estimate waveform and be finite."""
    cfg, model, params, wav = tiny

    def loss_fn(est, clean):
        la = model.apply(params, est, method=NomadModel.forward_layers)
        lb = model.apply(params, clean, method=NomadModel.forward_layers)
        return nomad_loss(lb, la)

    g = jax.grad(loss_fn)(wav * 0.8, wav)
    assert g.shape == wav.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_remat_policies_match_no_remat_grads(tiny, policy):
    """remat (both policies) is a pure memory/recompute trade: outputs and
    gradients must match the no-remat graph to float noise."""
    import dataclasses

    cfg, _, params, wav = tiny
    base = NomadModel(cfg, emb_dim=16)
    rcfg = dataclasses.replace(cfg, remat=True, remat_policy=policy)
    rmodel = NomadModel(rcfg, emb_dim=16)

    def loss(m):
        def f(p):
            return jnp.sum(jnp.square(m.apply(p, wav)))
        return f

    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rmodel))(params)
    assert abs(float(l0) - float(l1)) < 1e-5
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_frontend_stop_gradient_preserves_trainable_grads(tiny):
    """frontend_stop_gradient must zero conv grads and leave every other
    param grad unchanged (it only prunes a backward leg the freeze policy
    discards anyway)."""
    import dataclasses

    cfg, _, params, wav = tiny
    base = NomadModel(cfg, emb_dim=16)
    pruned = NomadModel(
        dataclasses.replace(cfg, frontend_stop_gradient=True), emb_dim=16
    )

    def loss(m):
        return lambda p: jnp.sum(jnp.square(m.apply(p, wav)))

    g0 = jax.grad(loss(base))(params)["params"]
    g1 = jax.grad(loss(pruned))(params)["params"]
    # conv grads pruned to exactly zero
    for leaf in jax.tree.leaves(g1["backbone"]["feature_encoder"]):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0
    # everything else identical
    for key in ("embedding",):
        for a, b in zip(jax.tree.leaves(g0[key]), jax.tree.leaves(g1[key])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for sub in ("encoder", "post_extract_proj", "feature_layer_norm"):
        for a, b in zip(
            jax.tree.leaves(g0["backbone"][sub]),
            jax.tree.leaves(g1["backbone"][sub]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unknown_remat_policy_rejected(tiny):
    import dataclasses

    cfg, _, params, wav = tiny
    bad = NomadModel(
        dataclasses.replace(cfg, remat=True, remat_policy="half"), emb_dim=16
    )
    with pytest.raises(ValueError, match="remat_policy"):
        bad.apply(params, wav)


def test_dropout_training_mode(tiny):
    cfg, model, params, wav = tiny
    e1 = model.apply(
        params, wav, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    e2 = model.apply(
        params, wav, deterministic=False, rngs={"dropout": jax.random.key(2)}
    )
    assert float(jnp.max(jnp.abs(e1 - e2))) > 1e-6  # dropout active
    e3 = model.apply(params, wav)
    e4 = model.apply(params, wav)
    np.testing.assert_array_equal(np.asarray(e3), np.asarray(e4))


def test_precision_islands_structurally_inert(tiny):
    """The round-4 finest islands + encoder tail split (scripts/
    precision_ladder.py) must be pure precision annotations: on CPU (where
    XLA ignores dot precision) every recipe is bit-identical to the plain
    path, the param tree is unchanged (checkpoint compat), and the
    tail-split cond machinery adds no numeric structure of its own."""
    cfg, model, params, wav = tiny
    base = np.asarray(model.apply(params, wav))

    finest = NomadModel(
        Wav2Vec2Config.tiny(
            attn_score_precision="highest",
            ffn1_precision="highest",
            ffn2_precision="high",
            posconv_precision="highest",
            featproj_precision="highest",
        ),
        emb_dim=16,
    )
    np.testing.assert_array_equal(np.asarray(finest.apply(params, wav)), base)

    split_cfg = Wav2Vec2Config.tiny(
        encoder_tail_start=1, encoder_tail_precision="default"
    )
    split = NomadModel(split_cfg, emb_dim=16)
    np.testing.assert_array_equal(np.asarray(split.apply(params, wav)), base)

    p2 = split.init(jax.random.key(0), wav, method=NomadModel.init_all)
    assert jax.tree.map(lambda a: a.shape, p2) == jax.tree.map(
        lambda a: a.shape, params
    )


def test_encoder_tail_split_validation():
    with pytest.raises(ValueError, match="encoder_tail_start"):
        Wav2Vec2Config.tiny(encoder_tail_start=2,
                            encoder_tail_precision="default")
    with pytest.raises(NotImplementedError, match="remat"):
        Wav2Vec2Config.tiny(encoder_tail_start=1,
                            encoder_tail_precision="default", remat=True)
