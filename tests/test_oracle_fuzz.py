"""Randomized architecture equivalence vs the torch oracle: several random
small configs (varying depth/width/heads/conv stacks) must all match HF
Wav2Vec2 layerwise after conversion — guards the converter and model against
config-dependent bugs that the single tiny config could mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.convert import canonicalize, merge_into, to_flax_params
from nomad_tpu.convert.oracle import TorchNomadOracle
from nomad_tpu.models import NomadModel, Wav2Vec2Config

CONFIGS = [
    # (conv_dim, kernel, stride, hidden, layers, heads, ffn, pos_k, pos_g)
    ((24, 24), (8, 4), (4, 2), 48, 1, 2, 96, 8, 2),
    ((32, 48, 48), (10, 3, 2), (5, 2, 2), 96, 3, 6, 192, 32, 8),
    ((16, 16, 16, 16), (6, 3, 3, 2), (3, 2, 2, 2), 64, 2, 8, 256, 16, 4),
]


@pytest.mark.parametrize("spec", CONFIGS)
def test_random_config_parity(spec):
    conv_dim, kernel, stride, hidden, layers, heads, ffn, pos_k, pos_g = spec
    cfg = Wav2Vec2Config(
        conv_dim=conv_dim,
        conv_kernel=kernel,
        conv_stride=stride,
        hidden_size=hidden,
        num_layers=layers,
        num_heads=heads,
        ffn_dim=ffn,
        pos_conv_kernel=pos_k,
        pos_conv_groups=pos_g,
    )
    oracle = TorchNomadOracle(cfg, emb_dim=8, seed=1)
    model = NomadModel(cfg, emb_dim=8)
    wav = (0.2 * np.random.default_rng(2).standard_normal((2, 900))).astype(
        np.float32
    )
    params = model.init(
        jax.random.key(0), jnp.asarray(wav), method=NomadModel.init_all
    )
    params = merge_into(
        params,
        to_flax_params(
            canonicalize(oracle.state_dict()), cfg.num_layers, len(conv_dim)
        ),
    )
    t_final, t_layers = oracle.backbone_outputs(wav)
    res = model.apply(params, jnp.asarray(wav), method=lambda m, w: m.backbone(w))
    j_layers = np.asarray(res["layers"])
    for i in range(cfg.num_layers):
        assert np.max(np.abs(j_layers[i] - t_layers[i])) < 2e-4, f"layer {i}"
    e_t = oracle.embed(wav)
    e_j = np.asarray(model.apply(params, jnp.asarray(wav)))
    assert np.max(np.abs(e_t - e_j)) < 1e-4
