"""Numeric parity vs the torch-CPU oracle (HF Wav2Vec2 + reference-faithful
heads). This is the correctness linchpin (SURVEY §8 stage 3): it validates
the architecture, the checkpoint converter, and the masked batching together.

fairseq + the real checkpoints are unavailable offline; HF Wav2Vec2 is the
same architecture (the public checkpoint is HF's re-export of fairseq's), so
a converter-roundtrip on random weights proves the mapping. The converter
also recognizes fairseq names (tested in test_convert_names.py) so the real
``wav2vec_small.pt`` / ``nomad_best_model.pt`` convert with the same code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.convert import canonicalize, merge_into, to_flax_params
from nomad_tpu.convert.oracle import TorchNomadOracle
from nomad_tpu.models import NomadModel, Wav2Vec2Config


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = Wav2Vec2Config.tiny()
    oracle = TorchNomadOracle(cfg, emb_dim=16, seed=0)
    model = NomadModel(cfg, emb_dim=16)
    wav = (
        0.2 * np.random.default_rng(3).standard_normal((2, 1600))
    ).astype(np.float32)
    params = model.init(
        jax.random.key(0), jnp.asarray(wav), method=NomadModel.init_all
    )
    conv = to_flax_params(
        canonicalize(oracle.state_dict()),
        num_layers=cfg.num_layers,
        num_conv_layers=len(cfg.conv_dim),
    )
    params = merge_into(params, conv)
    return cfg, oracle, model, params, wav


def test_layerwise_parity(tiny_pair):
    cfg, oracle, model, params, wav = tiny_pair
    t_final, t_layers = oracle.backbone_outputs(wav)
    res = model.apply(params, jnp.asarray(wav), method=lambda m, w: m.backbone(w))
    j_layers = np.asarray(res["layers"])
    for i in range(cfg.num_layers):
        assert np.max(np.abs(j_layers[i] - t_layers[i])) < 1e-4, f"layer {i}"
    assert np.max(np.abs(np.asarray(res["x"]) - t_final)) < 1e-4


def test_embedding_parity(tiny_pair):
    cfg, oracle, model, params, wav = tiny_pair
    e_t = oracle.embed(wav)
    e_j = np.asarray(model.apply(params, jnp.asarray(wav)))
    assert np.max(np.abs(e_t - e_j)) < 1e-5


def test_score_parity_batched_vs_reference_loop(tiny_pair):
    """End-to-end mini NOMAD score: torch batch-1 loop + scipy cdist vs our
    padded masked batch + matmul cdist. Must agree well inside the 1e-3
    BASELINE budget."""
    from scipy.spatial.distance import cdist as scipy_cdist

    from nomad_tpu.ops import cdist

    cfg, oracle, model, params, _ = tiny_pair
    rng = np.random.default_rng(7)
    lengths = [1200, 800, 1500, 1000]
    waves = [
        (0.2 * rng.standard_normal(l)).astype(np.float32) for l in lengths
    ]
    # torch reference path: unpadded batch-1
    e_ref = oracle.embed_files(waves)
    # ours: single padded batch, masked
    maxlen = max(lengths)
    batch = np.zeros((len(waves), maxlen), np.float32)
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w
    e_j = np.asarray(
        model.apply(params, jnp.asarray(batch), lengths=jnp.asarray(lengths))
    )
    assert np.max(np.abs(e_ref - e_j)) < 1e-4

    d_ref = scipy_cdist(e_ref[:2], e_ref[2:])
    d_j = np.asarray(cdist(e_j[:2], e_j[2:]))
    assert np.max(np.abs(d_ref - d_j)) < 1e-3


def test_lossnet_layers_parity(tiny_pair):
    cfg, oracle, model, params, wav = tiny_pair
    t_layers = oracle.lossnet_forward(wav)
    j_layers = model.apply(
        params, jnp.asarray(wav), method=NomadModel.forward_layers
    )
    assert len(t_layers) == len(j_layers) == cfg.num_layers + 1
    for i in range(cfg.num_layers):  # transformer layers (head differs, Q7)
        assert np.max(np.abs(np.asarray(j_layers[i]) - t_layers[i])) < 1e-4
