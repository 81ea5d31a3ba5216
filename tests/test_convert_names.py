"""Converter name-mapping tests: the real checkpoints use fairseq naming
(``wav2vec_small.pt`` state under ckpt['model'];``nomad_best_model.pt`` is a
TripletModel state_dict with an ``ssl_model.`` prefix — reference
`nomad.py:58-68`). We synthesize fairseq-named state_dicts from the HF
oracle's weights and check both spellings convert to identical pytrees."""

import numpy as np
import pytest

from nomad_tpu.convert import canonicalize, to_flax_params
from nomad_tpu.convert.oracle import TorchNomadOracle
from nomad_tpu.models import Wav2Vec2Config


@pytest.fixture(scope="module")
def oracle():
    return TorchNomadOracle(Wav2Vec2Config.tiny(), emb_dim=16, seed=0)


def hf_to_fairseq_names(sd):
    """Rename an HF Wav2Vec2Model state_dict to fairseq conventions."""
    out = {}
    for k, v in sd.items():
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest == "conv.weight":
                out[f"feature_extractor.conv_layers.{i}.0.weight"] = v
            elif rest == "layer_norm.weight":
                out[f"feature_extractor.conv_layers.{i}.2.weight"] = v
            elif rest == "layer_norm.bias":
                out[f"feature_extractor.conv_layers.{i}.2.bias"] = v
        elif k.startswith("feature_projection.layer_norm."):
            out["layer_norm." + k.split(".")[-1]] = v
        elif k.startswith("feature_projection.projection."):
            out["post_extract_proj." + k.split(".")[-1]] = v
        elif "pos_conv_embed.conv" in k:
            leaf = k.split(".")[-1]
            if "original0" in k:
                out["encoder.pos_conv.0.weight_g"] = v
            elif "original1" in k:
                out["encoder.pos_conv.0.weight_v"] = v
            elif leaf == "weight_g":
                out["encoder.pos_conv.0.weight_g"] = v
            elif leaf == "weight_v":
                out["encoder.pos_conv.0.weight_v"] = v
            elif leaf == "bias":
                out["encoder.pos_conv.0.bias"] = v
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            ren = {
                "attention.q_proj": "self_attn.q_proj",
                "attention.k_proj": "self_attn.k_proj",
                "attention.v_proj": "self_attn.v_proj",
                "attention.out_proj": "self_attn.out_proj",
                "layer_norm": "self_attn_layer_norm",
                "feed_forward.intermediate_dense": "fc1",
                "feed_forward.output_dense": "fc2",
                "final_layer_norm": "final_layer_norm",
            }
            for src, dst in ren.items():
                if rest.startswith(src + "."):
                    out[f"encoder.layers.{i}.{dst}.{rest[len(src)+1:]}"] = v
                    break
        elif k.startswith("encoder.layer_norm."):
            out[k] = v
        elif k == "masked_spec_embed":
            out["mask_emb"] = v
    # fairseq checkpoints also carry pretraining heads that
    # remove_pretraining_modules() strips — converter must skip them
    out["quantizer.vars"] = np.zeros((1, 640, 128), np.float32)
    out["project_q.weight"] = np.zeros((256, 256), np.float32)
    out["final_proj.weight"] = np.zeros((256, 768), np.float32)
    return out


def test_fairseq_names_equal_hf_names(oracle):
    cfg = Wav2Vec2Config.tiny()
    sd_hf = {k: v for k, v in oracle.backbone.state_dict().items()}
    sd_fs = hf_to_fairseq_names(sd_hf)
    p_hf = to_flax_params(canonicalize(sd_hf), cfg.num_layers, len(cfg.conv_dim))
    p_fs = to_flax_params(canonicalize(sd_fs), cfg.num_layers, len(cfg.conv_dim))

    import jax

    leaves_hf, treedef_hf = jax.tree_util.tree_flatten(p_hf)
    leaves_fs, treedef_fs = jax.tree_util.tree_flatten(p_fs)
    assert treedef_hf == treedef_fs
    for a, b in zip(leaves_hf, leaves_fs):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_nomad_checkpoint_names(oracle):
    """TripletModel state_dict: ssl_model.* + embedding_layer.1.*"""
    cfg = Wav2Vec2Config.tiny()
    sd_fs = hf_to_fairseq_names(
        {k: v for k, v in oracle.backbone.state_dict().items()}
    )
    nomad_sd = {"ssl_model." + k: v for k, v in sd_fs.items()}
    head = oracle.head.state_dict()
    nomad_sd["embedding_layer.1.weight"] = head["1.weight"].numpy()
    nomad_sd["embedding_layer.1.bias"] = head["1.bias"].numpy()
    p = to_flax_params(canonicalize(nomad_sd), cfg.num_layers, len(cfg.conv_dim))
    assert "embedding" in p
    assert p["embedding"]["kernel"].shape == (cfg.hidden_size, 16)
    assert "backbone" in p


def test_weight_norm_composition():
    from nomad_tpu.convert.torch_to_jax import _compose_weight_norm

    import torch

    rng = np.random.default_rng(0)
    v = rng.standard_normal((8, 4, 6)).astype(np.float32)
    g = rng.standard_normal((1, 1, 6)).astype(np.float32)
    ours = _compose_weight_norm(g, v)
    theirs = torch._weight_norm(torch.from_numpy(v), torch.from_numpy(g), 2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
