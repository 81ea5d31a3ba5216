"""Synthesize fairseq-*named* checkpoints from an HF torch model.

The real ``wav2vec_small.pt`` / ``nomad_best_model.pt`` cannot be downloaded
in this environment, so conversion-day risk is rehearsed by exporting a
torch oracle's weights under the exact fairseq/NOMAD key layout the real
files use (`/root/reference/src/nomad_audio/nomad.py:58-68`) and running
them through the full ``Nomad._resolve_params`` -> canonicalize ->
to_flax_params -> merge_into -> score path (tests/test_fairseq_rehearsal.py).

Key layout reproduced:
  * fairseq ckpt: ``{"model": {"feature_extractor.conv_layers.0.0.weight",
    "feature_extractor.conv_layers.0.2.{weight,bias}" (GroupNorm),
    "post_extract_proj.*", "layer_norm.*" (post-extract LN),
    "encoder.pos_conv.0.{weight_g,weight_v,bias}",
    "encoder.layers.{i}.self_attn.{q,k,v,out}_proj.*", ... }, "args": None}``
  * NOMAD TripletModel state_dict: same keys under ``ssl_model.`` plus
    ``embedding_layer.1.{weight,bias}`` (the Linear in Sequential(ReLU,
    Linear), `nomad.py:216-219`).
"""

from __future__ import annotations


def hf_to_fairseq_names(hf_sd: dict) -> dict:
    """Rename a transformers Wav2Vec2Model state_dict to fairseq keys."""
    out = {}
    pos_leaf = {
        "bias": "bias",
        "weight_g": "weight_g",
        "weight_v": "weight_v",
        "parametrizations.weight.original0": "weight_g",
        "parametrizations.weight.original1": "weight_v",
    }
    for k, v in hf_sd.items():
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest == "conv.weight":
                out[f"feature_extractor.conv_layers.{i}.0.weight"] = v
            elif rest == "layer_norm.weight":
                out[f"feature_extractor.conv_layers.{i}.2.weight"] = v
            elif rest == "layer_norm.bias":
                out[f"feature_extractor.conv_layers.{i}.2.bias"] = v
        elif k == "feature_projection.layer_norm.weight":
            out["layer_norm.weight"] = v
        elif k == "feature_projection.layer_norm.bias":
            out["layer_norm.bias"] = v
        elif k == "feature_projection.projection.weight":
            out["post_extract_proj.weight"] = v
        elif k == "feature_projection.projection.bias":
            out["post_extract_proj.bias"] = v
        elif k.startswith("encoder.pos_conv_embed.conv."):
            leaf = k[len("encoder.pos_conv_embed.conv."):]
            if leaf in pos_leaf:
                out[f"encoder.pos_conv.0.{pos_leaf[leaf]}"] = v
        elif k.startswith("encoder.layer_norm."):
            out[k] = v
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            sub = parts[3]
            rest = ".".join(parts[4:])
            prefix = f"encoder.layers.{parts[2]}"
            if sub == "attention":
                out[f"{prefix}.self_attn.{rest}"] = v
            elif sub == "layer_norm":
                out[f"{prefix}.self_attn_layer_norm.{rest}"] = v
            elif sub == "feed_forward":
                fc = "fc1" if rest.startswith("intermediate_dense") else "fc2"
                out[f"{prefix}.{fc}.{rest.split('.')[-1]}"] = v
            elif sub == "final_layer_norm":
                out[f"{prefix}.final_layer_norm.{rest}"] = v
        elif k == "masked_spec_embed":
            out["mask_emb"] = v
    return out


def write_fairseq_checkpoint(oracle, path: str):
    """Save the oracle backbone as a ``wav2vec_small.pt``-shaped file."""
    import torch

    fs = hf_to_fairseq_names(oracle.backbone.state_dict())
    torch.save({"model": fs, "args": None, "cfg": None}, path)


def write_nomad_checkpoint(oracle, path: str):
    """Save backbone+head as a ``nomad_best_model.pt``-shaped TripletModel
    state_dict."""
    import torch

    fs = hf_to_fairseq_names(oracle.backbone.state_dict())
    sd = {f"ssl_model.{k}": v for k, v in fs.items()}
    head_sd = oracle.head.state_dict()
    sd["embedding_layer.1.weight"] = head_sd["1.weight"]
    sd["embedding_layer.1.bias"] = head_sd["1.bias"]
    torch.save(sd, path)
