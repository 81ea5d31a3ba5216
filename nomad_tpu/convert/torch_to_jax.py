"""Checkpoint conversion: torch state_dicts -> flax param pytree.

Handles the three checkpoint families the reference ecosystem uses:

  * **fairseq** ``wav2vec_small.pt`` — loaded by the reference at
    `/root/reference/src/nomad_audio/nomad.py:58-60` via
    ``fairseq.checkpoint_utils``; its state lives under ``ckpt['model']``
    with keys like ``feature_extractor.conv_layers.0.0.weight``.
  * **NOMAD** ``nomad_best_model.pt`` — a full TripletModel state_dict
    (backbone under ``ssl_model.`` + ``embedding_layer.1.{weight,bias}``,
    `nomad.py:63-68`).
  * **HuggingFace** ``Wav2Vec2Model`` — same architecture, different names;
    used as the offline numerics oracle (fairseq is not installable here).

Pure torch-CPU + numpy; no torch code runs on the TPU path.

Transforms applied:
  * Linear  [out,in]       -> kernel [in,out]
  * Conv1d  [out,in/g,k]   -> kernel [k,in/g,out]
  * weight-normed pos_conv -> composed single kernel g * v/||v|| (norm over
    dims (0,1), torch ``weight_norm(dim=2)`` semantics). We train the
    composed weight directly — a documented reparameterization divergence.
  * per-layer transformer weights -> stacked [num_layers, ...] for nn.scan.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _compose_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm with dim=2 on a [out, in/g, k] conv weight."""
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1), keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(np.float32)


# --- name canonicalization -------------------------------------------------

_HF_LAYER = re.compile(r"encoder\.layers\.(\d+)\.(.+)")

_HF_ATTN = {
    "attention.q_proj": "q_proj",
    "attention.k_proj": "k_proj",
    "attention.v_proj": "v_proj",
    "attention.out_proj": "out_proj",
    "layer_norm": "self_attn_layer_norm",
    "feed_forward.intermediate_dense": "fc1",
    "feed_forward.output_dense": "fc2",
    "final_layer_norm": "final_layer_norm",
}

_FS_ATTN = {
    "self_attn.q_proj": "q_proj",
    "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj",
    "self_attn.out_proj": "out_proj",
    "self_attn_layer_norm": "self_attn_layer_norm",
    "fc1": "fc1",
    "fc2": "fc2",
    "final_layer_norm": "final_layer_norm",
}

_SKIP_PATTERNS = (
    "quantizer",
    "project_q",
    "final_proj",
    "mask_emb",
    "masked_spec_embed",
    "spec_embed",
    "adapter",
)


def canonicalize(sd: Mapping[str, "np.ndarray"]) -> dict[str, np.ndarray]:
    """Normalize fairseq/HF/NOMAD names to one canonical flat dict:

      conv.{i}.weight, group_norm.{weight,bias},
      feature_layer_norm.{weight,bias}, post_extract_proj.{weight,bias},
      pos_conv.{weight_g,weight_v,bias} (or pos_conv.weight already composed),
      encoder_layer_norm.{weight,bias},
      layer.{i}.{q_proj,k_proj,v_proj,out_proj,self_attn_layer_norm,fc1,fc2,
                 final_layer_norm}.{weight,bias},
      embedding.{weight,bias}            (NOMAD scoring head)
    """
    out: dict[str, np.ndarray] = {}
    for key, val in sd.items():
        k = key
        # strip common wrappers
        for prefix in ("wav2vec2.", "ssl_model.", "model.", "w2v_encoder.w2v_model."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
        if any(p in k for p in _SKIP_PATTERNS):
            continue
        v = _np(val)

        # --- NOMAD head: embedding_layer.1 is the Linear in Sequential(ReLU, Linear)
        if k.startswith("embedding_layer.1."):
            out["embedding." + k.split(".")[-1]] = v
            continue

        # --- feature extractor ---
        m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.(.+)", k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            if rest in ("0.weight", "conv.weight"):
                out[f"conv.{i}.weight"] = v
            elif rest in ("2.weight", "2.2.weight", "layer_norm.weight"):
                out["group_norm.weight"] = v
            elif rest in ("2.bias", "2.2.bias", "layer_norm.bias"):
                out["group_norm.bias"] = v
            continue

        # --- feature projection ---
        if k.startswith("layer_norm."):  # fairseq post-extractor LN
            out["feature_layer_norm." + k.split(".")[-1]] = v
            continue
        if k.startswith("feature_projection.layer_norm."):
            out["feature_layer_norm." + k.split(".")[-1]] = v
            continue
        if k.startswith("post_extract_proj."):
            out["post_extract_proj." + k.split(".")[-1]] = v
            continue
        if k.startswith("feature_projection.projection."):
            out["post_extract_proj." + k.split(".")[-1]] = v
            continue

        # --- positional conv ---
        if "pos_conv" in k:
            leaf = k.split(".")[-1]
            if "original0" in k or leaf == "weight_g":
                out["pos_conv.weight_g"] = v
            elif "original1" in k or leaf == "weight_v":
                out["pos_conv.weight_v"] = v
            elif leaf == "bias":
                out["pos_conv.bias"] = v
            elif leaf == "weight":
                out["pos_conv.weight"] = v
            continue

        # --- encoder top-level LN ---
        if k.startswith("encoder.layer_norm."):
            out["encoder_layer_norm." + k.split(".")[-1]] = v
            continue

        # --- transformer layers ---
        m = _HF_LAYER.match(k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            for table in (_FS_ATTN, _HF_ATTN):
                hit = None
                for src, dst in table.items():
                    if rest.startswith(src + "."):
                        hit = (dst, rest[len(src) + 1 :])
                        break
                if hit:
                    out[f"layer.{i}.{hit[0]}.{hit[1]}"] = v
                    break
            continue
        # silently ignore anything else (dropout has no params; unknown heads)
    return out


def to_flax_params(
    canon: Mapping[str, np.ndarray],
    num_layers: int = 12,
    num_conv_layers: int = 7,
) -> dict:
    """Canonical flat dict -> flax params matching
    :class:`nomad_tpu.models.NomadModel` (scan-stacked transformer)."""

    def lin(prefix):
        return {
            "kernel": np.ascontiguousarray(canon[prefix + ".weight"].T),
            "bias": canon[prefix + ".bias"],
        }

    def ln(prefix):
        return {"scale": canon[prefix + ".weight"], "bias": canon[prefix + ".bias"]}

    feature_encoder: dict = {}
    for i in range(num_conv_layers):
        w = canon[f"conv.{i}.weight"]  # [out, in, k]
        feature_encoder[f"conv_{i}"] = {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))
        }
    feature_encoder["group_norm"] = {
        "scale": canon["group_norm.weight"],
        "bias": canon["group_norm.bias"],
    }

    if "pos_conv.weight" in canon:
        pos_w = canon["pos_conv.weight"]
    else:
        pos_w = _compose_weight_norm(
            canon["pos_conv.weight_g"], canon["pos_conv.weight_v"]
        )
    pos_conv = {
        "conv": {
            "kernel": np.ascontiguousarray(np.transpose(pos_w, (2, 1, 0))),
            "bias": canon["pos_conv.bias"],
        }
    }

    def stack(fn):
        return {
            "kernel": np.stack([fn(i)["kernel"] for i in range(num_layers)]),
            "bias": np.stack([fn(i)["bias"] for i in range(num_layers)]),
        }

    layer_params: dict = {}
    for name in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"):
        layer_params[name] = stack(lambda i, n=name: lin(f"layer.{i}.{n}"))
    for name in ("self_attn_layer_norm", "final_layer_norm"):
        layer_params[name] = {
            "scale": np.stack(
                [canon[f"layer.{i}.{name}.weight"] for i in range(num_layers)]
            ),
            "bias": np.stack(
                [canon[f"layer.{i}.{name}.bias"] for i in range(num_layers)]
            ),
        }

    backbone = {
        "feature_encoder": feature_encoder,
        "feature_layer_norm": ln("feature_layer_norm"),
        "post_extract_proj": lin("post_extract_proj"),
        "encoder": {
            "pos_conv": pos_conv,
            "layer_norm": ln("encoder_layer_norm"),
            "layers": {"layer": layer_params},
        },
    }
    params = {"backbone": backbone}
    if "embedding.weight" in canon:
        params["embedding"] = lin("embedding")
    return params


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pt file (fairseq ckpt dict or raw state_dict) -> numpy dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]  # fairseq checkpoint wrapper
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "detach") or isinstance(v, np.ndarray)}


def convert_checkpoint(path: str, num_layers: int = 12) -> dict:
    """One-call path -> flax params (backbone [+ scoring head if present])."""
    sd = load_torch_checkpoint(path)
    return to_flax_params(canonicalize(sd), num_layers=num_layers)


def merge_into(params: dict, converted: dict) -> dict:
    """Overlay converted weights onto an init pytree (keeps e.g. the
    randomly-initialized lossnet head — quirk Q7 — untouched), with shape
    checks."""
    import jax

    out = jax.tree_util.tree_map(lambda x: x, params)  # copy

    def rec(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted param {path + k} not in model tree")
            if isinstance(v, dict):
                rec(dst[k], v, path + k + "/")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path + k}: model {dst[k].shape} "
                        f"vs checkpoint {v.shape}"
                    )
                dst[k] = np.asarray(v, dtype=np.float32)

    root = out["params"] if "params" in out else out
    rec(root, converted)
    return out
