"""torch-CPU parity oracle.

fairseq is not installable in this environment, so the independent numerics
oracle is HuggingFace ``Wav2Vec2Model`` (torch CPU) — the same architecture
family as the fairseq BASE checkpoint the reference loads
(`/root/reference/src/nomad_audio/nomad.py:58-60`); HF's converted weights
are the canonical re-export of fairseq's. On top of it we replicate the
reference heads in torch exactly as written:

  * TripletModel (`nomad.py:214-231`): mean over time -> ReLU -> Linear
    768->256 -> F.normalize.
  * LossNetLayers (`nomad.py:233-258`): per-layer activations + embedding.
  * NomadLoss (`nomad.py:260-282`): sum of 13 per-layer L1 means.

Everything here runs on CPU, only inside tests and checkpoint conversion.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..models.wav2vec2 import Wav2Vec2Config


def hf_config_from(cfg: Wav2Vec2Config):
    from transformers import Wav2Vec2Config as HFConfig

    return HFConfig(
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ffn_dim,
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_act="gelu",
        feat_extract_activation="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
        conv_bias=False,
    )


class TorchNomadOracle:
    """Reference-faithful torch pipeline: backbone + TripletModel head."""

    def __init__(self, cfg: Wav2Vec2Config, emb_dim: int = 256, seed: int = 0):
        import torch
        from transformers import Wav2Vec2Model as HFModel

        torch.manual_seed(seed)
        self.torch = torch
        self.cfg = cfg
        self.backbone = HFModel(hf_config_from(cfg)).eval()
        self.head = torch.nn.Sequential(
            torch.nn.ReLU(), torch.nn.Linear(cfg.hidden_size, emb_dim)
        ).eval()

    def state_dict(self) -> dict:
        sd = {k: v for k, v in self.backbone.state_dict().items()}
        head_sd = self.head.state_dict()
        sd["embedding_layer.1.weight"] = head_sd["1.weight"]
        sd["embedding_layer.1.bias"] = head_sd["1.bias"]
        return sd

    def backbone_outputs(self, wav: np.ndarray):
        """wav [B, T] -> (final [B,T',H], layers list of [B,T',H])."""
        torch = self.torch
        with torch.no_grad():
            out = self.backbone(
                torch.from_numpy(np.asarray(wav, np.float32)),
                output_hidden_states=True,
            )
        final = out.last_hidden_state.numpy()
        # hidden_states[0] is the block-0 input; [i+1] is block-i output
        layers = [h.numpy() for h in out.hidden_states[1:]]
        return final, layers

    def embed(self, wav: np.ndarray) -> np.ndarray:
        """TripletModel.forward (`nomad.py:224-231`)."""
        torch = self.torch
        with torch.no_grad():
            x = self.backbone(
                torch.from_numpy(np.asarray(wav, np.float32))
            ).last_hidden_state
            pooled = torch.mean(x, 1)
            e = self.head(pooled)
            e = torch.nn.functional.normalize(e, dim=1)
        return e.numpy()

    def embed_files(self, waves: list[np.ndarray]) -> np.ndarray:
        """Batch-1 unpadded loop, exactly like `nomad.py:172-183`."""
        return np.concatenate([self.embed(w[None, :]) for w in waves], axis=0)

    def lossnet_forward(self, wav: np.ndarray, head: Optional[object] = None):
        """LossNetLayers.forward (`nomad.py:243-258`) with a given head
        (defaults to self.head; the reference uses a separate untrained
        head — quirk Q7)."""
        torch = self.torch
        head = head if head is not None else self.head
        with torch.no_grad():
            out = self.backbone(
                torch.from_numpy(np.asarray(wav, np.float32)),
                output_hidden_states=True,
            )
            layers = [h for h in out.hidden_states[1:]]
            pooled = torch.mean(out.last_hidden_state, 1)
            e = torch.nn.functional.normalize(head(pooled), dim=1)
            return [l.numpy() for l in layers] + [e.numpy()]


def nomad_loss_torch(ref_layers, test_layers) -> float:
    """NomadLoss.forward default path (`nomad.py:276-281`)."""
    import torch

    total = 0.0
    for r, t in zip(ref_layers, test_layers):
        total += float(
            torch.nn.functional.l1_loss(
                torch.from_numpy(np.asarray(t)), torch.from_numpy(np.asarray(r))
            )
        )
    return total
