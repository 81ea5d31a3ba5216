"""NOMAD heads over the wav2vec2 backbone.

Reference equivalents (kept as ONE definition here, per SURVEY §2.2):
  * ``TripletModel``  — `/root/reference/src/nomad_audio/nomad.py:214-231`
    (== `src/models/networks.py:4-21`): mean-pool over time -> ReLU ->
    Linear 768->256 -> L2 normalize.
  * ``LossNetLayers`` — `nomad.py:233-258`: same embedding plus all 12
    transformer layer activations (batch-major here; the reference permutes
    from fairseq's time-major at `nomad.py:248`).
  * ``Origw2v``       — `src/models/networks.py:23-33`: raw mean-pooled
    768-d features, for the eval_w2v ablation.

Quirk Q7 parity: the loss path's embedding head is a *separate* Dense that
the NOMAD checkpoint never populates — it stays randomly initialized, exactly
like ``LossNetLayers.embedding_layer`` in the reference (`nomad.py:71`).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Model, masked_mean


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class NomadModel(nn.Module):
    """Backbone + scoring head + (separate, untrained) lossnet head.

    ``__call__`` returns the 256-d L2-normalized NOMAD embedding.
    ``forward_layers`` returns the 13-element list consumed by NomadLoss:
    12 transformer layer activations [B, T', 768] + the lossnet embedding
    [B, 256] (`nomad.py:243-258`).
    """

    config: Wav2Vec2Config = Wav2Vec2Config()
    emb_dim: int = 256
    # With True (default), batched scoring masks the mean-pool to valid
    # frames so padded batching matches the reference's unpadded batch-1
    # inference. lengths=None falls back to pooling over the padded axis
    # (reference training semantics, quirk Q6).
    masked_pool: bool = True

    def setup(self):
        self.backbone = Wav2Vec2Model(self.config, name="backbone")
        self.embedding = nn.Dense(
            self.emb_dim,
            dtype=self.config.dtype,
            param_dtype=jnp.float32,
            name="embedding",
        )
        self.lossnet_embedding = nn.Dense(
            self.emb_dim,
            dtype=self.config.dtype,
            param_dtype=jnp.float32,
            name="lossnet_embedding",
        )

    def _embed(self, head, x, frame_lengths):
        # f32 island: whatever dtype the block stack ran in (bf16 in the
        # 'fast' recipe), the time pool, ReLU, 256-d head and L2 normalize
        # run in f32 at 'high' MXU precision — the head matmul is tiny and
        # the pooled mean is the quantity the score budget is written
        # against.
        x = x.astype(jnp.float32)
        pooled = masked_mean(x, frame_lengths if self.masked_pool else None)
        with jax.default_matmul_precision("high"):
            e = head(jax.nn.relu(pooled))
        return l2_normalize(e.astype(jnp.float32), axis=-1)

    def __call__(self, wav, lengths=None, deterministic: bool = True):
        res = self.backbone(wav, lengths=lengths, deterministic=deterministic)
        return self._embed(self.embedding, res["x"], res["frame_lengths"])

    def forward_layers(self, wav, lengths=None, deterministic: bool = True):
        res = self.backbone(wav, lengths=lengths, deterministic=deterministic)
        emb = self._embed(self.lossnet_embedding, res["x"], res["frame_lengths"])
        layers = [res["layers"][i] for i in range(self.config.num_layers)]
        return layers + [emb]

    def init_all(self, wav, lengths=None):
        """Init-time method touching every param (setup is lazy: a plain
        ``__call__`` init would skip the lossnet head)."""
        res = self.backbone(wav, lengths=lengths, deterministic=True)
        e1 = self._embed(self.embedding, res["x"], res["frame_lengths"])
        e2 = self._embed(self.lossnet_embedding, res["x"], res["frame_lengths"])
        return e1, e2

    def forward_features(self, wav, lengths=None, deterministic: bool = True):
        """Origw2v: raw mean-pooled backbone features [B, 768]."""
        res = self.backbone(wav, lengths=lengths, deterministic=deterministic)
        return masked_mean(
            res["x"].astype(jnp.float32),
            res["frame_lengths"] if self.masked_pool else None,
        )


def nomad_loss(ref_layers, test_layers, frame_lengths=None):
    """Sum of per-layer mean-absolute distances (`nomad.py:260-282`).

    torch F.l1_loss averages over every element including padded frames —
    with frame_lengths=None we match that exactly. Passing frame_lengths
    masks padded frames out of the per-layer means (documented improvement
    for batched padded inputs).
    """
    total = 0.0
    n = len(ref_layers)
    for i in range(n):
        r = ref_layers[i]
        t = test_layers[i]
        diff = jnp.abs(t.astype(jnp.float32) - r.astype(jnp.float32))
        if frame_lengths is not None and diff.ndim == 3:
            mask = (
                jnp.arange(diff.shape[1])[None, :] < frame_lengths[:, None]
            ).astype(diff.dtype)[:, :, None]
            total += jnp.sum(diff * mask) / (
                jnp.sum(mask) * diff.shape[-1]
            )
        else:
            total += jnp.mean(diff)
    return total
