"""Training losses with torch-parity semantics."""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_distance(a, b, eps: float = 1e-6):
    """torch F.pairwise_distance semantics: ||a - b + eps||_2 (eps added
    elementwise before the norm — keeps the gradient finite at a == b)."""
    d = a - b + eps
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def triplet_margin_loss(anchor, positive, negative, margin: float = 0.2):
    """torch nn.TripletMarginLoss(margin, p=2, reduction='mean') — the
    reference criterion (`/root/reference/src/training/train_triplet.py:95`)."""
    d_ap = pairwise_distance(anchor, positive)
    d_an = pairwise_distance(anchor, negative)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))
