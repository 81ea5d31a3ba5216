"""Multi-head self-attention for the wav2vec2 encoder.

Replaces the torch/fairseq ``MultiheadAttention`` CUDA path invoked by every
backbone forward (`/root/reference/src/nomad_audio/nomad.py:226`). Two
implementations behind one interface:

  * ``xla``    — einsum attention; XLA fuses scale/softmax into the two MXU
                 matmuls. Default, works everywhere.
  * ``pallas`` — fused flash-style TPU kernel (see
                 :mod:`nomad_tpu.ops.flash_attention`) that never
                 materializes the [B, H, T, T] score matrix in HBM.

Numerics match torch ``F.multi_head_attention_forward``: q is pre-scaled by
1/sqrt(head_dim) before the QK^T matmul; softmax in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative additive mask; exp underflows to exactly 0 in f32

# 'auto' dispatch window for the flash kernel (frames, i.e. ~20 ms units):
#   * below 1024 the einsum path wins — XLA fuses scale/softmax into two
#     short matmuls and the score matrix is small (T'=511: xla 4.65 ms vs
#     flash-HIGHEST 5.75 ms)
#   * in [1024, 4096] flash-HIGHEST is ~1.6-1.7x faster (T=2048: 13.8 vs
#     23.8 ms; T=4096: 14.5 vs 22.7) at 7e-6 error AND O(T) memory — the
#     einsum path's two [B, H, T, T] f32 buffers are what OOM long files
#   * above 4096 the forward's VMEM-resident K/V no longer fits; XLA again
#     (rare: >80 s files)
AUTO_FLASH_MIN_T = 1024
AUTO_FLASH_MAX_T = 4096


def mha_xla(q, k, v, key_mask=None):
    """Attention on [B, T, H, D] tensors.

    key_mask: optional bool [B, T] (True = valid key). Masked keys receive an
    additive -1e9 before softmax, which reproduces unpadded attention exactly
    for valid queries (masked terms underflow to zero weight).
    """
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim**0.5)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if key_mask is not None:
        scores = scores + jnp.where(key_mask, 0.0, NEG_INF)[:, None, None, :]
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32).astype(
        v.dtype
    )


def mha(q, k, v, key_mask=None, impl: str = "xla"):
    if impl == "auto":
        t = q.shape[1]
        if (
            AUTO_FLASH_MIN_T <= t <= AUTO_FLASH_MAX_T
            and jax.default_backend() == "tpu"
        ):
            from .flash_attention import mha_pallas

            # HIGHEST: f32 dots inside the kernel — 7e-6 from the einsum
            # reference, parity-grade (the DEFAULT bf16 variant's 2.5e-4
            # embedding error is what kept pallas off the scoring path)
            return mha_pallas(
                q, k, v, key_mask=key_mask,
                precision=jax.lax.Precision.HIGHEST,
            )
        impl = "xla"
    if impl == "pallas":
        from .flash_attention import mha_pallas

        return mha_pallas(q, k, v, key_mask=key_mask)
    return mha_xla(q, k, v, key_mask=key_mask)
