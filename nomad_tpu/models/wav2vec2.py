"""wav2vec 2.0 BASE backbone in flax.linen, designed TPU-first.

Reimplements the external fairseq backbone the reference loads at
`/root/reference/src/nomad_audio/nomad.py:58-60` and calls as
``ssl_model(wav, mask=False, features_only=True)``
(`nomad.py:226-228, 245-248`). Architecture (verified against the HF
``Wav2Vec2Config`` BASE defaults, which mirror the fairseq checkpoint):

  * 7-layer strided conv feature encoder, 512 ch, bias-free, GroupNorm(512)
    after layer 0 only, GELU after every layer; total stride 320, receptive
    field 400 samples (~49 frames/s at 16 kHz).
  * LayerNorm(512) + Linear 512->768 feature projection.
  * Grouped positional conv (k=128, groups=16, weight-norm composed at
    conversion time) + GELU, residual add, then LayerNorm (post-norm BASE).
  * 12 post-LN transformer blocks (d=768, 12 heads, FFN 3072, GELU); the
    per-block outputs are the reference's ``layer_results``.

TPU-first design choices (none of these exist in the torch original):

  * **Static shapes + exact masking.** The reference scores files one at a
    time, unpadded (`nomad.py:172-183`). To batch under XLA we pad to bucket
    lengths and keep *bit-accurate* equivalence with the unpadded compute:
    conv frame counts use the exact floor arithmetic, GroupNorm statistics
    are masked, padded frames are re-zeroed after every bias/norm, and
    attention masks padded keys (additive -1e9 underflows to weight 0).
    With ``lengths=None`` the model reproduces the reference's *training*
    semantics instead, where zero-padding leaks into GroupNorm/attention/
    mean-pool (SURVEY quirk Q6).
  * **nn.scan over the 12 blocks** — one compiled block body instead of 12,
    with stacked [12, ...] params; optional ``nn.remat`` for training.
  * **Pluggable attention** — ``xla`` einsum (default) or the fused Pallas
    flash kernel (``attention_impl='pallas'``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1            # residual + input dropout (fairseq `dropout`)
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    # fairseq BASE pretrains with layerdrop 0.05; we default to 0 (documented
    # divergence — layerdrop in a scanned stack is a keep-mask multiply).
    layerdrop: float = 0.0
    dtype: Any = jnp.float32        # compute dtype (params stay float32)
    # 'xla' (default): einsum attention — XLA fuses the projection
    # epilogues straight into the score matmuls, and in-model that beats
    # the flash kernel at every measured shape (encoder@T'=2047: 368 vs
    # 400 ms; @T'=4095: 281 vs 309) even though the kernel wins 1.6-1.7x
    # in isolation (the pallas call boundary forces q/k/v materialization
    # + [B,T,H,D]<->[BH,T,D] relayouts that eat the win).
    # 'auto': flash kernel ONLY where measured to win — T' in
    # [1024, 4096] on configs whose attention scores already run
    # single-pass bf16 ('balanced': attn_score_precision='default').
    # There the kernel's bf16 flavor is 1.192x end-to-end (batch
    # un-capped by the quadratic score buffers) at 6.73e-4 from the
    # 'exact' anchor (in budget); the round-3 flash-HIGHEST flavor
    # measured 0.651x in the same regime and is retired from 'auto'.
    # Parity-class configs ('exact'/'high' scores) stay on xla at every
    # length. Full history: ops/attention.py.
    # 'pallas': force the kernel everywhere (kernel benchmarking).
    # 'fused_qkv': projection-fused Pallas attention (round-3 experiment,
    # ops/fused_attention.py) — q/k/v projections + masked softmax in ONE
    # kernel for T' <= 1024, bf16_3x emulated 'high' precision, einsum
    # fallback beyond; the kernel-boundary relayout cost that sank the
    # pure-attention kernel disappears.
    attention_impl: str = "xla"
    remat: bool = False
    # TPU MXU precision for matmuls/convs: 'default' (bf16, fastest, ~1e-3
    # embedding error — breaks the parity budget), 'high' (bf16_3x, ~1e-5,
    # default here), 'highest' (fp32). Measured in the round-1 precision
    # study; see tests/test_oracle_parity.py for the CPU-side guarantee.
    matmul_precision: str = "high"
    # remat policy when remat=True: 'full' recomputes the whole block in the
    # backward (min memory); 'dots' saves every matmul output and recomputes
    # only the elementwise ops (LN/gelu/softmax) — ~5.4 GB of saved
    # activations at the reference recipe (bs8 x 10 s), trading HBM for the
    # recompute FLOPs (measured in scripts/benchmark_training.py)
    remat_policy: str = "full"
    # Freeze-aware backward pruning: when the conv frontend is frozen
    # (reference recipe `train_triplet.py:73-80` freezes feature_extractor),
    # its parameter grads are computed and then zeroed by the optimizer.
    # Setting this stops gradients at the conv-encoder output, removing the
    # whole conv backward (the [B, 160k, 512]-scale intermediates) from the
    # graph. Grads of every non-frozen param are mathematically unchanged
    # (the conv input is the waveform; nothing upstream needs its grad).
    frontend_stop_gradient: bool = False
    # Mixed-precision islands (round-2 study, NOTES_ROUND2.md): override the
    # global matmul_precision per region. None = inherit matmul_precision.
    #   frontend_precision — conv feature encoder, feature projection and
    #       positional conv (the numerically sensitive, GroupNorm-amplified
    #       front of the net)
    #   encoder_precision  — the 12 transformer blocks' matmuls (where the
    #       FLOPs are; post-LN renormalization keeps bf16 error contained)
    #   encoder_dtype      — activation dtype inside the block stack (bf16
    #       halves HBM traffic; LayerNorm/softmax stats stay f32; the final
    #       mean-pool + scoring head always run as an f32 island)
    frontend_precision: Any = None
    encoder_precision: Any = None
    encoder_dtype: Any = None
    # finer encoder islands (None -> encoder_precision): attention
    # (q/k/v/out projections + score/AV matmuls) vs feed-forward (fc1/fc2)
    attn_precision: Any = None
    ffn_precision: Any = None
    # finest islands (round-4 ladder, None -> enclosing island): the
    # round-2 study's coarse islands all broke the 1e-3 pairwise budget
    # individually; these resolve WHICH matmul inside each island carries
    # the error (scripts/precision_ladder.py measures them on-chip)
    attn_score_precision: Any = None   # QK^T + AV matmuls
    ffn1_precision: Any = None         # fc1 (d -> 4d)
    ffn2_precision: Any = None         # fc2 (4d -> d)
    posconv_precision: Any = None      # positional conv embedding
    featproj_precision: Any = None     # post_extract_proj dense
    # per-layer-range split: encoder layers with index >= encoder_tail_start
    # run ALL their matmuls at encoder_tail_precision (overriding the
    # attn/ffn islands inside the tail); earlier layers are unchanged.
    # Rationale: error injected early is amplified by every later block,
    # so the tail tolerates cheaper arithmetic than the head. -1 disables.
    # Only supported with remat=False (the scoring path).
    encoder_tail_start: int = -1
    encoder_tail_precision: Any = None
    layernorm_impl: str = "xla"     # 'xla' | 'pallas' (fused kernel)

    @property
    def frontend_prec(self):
        return self.frontend_precision or self.matmul_precision

    @property
    def encoder_prec(self):
        return self.encoder_precision or self.matmul_precision

    @property
    def block_dtype(self):
        return self.encoder_dtype if self.encoder_dtype is not None else self.dtype

    @property
    def attn_prec(self):
        return self.attn_precision or self.encoder_prec

    @property
    def ffn_prec(self):
        return self.ffn_precision or self.encoder_prec

    @property
    def attn_score_prec(self):
        return self.attn_score_precision or self.attn_prec

    @property
    def ffn1_prec(self):
        return self.ffn1_precision or self.ffn_prec

    @property
    def ffn2_prec(self):
        return self.ffn2_precision or self.ffn_prec

    @property
    def posconv_prec(self):
        return self.posconv_precision or self.frontend_prec

    @property
    def featproj_prec(self):
        return self.featproj_precision or self.frontend_prec

    @property
    def tail_split(self) -> bool:
        return (self.encoder_tail_start >= 0
                and self.encoder_tail_precision is not None)

    @classmethod
    def balanced(cls, **kw) -> "Wav2Vec2Config":
        """Round-4 composite recipe C1 (scripts/precision_composite.py,
        measured on the v5e chip against the 'exact' anchor on the
        pause-heavy speech stress set): single-pass bf16 'default'
        precision on exactly the modules the per-module error ladder
        showed slack — positional conv, attention scores (QK^T + AV) and
        FFN fc1 — with 3-pass 'high' everywhere else. Measured 1.17x
        compute throughput at 6.6e-4 max pairwise-score delta (inside the
        1e-3 demo budget with the 8e-4 flip bar's torch-oracle headroom;
        C2 = C1+2 tail layers measured 1.181x at 1.02e-3 and was
        rejected). Scoring's default since round 4."""
        defaults = dict(
            posconv_precision="default",
            attn_score_precision="default",
            ffn1_precision="default",
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def fast(cls, **kw) -> "Wav2Vec2Config":
        """Round-2 mixed-precision recipe: f32 activations with single-pass
        bf16 MXU matmuls in the transformer ('default' precision) and f32
        islands everywhere precision-critical (conv frontend + projections
        at 'high', norm statistics, mean-pool, scoring head). ~1.25x parity
        throughput. Max pairwise-score error vs the f32 path measured
        0.8e-3 on steady tones but 1.9e-3 on pause-heavy speech-like input
        — at the 1e-3 demo budget's edge, so scoring defaults to 'exact'
        and this is opt-in (Nomad(precision='fast')). bf16 *activations*
        were rejected outright: 0.6-1.3e-3 swing (NOTES_ROUND2.md)."""
        defaults = dict(
            frontend_precision="high",
            encoder_precision="default",
        )
        defaults.update(kw)
        return cls(**defaults)

    def __post_init__(self):
        if self.hidden_size % self.num_heads:
            raise ValueError(
                f"hidden_size {self.hidden_size} not divisible by "
                f"num_heads {self.num_heads}"
            )
        if not (len(self.conv_dim) == len(self.conv_kernel) == len(self.conv_stride)):
            raise ValueError("conv_dim/conv_kernel/conv_stride length mismatch")
        if self.layerdrop:
            raise NotImplementedError(
                "layerdrop is a documented divergence (PARITY.md) and is "
                "not implemented; set layerdrop=0"
            )
        if self.encoder_tail_start >= 0 and self.encoder_tail_precision:
            if self.remat:
                raise NotImplementedError(
                    "encoder_tail_precision composes nn.cond inside the "
                    "layer scan; remat=True (training) is not supported — "
                    "the split is a scoring-path feature"
                )
            if self.encoder_tail_start >= self.num_layers:
                raise ValueError(
                    f"encoder_tail_start {self.encoder_tail_start} >= "
                    f"num_layers {self.num_layers}: tail split selects no "
                    "layer; set -1 to disable"
                )

    @classmethod
    def base(cls, **kw) -> "Wav2Vec2Config":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "Wav2Vec2Config":
        """Small config for unit tests (same topology, ~100x fewer params)."""
        defaults = dict(
            conv_dim=(32, 32, 32),
            conv_kernel=(10, 3, 2),
            conv_stride=(5, 2, 2),
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            ffn_dim=128,
            pos_conv_kernel=16,
            pos_conv_groups=4,
        )
        defaults.update(kw)
        return cls(**defaults)


def feature_frame_lengths(lengths, config: Wav2Vec2Config):
    """Sample lengths -> conv-encoder frame lengths (exact VALID-conv floor
    arithmetic: l' = (l - k)//s + 1 per layer)."""
    l = lengths
    for k, s in zip(config.conv_kernel, config.conv_stride):
        l = (l - k) // s + 1
    return l


def _time_mask(length: int, lengths, dtype):
    """[B, length, 1] validity mask from per-item lengths."""
    idx = jnp.arange(length)[None, :]
    return (idx < lengths[:, None]).astype(dtype)[:, :, None]


def masked_mean(x, lengths=None):
    """Mean over time. With lengths, pools only valid frames (exact batch-1
    parity); without, pools over the padded axis like reference training
    (`nomad.py:228`, quirk Q6)."""
    if lengths is None:
        return jnp.mean(x, axis=1)
    mask = _time_mask(x.shape[1], lengths, x.dtype)
    return jnp.sum(x * mask, axis=1) / lengths[:, None].astype(x.dtype)


class LayerNormOp(nn.Module):
    """LayerNorm with a pluggable backend: plain XLA math or the fused
    Pallas kernel (ops/layernorm.py). Param names match nn.LayerNorm
    ('scale'/'bias') so checkpoint conversion is backend-agnostic."""

    features: int
    epsilon: float = 1e-5
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        from ..ops.layernorm import layer_norm

        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return layer_norm(x, scale, bias, eps=self.epsilon, impl=self.impl)


class MaskedGroupNorm(nn.Module):
    """GroupNorm with num_groups == channels (per-channel instance norm over
    time), optionally with masked statistics so padded frames don't perturb
    valid ones. torch eps=1e-5, biased variance."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, lengths=None):
        # x: [B, T, C]
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        xf = x.astype(jnp.float32)
        if lengths is None:
            mean = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        else:
            mask = _time_mask(x.shape[1], lengths, jnp.float32)
            denom = lengths[:, None, None].astype(jnp.float32)
            mean = jnp.sum(xf * mask, axis=1, keepdims=True) / denom
            var = jnp.sum(jnp.square(xf - mean) * mask, axis=1, keepdims=True) / denom
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        if lengths is not None:
            y = y * _time_mask(x.shape[1], lengths, jnp.float32)
        return y.astype(x.dtype)


class ConvFeatureEncoder(nn.Module):
    """fairseq ConvFeatureExtractionModel, mode='default' (SURVEY §2.3)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav, lengths=None):
        cfg = self.config
        x = wav.astype(cfg.dtype)[:, :, None]  # [B, T, 1]
        l = lengths
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            x = nn.Conv(
                features=dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(x)
            if l is not None:
                l = (l - k) // s + 1
            if i == 0:
                x = MaskedGroupNorm(dim, eps=1e-5, name="group_norm")(x, l)
            x = jax.nn.gelu(x, approximate=False)
            if l is not None:
                # gelu(0)=0, so only norm/bias products need re-zeroing, but a
                # single multiply keeps the invariant obvious and fusable.
                x = x * _time_mask(x.shape[1], l, x.dtype)
        return x, l


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding. The fairseq weight-norm
    reparameterization (g * v/||v||, dim=2) is composed into a single kernel
    at checkpoint conversion; SamePad drops the trailing frame for the even
    kernel."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        k = cfg.pos_conv_kernel
        y = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=cfg.pos_conv_groups,
            use_bias=True,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if k % 2 == 0:
            y = y[:, :-1, :]
        return jax.nn.gelu(y, approximate=False)


class _ProjParams(nn.Module):
    """Parameter container with nn.Dense's exact tree layout and
    initializers ({kernel [in,out] lecun_normal, bias [out] zeros}), used
    by the fused attention path to hand RAW weights to the Pallas kernel
    while staying checkpoint-compatible with the Dense path."""

    d_in: int
    d_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.d_in, self.d_out), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.d_out,), jnp.float32
        )
        return kernel, bias


class EncoderLayer(nn.Module):
    """Post-LN transformer block (fairseq TransformerSentenceEncoderLayer,
    layer_norm_first=False)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic: bool = True,
                 prec_override=None):
        cfg = self.config
        # prec_override (a static string) replaces EVERY precision island in
        # this block — the encoder tail split routes late layers here
        attn_prec = prec_override or cfg.attn_prec
        score_prec = prec_override or cfg.attn_score_prec
        ffn1_prec = prec_override or cfg.ffn1_prec
        ffn2_prec = prec_override or cfg.ffn2_prec
        h = cfg.num_heads
        d = cfg.hidden_size
        head_dim = d // h
        dense = partial(
            nn.Dense, dtype=cfg.block_dtype, param_dtype=jnp.float32, use_bias=True
        )
        ln = partial(
            LayerNormOp,
            d,
            epsilon=cfg.layer_norm_eps,
            impl=cfg.layernorm_impl,
        )

        residual = x
        use_fused = cfg.attention_impl == "fused_qkv" and (
            deterministic or cfg.attention_dropout == 0.0
        )
        with jax.default_matmul_precision(attn_prec):
            if use_fused:
                # projection-fused Pallas attention: q/k/v projections +
                # masked softmax run in one kernel (no HBM q/k/v, scores,
                # or softmax buffers), out-proj consumes the head-major
                # kernel output as one einsum. Param tree/naming identical
                # to the Dense path (checkpoint-compatible).
                from ..ops.fused_attention import fused_qkv_attention

                wq, bq = _ProjParams(d, d, name="q_proj")()
                wk, bk = _ProjParams(d, d, name="k_proj")()
                wv, bv = _ProjParams(d, d, name="v_proj")()
                wo, bo = _ProjParams(d, d, name="out_proj")()
                # the fused kernel has ONE precision mode for the whole
                # block (attn_score_precision does not subdivide it)
                mode = {
                    "high": "high3", "default": "default",
                    "highest": "highest",
                }[attn_prec]
                attn = fused_qkv_attention(
                    x, wq, bq, wk, bk, wv, bv, wo, bo,
                    key_mask=key_mask, heads=h, mode=mode,
                ).astype(cfg.block_dtype)
            else:
                q = dense(d, name="q_proj")(x).reshape(
                    x.shape[0], x.shape[1], h, head_dim
                )
                k = dense(d, name="k_proj")(x).reshape(
                    x.shape[0], x.shape[1], h, head_dim
                )
                v = dense(d, name="v_proj")(x).reshape(
                    x.shape[0], x.shape[1], h, head_dim
                )
                with jax.default_matmul_precision(score_prec):
                    if not deterministic and cfg.attention_dropout > 0.0:
                        # dropout on attention weights needs the einsum path
                        attn = mha_xla_dropout(
                            q,
                            k,
                            v,
                            key_mask,
                            rate=cfg.attention_dropout,
                            rng=self.make_rng("dropout"),
                        )
                    else:
                        attn = mha(
                            q, k, v, key_mask=key_mask,
                            impl=cfg.attention_impl,
                            # 'auto' flips to the flash kernel only for
                            # bf16-class scores (ops/attention.py note)
                            score_prec=score_prec,
                        )
                attn = attn.reshape(x.shape[0], x.shape[1], d)
                attn = dense(d, name="out_proj")(attn)
        attn = nn.Dropout(cfg.dropout)(attn, deterministic=deterministic)
        x = ln(name="self_attn_layer_norm")(residual + attn)

        residual = x
        with jax.default_matmul_precision(ffn1_prec):
            y = dense(cfg.ffn_dim, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(cfg.activation_dropout)(y, deterministic=deterministic)
        with jax.default_matmul_precision(ffn2_prec):
            y = dense(d, name="fc2")(y)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        x = ln(name="final_layer_norm")(residual + y)
        if key_mask is not None:
            x = x * key_mask.astype(x.dtype)[:, :, None]
        return x


class _ScannedLayer(nn.Module):
    """scan body: carry = (hidden states, layer index), per-step output =
    layer result. The index drives the optional encoder tail split."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, carry, key_mask, deterministic):
        x, idx = carry
        cfg = self.config
        layer = EncoderLayer
        if cfg.remat:
            policy = None
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_saveable
            elif cfg.remat_policy != "full":
                raise ValueError(
                    f"unknown remat_policy {cfg.remat_policy!r}: "
                    "expected 'full' or 'dots'"
                )
            layer = nn.remat(EncoderLayer, static_argnums=(3,), policy=policy)
            out = layer(cfg, name="layer")(x, key_mask, deterministic)
        elif cfg.tail_split:
            # per-layer-range precision: one shared module traced through
            # BOTH branches of a lifted cond (same params either way; TPU
            # executes only the taken branch, so MXU time per step is the
            # selected recipe's). jax.default_matmul_precision is a
            # trace-time context, so each branch bakes its own precision.
            mod = layer(cfg, name="layer")

            def head_fn(m, h):
                return m(h, key_mask=key_mask, deterministic=deterministic)

            def tail_fn(m, h):
                return m(h, key_mask=key_mask, deterministic=deterministic,
                         prec_override=cfg.encoder_tail_precision)

            out = nn.cond(idx < cfg.encoder_tail_start, head_fn, tail_fn,
                          mod, x)
        else:
            out = layer(cfg, name="layer")(
                x, key_mask=key_mask, deterministic=deterministic
            )
        return (out, idx + 1), out


class TransformerEncoder(nn.Module):
    """pos-conv + LayerNorm + 12 scanned post-LN blocks; returns the stacked
    [num_layers, B, T, C] layer results (= fairseq ``layer_results``, but
    batch-major: the reference permutes each from [T,B,C] at
    `nomad.py:248`)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, frame_lengths=None, deterministic: bool = True):
        cfg = self.config
        key_mask = None
        if frame_lengths is not None:
            key_mask = jnp.arange(x.shape[1])[None, :] < frame_lengths[:, None]
            x = x * key_mask.astype(x.dtype)[:, :, None]

        with jax.default_matmul_precision(cfg.posconv_prec):
            x = x + PositionalConvEmbedding(cfg, name="pos_conv")(x)
            x = LayerNormOp(
                cfg.hidden_size,
                epsilon=cfg.layer_norm_eps,
                impl=cfg.layernorm_impl,
                name="layer_norm",
            )(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        if key_mask is not None:
            x = x * key_mask.astype(x.dtype)[:, :, None]

        scanned = nn.scan(
            _ScannedLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
        )(cfg, name="layers")
        with jax.default_matmul_precision(cfg.encoder_prec):
            _, layer_outs = scanned(
                (x.astype(cfg.block_dtype), jnp.int32(0)), key_mask,
                deterministic,
            )
        return layer_outs  # [L, B, T, C]


class Wav2Vec2Model(nn.Module):
    """Full backbone. Returns dict with:
      'x'             — final block output [B, T', 768] (== layers[-1];
                        post-norm stack applies no final LayerNorm)
      'layers'        — [num_layers, B, T', 768] stacked block outputs
      'frame_lengths' — [B] valid frame counts (None when lengths is None)
    """

    config: Wav2Vec2Config = Wav2Vec2Config()

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        cfg = self.config
        with jax.default_matmul_precision(cfg.matmul_precision):
            return self._forward(wav, lengths, deterministic)

    def _forward(self, wav, lengths, deterministic):
        cfg = self.config
        with jax.default_matmul_precision(cfg.frontend_prec):
            feats, frame_lengths = ConvFeatureEncoder(cfg, name="feature_encoder")(
                wav, lengths
            )
            if cfg.frontend_stop_gradient:
                feats = jax.lax.stop_gradient(feats)
            x = LayerNormOp(
                cfg.conv_dim[-1],
                epsilon=cfg.layer_norm_eps,
                impl=cfg.layernorm_impl,
                name="feature_layer_norm",
            )(feats)
        with jax.default_matmul_precision(cfg.featproj_prec):
            x = nn.Dense(
                cfg.hidden_size,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name="post_extract_proj",
            )(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        if frame_lengths is not None:
            x = x * _time_mask(x.shape[1], frame_lengths, x.dtype)
        layer_outs = TransformerEncoder(cfg, name="encoder")(
            x, frame_lengths, deterministic
        )
        return {
            "x": layer_outs[-1],
            "layers": layer_outs,
            "frame_lengths": frame_lengths,
        }


def mha_xla_dropout(q, k, v, key_mask, rate, rng):
    """Einsum attention with dropout on the softmax weights (training path,
    matches fairseq MultiheadAttention dropout placement)."""
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim**0.5)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if key_mask is not None:
        scores = scores + jnp.where(key_mask, 0.0, -1e9)[:, None, None, :]
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, weights.shape)
    weights = jnp.where(keep, weights / (1.0 - rate), 0.0).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
