"""Fused QKV-projection + attention Pallas kernel.

Round-2 finding (NOTES_ROUND2.md, VERDICT r2 item 5): the pure-attention
flash kernel wins 1.6-1.7x in isolation but LOSES in-model, because the
pallas call boundary forces q/k/v materialization in HBM plus
[B,T,H,D] <-> [BH,T,D] relayouts, while XLA fuses the projection epilogues
straight into the score matmuls. The untried lever was to move the
projections INSIDE the kernel boundary so nothing materializes between
them and the attention math. This module is that experiment.

Design:
  * grid (B, H, T/block_q); the kernel computes K_h = X @ Wk[:, h] and
    V_h likewise into VMEM scratch once per (batch, head) (at q-block 0),
    then runs single-pass masked softmax attention per q-block. Because
    heads partition the projection's output columns, per-head projection
    costs exactly the same total MXU work as one [D, 3D] matmul — nothing
    is recomputed.
  * X's VMEM block index depends only on the batch coordinate, so Mosaic
    keeps it resident across all 12 heads: X is read from HBM once per
    batch item instead of once per (head, tensor). Q/K/V, the [T, T]
    score matrix and the softmax output never touch HBM at all.
  * the out-projection stays outside (its input [B, T, D] comes back from
    the kernel in layout-native order; folding it in would need a second
    scratch accumulation pass for marginal traffic).
  * precision: Mosaic cannot lower jax.lax.Precision.HIGH (bf16_3x), which
    is the scoring parity default — so ``mode='high3'`` EMULATES it with
    three DEFAULT-precision MXU passes (hi*hi + hi*lo + lo*hi on the
    bf16-split operands), the same decomposition XLA uses. 'default' is a
    single bf16 pass, 'highest' full-f32 dots.
  * backward: custom_vjp re-runs the unfused einsum composition under
    jax.vjp — gradients flow (training works) but see the flash kernels
    for the memory-optimal backward; this kernel targets the inference
    scoring path.

Replaces the torch MHA projections + attention of the reference
(`/root/reference/src/nomad_audio/nomad.py:226` via fairseq
MultiheadAttention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# single-pass softmax over the full (padded) sequence: the X block
# ([T, 768] f32, double-buffer-free since its index is constant per batch
# item) + [block_q, T] score temporaries must fit VMEM. 1024 frames covers
# ~21 s of audio; longer buckets fall back to the unfused paths.
MAX_FUSED_T = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_supported(t: int) -> bool:
    return _round_up(t, 128) <= MAX_FUSED_T


def _dot(a, b, dims, mode: str):
    """dot_general at the requested effective precision. 'high3' emulates
    Precision.HIGH (unlowerable by Mosaic) as three DEFAULT bf16 passes on
    hi/lo split operands — the identical bf16x3 decomposition XLA's HIGH
    performs, so the scoring parity budget is preserved in-kernel."""
    kw = dict(preferred_element_type=jnp.float32)
    if mode == "highest":
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.HIGHEST, **kw
        )
    if mode == "default":
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.DEFAULT, **kw
        )
    assert mode == "high3", mode
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.DEFAULT, **kw
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _fused_kernel(len_ref, x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                  bv_ref, o_ref, k_scr, v_scr, *, block_q: int, t_pad: int,
                  mode: str):
    """One (batch, head, q-block) program.

    x_ref:   [1, T, D_model] VMEM (resident across heads/q-blocks)
    w*_ref:  [1, D_model, head_dim] VMEM (this head's projection columns;
    the head-major layout keeps the block's minor dims equal to the full
    array dims, which Mosaic requires when head_dim < 128)
    b*_ref:  [1, 1, head_dim] VMEM
    o_ref:   [1, 1, block_q, head_dim] VMEM (head-major output — the
    out-projection consumes it as one einsum, no relayout)
    k_scr/v_scr: [T, head_dim] f32 VMEM scratch, built at q-block 0 and
    reused for every q-block of this (batch, head).
    """
    b = pl.program_id(0)
    qb = pl.program_id(2)
    kv_len = len_ref[b]
    mm = (((1,), (0,)), ((), ()))  # plain [M,K]x[K,N]

    @pl.when(qb == 0)
    def _build_kv():
        x_all = x_ref[0].astype(jnp.float32)
        k_scr[...] = _dot(x_all, wk_ref[0], mm, mode) + bk_ref[0, 0][None, :]
        v_scr[...] = _dot(x_all, wv_ref[0], mm, mode) + bv_ref[0, 0][None, :]

    xq = x_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
    q = _dot(xq, wq_ref[0], mm, mode) + bq_ref[0, 0][None, :]
    hd = q.shape[-1]
    q = q * (1.0 / (hd**0.5))
    s = _dot(q, k_scr[...], (((1,), (1,)), ((), ())), mode)  # [bq, T]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_pad), 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # P @ V runs once per output row at DEFAULT: P is an exp() output with
    # values in [0,1] — its bf16 rounding is ~1e-3 RELATIVE on a convex
    # combination, matching the einsum path's own f32->dtype cast noise.
    # 'high3'/'highest' modes keep it at the same precision as the rest.
    o = _dot(p, v_scr[...], mm, mode)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_q", "mode", "interpret"),
)
def _fused_call(x, wq, wk, wv, bq, bk, bv, lengths, heads: int, block_q: int,
                mode: str, interpret: bool):
    b, t_pad, dm = x.shape
    hd = dm // heads
    kernel = functools.partial(
        _fused_kernel, block_q=block_q, t_pad=t_pad, mode=mode
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, heads, t_pad // block_q),
            in_specs=[
                # index depends only on batch -> stays VMEM-resident for
                # all heads/q-blocks of one item
                pl.BlockSpec((1, t_pad, dm), lambda bi, h, qb, lens: (bi, 0, 0)),
                pl.BlockSpec((1, dm, hd), lambda bi, h, qb, lens: (h, 0, 0)),
                pl.BlockSpec((1, dm, hd), lambda bi, h, qb, lens: (h, 0, 0)),
                pl.BlockSpec((1, dm, hd), lambda bi, h, qb, lens: (h, 0, 0)),
                pl.BlockSpec((1, 1, hd), lambda bi, h, qb, lens: (h, 0, 0)),
                pl.BlockSpec((1, 1, hd), lambda bi, h, qb, lens: (h, 0, 0)),
                pl.BlockSpec((1, 1, hd), lambda bi, h, qb, lens: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, hd), lambda bi, h, qb, lens: (bi, h, qb, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((t_pad, hd), jnp.float32),
                pltpu.VMEM((t_pad, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, heads, t_pad, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, x, wq, wk, wv, bq, bk, bv)
    return out  # [B, H, T_pad, hd] head-major


def _prec(mode: str):
    return {
        "high3": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[mode]


def _out_proj(attn_hm, wo, bo_, heads: int, mode: str):
    """Head-major attention output [B, H, T, hd] -> [B, T, D_model] through
    the out-projection, as ONE einsum (the contraction consumes the
    head-major layout directly — no materialized transpose)."""
    dm = wo.shape[1]
    hd = wo.shape[0] // heads
    y = jnp.einsum(
        "bhtd,hdo->bto", attn_hm, wo.reshape(heads, hd, dm),
        precision=_prec(mode), preferred_element_type=jnp.float32,
    )
    return (y + bo_).astype(attn_hm.dtype)


def _unfused_ref(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask,
                 heads: int, mode: str):
    """Reference composition (projections + einsum attention + out-proj)
    used for the backward pass and for parity tests."""
    from .attention import mha_xla

    b, t, dm = x.shape
    hd = dm // heads

    def proj(w, bias):
        y = jnp.dot(x, w, precision=_prec(mode),
                    preferred_element_type=jnp.float32)
        return (y + bias).astype(x.dtype).reshape(b, t, heads, hd)

    attn = mha_xla(proj(wq, bq_), proj(wk, bk_), proj(wv, bv_),
                   key_mask=key_mask)
    attn = attn.reshape(b, t, dm)
    y = jnp.dot(attn, wo, precision=_prec(mode),
                preferred_element_type=jnp.float32)
    return (y + bo_).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _fused_qkv(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask, heads,
               mode, interpret):
    return _fused_fwd_impl(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask,
                           heads, mode, interpret)


def _block_q_for(t_pad: int) -> int:
    """Largest multiple of 128 that divides t_pad (<= 512): the grid is
    exactly t_pad // block_q programs, so every query row is covered. A
    plain min(512, t_pad) truncated the grid for t_pad in {640, 768, 896}
    (e.g. ~13-18 s buckets, T' ~560-900 frames) and silently left rows
    >= 512 uncomputed — NaN embeddings for those frames."""
    m = t_pad // 128
    for g in (4, 3, 2, 1):
        if m % g == 0:
            return 128 * g
    raise AssertionError(f"t_pad {t_pad} not a multiple of 128")


def _fused_fwd_impl(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask, heads,
                    mode, interpret):
    b, t, dm = x.shape
    t_pad = _round_up(t, 128)
    if key_mask is not None:
        lengths = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
    else:
        lengths = jnp.full((b,), t, jnp.int32)
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0))) if t_pad != t else x
    hd = dm // heads
    block_q = _block_q_for(t_pad)

    def per_head_w(w):  # [D, D] -> [H, D, hd] (head-major column slices)
        return w.reshape(dm, heads, hd).transpose(1, 0, 2)

    def per_head_b(bias):  # [D] -> [H, 1, hd]
        return bias.reshape(heads, 1, hd)

    out = _fused_call(
        xp, per_head_w(wq), per_head_w(wk), per_head_w(wv),
        per_head_b(bq_), per_head_b(bk_), per_head_b(bv_),
        lengths, heads, block_q, mode, interpret,
    )
    return _out_proj(out[:, :, :t, :], wo, bo_, heads, mode)


def _fused_fwd(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask, heads,
               mode, interpret):
    out = _fused_fwd_impl(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask,
                          heads, mode, interpret)
    return out, (x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask)


def _fused_bwd(heads, mode, interpret, res, g):
    x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask = res
    _, vjp = jax.vjp(
        lambda *a: _unfused_ref(*a, key_mask, heads=heads, mode=mode),
        x, wq, bq_, wk, bk_, wv, bv_, wo, bo_,
    )
    return (*vjp(g), None)


_fused_qkv.defvjp(_fused_fwd, _fused_bwd)


def fused_qkv_attention(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_,
                        key_mask=None, heads: int = 12, mode: str = "high3",
                        interpret: bool | None = None):
    """Full projection-fused attention sublayer on [B, T, D_model] hidden
    states: q/k/v projections + masked softmax attention run inside one
    Pallas kernel; the out-projection consumes the kernel's head-major
    output as a single einsum. Returns [B, T, D_model].

    Falls back to the unfused einsum composition when the (padded)
    sequence exceeds the kernel's single-pass VMEM budget."""
    if interpret is None:
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        interpret = platform != "tpu"
    if not fused_supported(x.shape[1]):
        return _unfused_ref(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask,
                            heads=heads, mode=mode)
    return _fused_qkv(x, wq, bq_, wk, bk_, wv, bv_, wo, bo_, key_mask,
                      heads, mode, interpret)
