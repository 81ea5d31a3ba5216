"""Fused flash-style attention kernel for TPU (Pallas).

Replaces the [B, H, T, T] score materialization of einsum attention — the
HBM-bandwidth hot spot of the backbone at long sequence lengths (a 30 s file
is T'~1500 frames: scores alone are B*12*1500^2*4 bytes per layer). The
kernel streams K/V blocks through VMEM with an online-softmax accumulator,
so HBM traffic stays O(T*D) per head.

Shapes are NOMAD-scale: D=64 per head, T' in [~50, ~3000], no causal mask,
optional per-batch key-length mask (the exact-batching mask of
nomad_tpu.models.wav2vec2). Matches mha_xla to ~1e-6 (tests run the kernel
in interpreter mode on CPU; bench runs it compiled on TPU).

The backward pass falls back to the XLA einsum implementation via
custom_vjp, which keeps jax.grad through ``nomad.forward`` working when the
pallas path is enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mha_xla

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, t_kv: int,
                  precision=None):
    """One (batch*head, q-block) program: online softmax over K/V blocks.

    len_ref: [BH] int32 in SMEM (scalar-prefetched valid key counts)
    q_ref/o_ref: [1, block_q, D] VMEM; k_ref/v_ref: [1, T_kv, D] VMEM.
    """
    g = pl.program_id(0)
    kv_len = len_ref[g]

    q = q_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    block_q = q.shape[0]
    q = q * (1.0 / (d**0.5))
    num_kb = t_kv // block_k
    # Mosaic lowers DEFAULT (bf16 MXU passes, fastest, ~2.5e-4 emb diff)
    # and HIGHEST (f32, ~5e-5, ~40% slower) but not the inherited HIGH
    # context — pin explicitly.
    dot_kw = dict(
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.DEFAULT,
    )

    if num_kb == 1:
        # single-pass softmax (the common case: whole K/V fits the block) —
        # no online-softmax carries, ~25% faster than XLA attention at
        # NOMAD shapes (micro-study, round 1)
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), **dot_kw)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_kv), 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, v_blk, (((1,), (0,)), ((), ())), **dot_kw)
        o_ref[0] = (o / l).astype(o_ref.dtype)
        return

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), **dot_kw)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), **dot_kw
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "precision")
)
def _flash_folded(q, k, v, lengths, block_q: int, block_k: int, interpret: bool,
                  precision=None):
    """q/k/v: [B*H, T, D] with T % blocks == 0; lengths: [B*H] int32."""
    bh, t, d = q.shape
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, t_kv=t, precision=precision
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda g, i, lens: (g, i, 0)),
                pl.BlockSpec((1, t, d), lambda g, i, lens: (g, 0, 0)),
                pl.BlockSpec((1, t, d), lambda g, i, lens: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, lens: (g, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        # 'arbitrary' on the q-block axis keeps the revisited K/V blocks
        # resident in VMEM across q iterations
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q, k, v)


def _mha_pallas_fwd_impl(q, k, v, key_mask, block_q, block_k, interpret,
                         precision=None):
    b, t, h, d = q.shape
    if key_mask is not None:
        lengths = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
    else:
        lengths = jnp.full((b,), t, jnp.int32)

    t_pad = _round_up(t, max(block_q, block_k))
    assert t_pad % block_q == 0 and t_pad % block_k == 0, (
        t, block_q, block_k,
    )
    pad = t_pad - t

    def prep(x):
        x = jnp.swapaxes(x, 1, 2)  # [B, H, T, D]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.reshape(b * h, t_pad, d)

    # padded query rows produce garbage that downstream masking re-zeroes;
    # padded keys are excluded by lengths (lengths <= t <= t_pad)
    lens = jnp.repeat(lengths.astype(jnp.int32), h)
    out = _flash_folded(prep(q), prep(k), prep(v), lens, block_q, block_k,
                        interpret, precision)
    out = out.reshape(b, h, t_pad, d)[:, :, :t, :]
    return jnp.swapaxes(out, 1, 2)  # [B, T, H, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _mha_pallas(q, k, v, key_mask, block_q, block_k, interpret, precision):
    return _mha_pallas_fwd_impl(q, k, v, key_mask, block_q, block_k, interpret,
                                precision)


def _mha_pallas_fwd(q, k, v, key_mask, block_q, block_k, interpret, precision):
    out = _mha_pallas_fwd_impl(q, k, v, key_mask, block_q, block_k, interpret,
                               precision)
    return out, (q, k, v, key_mask)


def _mha_pallas_bwd(block_q, block_k, interpret, precision, res, g):
    q, k, v, key_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_xla(q_, k_, v_, key_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_mha_pallas.defvjp(_mha_pallas_fwd, _mha_pallas_bwd)


def mha_pallas(q, k, v, key_mask=None, block_q: int = 512, block_k: int = 2048,
               interpret: bool | None = None, precision=None):
    """Drop-in for mha_xla on [B, T, H, D] tensors.

    Default blocks put typical NOMAD sequence lengths (T' <= 2048, ~40 s of
    audio) on the single-pass softmax path; longer files stream K/V through
    the online-softmax loop."""
    if interpret is None:
        # honor an active jax.default_device(cpu) context (e.g. CPU-side
        # init of a TPU model) — default_backend() alone misses it
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        interpret = platform != "tpu"
    t = q.shape[1]
    # power-of-two blocks with bq <= bk and t padded to a bk multiple: the
    # (bh, t_pad // bq) grid then tiles every query row exactly (a
    # non-divisible t_pad would silently skip trailing rows)
    bk = 1 << max(7, (_round_up(t, 128) - 1).bit_length())
    bk = min(block_k, bk)
    bq = min(block_q, bk)
    return _mha_pallas(q, k, v, key_mask, bq, bk, interpret, precision)
