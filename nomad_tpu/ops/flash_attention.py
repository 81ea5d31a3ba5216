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


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                  block_k: int, t_kv: int, precision=None):
    """One (batch*head, q-block) program: online softmax over K/V blocks.

    len_ref: [BH] int32 in SMEM (scalar-prefetched valid key counts)
    q_ref/o_ref: [1, block_q, D] VMEM; k_ref/v_ref: [1, T_kv, D] VMEM;
    lse_ref: [1, 1, block_q] VMEM (log-sum-exp saved for the backward; the
    extra unit axis keeps the block shape inside Mosaic's (8, 128) tiling
    rule — a [BH, T] layout would need an illegal (1, block_q) block).
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
        lse_ref[0, 0] = (m + jnp.log(l))[:, 0]
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
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


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
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda g, i, lens: (g, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda g, i, lens: (g, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        # 'arbitrary' on the q-block axis keeps the revisited K/V blocks
        # resident in VMEM across q iterations
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q, k, v)


def _fold_args(q, k, v, key_mask, block_q, block_k):
    """[B, T, H, D] tensors -> folded [B*H, T_pad, D] plus per-row lengths."""
    b, t, h, d = q.shape
    if key_mask is not None:
        lengths = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
    else:
        lengths = jnp.full((b,), t, jnp.int32)
    t_pad = _round_up(t, max(block_q, block_k))
    assert t_pad % block_q == 0 and t_pad % block_k == 0, (t, block_q, block_k)
    pad = t_pad - t

    def prep(x):
        x = jnp.swapaxes(x, 1, 2)  # [B, H, T, D]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.reshape(b * h, t_pad, d)

    lens = jnp.repeat(lengths.astype(jnp.int32), h)
    return prep, lens, t_pad


def _unfold(x, b, h, t, d):
    return jnp.swapaxes(x.reshape(b, h, -1, d)[:, :, :t, :], 1, 2)


def _mha_pallas_fwd_impl(q, k, v, key_mask, block_q, block_k, interpret,
                         precision=None, want_lse=False):
    b, t, h, d = q.shape
    prep, lens, t_pad = _fold_args(q, k, v, key_mask, block_q, block_k)
    # padded query rows produce garbage that downstream masking re-zeroes;
    # padded keys are excluded by lengths (lengths <= t <= t_pad)
    out, lse = _flash_folded(prep(q), prep(k), prep(v), lens, block_q,
                             block_k, interpret, precision)
    out = _unfold(out, b, h, t, d)  # [B, T, H, D]
    if want_lse:
        return out, lse
    return out


def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         di_ref, dq_ref, *, block_k: int, t_kv: int,
                         precision=None):
    """dQ for one (batch*head, q-block) program; K/V stay VMEM-resident
    across q blocks (same layout trick as the forward)."""
    g = pl.program_id(0)
    kv_len = len_ref[g]
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    di = di_ref[0, 0][:, None]
    d = q.shape[-1]
    block_q = q.shape[0]
    scale = 1.0 / (d**0.5)
    dot_kw = dict(
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.DEFAULT,
    )
    num_kb = t_kv // block_k

    def body(i, acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), **dot_kw
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), **dot_kw)
        ds = p * (dp - di)
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), **dot_kw
        )

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    acc = jax.lax.fori_loop(0, num_kb, body, acc0)
    dq_ref[0] = (scale * acc).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, k_ref, v_ref, q_ref, do_ref, lse_ref,
                          di_ref, dk_ref, dv_ref, *, block_q: int, t_q: int,
                          precision=None):
    """dK/dV for one (batch*head, kv-block) program; Q/dO/LSE/Di stay
    VMEM-resident across kv blocks."""
    g = pl.program_id(0)
    j = pl.program_id(1)
    kv_len = len_ref[g]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = k.shape[-1]
    block_k = k.shape[0]
    scale = 1.0 / (d**0.5)
    dot_kw = dict(
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.DEFAULT,
    )
    num_qb = t_q // block_q
    row = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
    valid_kv = row + j * block_k < kv_len  # [bk, 1]

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(i * block_q, block_q)][None, :]
        di_blk = di_ref[0, 0, pl.ds(i * block_q, block_q)][None, :]
        # s^T: [bk, bq]
        st = scale * jax.lax.dot_general(
            k, q_blk, (((1,), (1,)), ((), ())), **dot_kw
        )
        st = jnp.where(valid_kv, st, NEG_INF)
        pt = jnp.exp(st - lse_blk)
        dv_acc = dv_acc + jax.lax.dot_general(
            pt, do_blk, (((1,), (0,)), ((), ())), **dot_kw
        )
        dpt = jax.lax.dot_general(v, do_blk, (((1,), (1,)), ((), ())), **dot_kw)
        dst = pt * (dpt - di_blk)
        dk_acc = dk_acc + jax.lax.dot_general(
            dst, q_blk, (((1,), (0,)), ((), ())), **dot_kw
        )
        return dk_acc, dv_acc

    z = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0] = (scale * dk_acc).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "precision")
)
def _flash_bwd_folded(q, k, v, do, lse, di, lengths, block_q: int,
                      block_k: int, interpret: bool, precision=None):
    """Folded backward: q/k/v/do [B*H, T, D]; lse/di [B*H, 1, T] f32."""
    bh, t, d = q.shape
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, t_kv=t,
                          precision=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda g, i, lens: (g, i, 0)),
                pl.BlockSpec((1, t, d), lambda g, i, lens: (g, 0, 0)),
                pl.BlockSpec((1, t, d), lambda g, i, lens: (g, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda g, i, lens: (g, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda g, i, lens: (g, 0, i)),
                pl.BlockSpec((1, 1, block_q), lambda g, i, lens: (g, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, lens: (g, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q, k, v, do, lse, di)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, t_q=t,
                          precision=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // block_k),
            in_specs=[
                pl.BlockSpec((1, block_k, d), lambda g, j, lens: (g, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda g, j, lens: (g, j, 0)),
                pl.BlockSpec((1, t, d), lambda g, j, lens: (g, 0, 0)),
                pl.BlockSpec((1, t, d), lambda g, j, lens: (g, 0, 0)),
                pl.BlockSpec((1, 1, t), lambda g, j, lens: (g, 0, 0)),
                pl.BlockSpec((1, 1, t), lambda g, j, lens: (g, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda g, j, lens: (g, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda g, j, lens: (g, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, k, v, q, do, lse, di)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _mha_pallas(q, k, v, key_mask, block_q, block_k, interpret, precision):
    return _mha_pallas_fwd_impl(q, k, v, key_mask, block_q, block_k, interpret,
                                precision)


def _mha_pallas_fwd(q, k, v, key_mask, block_q, block_k, interpret, precision):
    out, lse = _mha_pallas_fwd_impl(q, k, v, key_mask, block_q, block_k,
                                    interpret, precision, want_lse=True)
    return out, (q, k, v, key_mask, out, lse)


def _mha_pallas_bwd(block_q, block_k, interpret, precision, res, g):
    """Flash backward: recomputes P blockwise from the saved LSE — no
    [B, H, T, T] materialization (the round-1 fallback re-ran full XLA
    einsum attention here, negating the kernel's memory win for training).

    Blocks are capped at 512: the dK/dV kernel holds four [bk, bq] f32
    temporaries plus the resident Q/dO rows, and the forward's wide
    single-pass blocks (up to 2048) would push past the ~16 MB VMEM
    budget at long T."""
    q, k, v, key_mask, out, lse = res
    b, t, h, d = q.shape
    bq = min(block_q, 512)
    bk = min(block_k, 512)
    prep, lens, t_pad = _fold_args(q, k, v, key_mask, bq, bk)
    # the forward may have padded further (its blocks are wider); its lse
    # covers a prefix that includes every real row
    lse = lse[:, :, :t_pad]
    # d_i = rowsum(dO * O) per query row (cheap XLA elementwise+reduce)
    di = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    di = jnp.swapaxes(di, 1, 2).reshape(b * h, 1, t)  # [BH, 1, T]
    if t_pad != t:
        di = jnp.pad(di, ((0, 0), (0, 0), (0, t_pad - t)))
    dq, dk, dv = _flash_bwd_folded(
        prep(q), prep(k), prep(v), prep(g), lse, di, lens,
        bq, bk, interpret, precision,
    )
    return (
        _unfold(dq, b, h, t, d).astype(q.dtype),
        _unfold(dk, b, h, t, d).astype(k.dtype),
        _unfold(dv, b, h, t, d).astype(v.dtype),
        None,
    )


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
    if _round_up(t, bk) > 2048:
        # beyond the single-pass regime the [bq, bk] softmax temporaries
        # plus the VMEM-resident K/V overflow the ~16 MB scoped budget at
        # wide blocks ((512, 2048) @ T=4096 OOMed; (512, 1024) runs at
        # 14.5 ms/attn vs XLA's 22.7 — round-2 sweep)
        bk = min(bk, 1024)
        bq = min(bq, 512)
    return _mha_pallas(q, k, v, key_mask, bq, bk, interpret, precision)
