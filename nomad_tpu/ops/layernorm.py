"""Fused LayerNorm kernel (Pallas TPU).

One of the two fused kernels the BASELINE north-star names (attention +
LayerNorm; the reference runs torch's CUDA LayerNorm on every block,
`/root/reference/src/nomad_audio/nomad.py:226`). One VPU pass per row
block: mean, biased variance, rsqrt, scale+shift — no HBM round-trip for
the intermediate moments.

Forward-fused only; backward falls back to the XLA formulation via
custom_vjp (training still works with the kernel enabled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layer_norm_xla(x, scale, bias, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def _ln_rows(x, scale, bias, eps: float, block_rows: int, interpret: bool):
    rows, d = x.shape
    grid = (rows // block_rows,)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :])


def _fwd_impl(x, scale, bias, eps, block_rows, interpret):
    shape = x.shape
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    flat = x.reshape(rows, d)
    pad = (-rows) % block_rows
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, d), flat.dtype)], axis=0)
    out = _ln_rows(flat, scale, bias, eps, block_rows, interpret)
    if pad:
        out = out[:rows]
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln_pallas(x, scale, bias, eps, block_rows, interpret):
    return _fwd_impl(x, scale, bias, eps, block_rows, interpret)


def _ln_fwd(x, scale, bias, eps, block_rows, interpret):
    return _fwd_impl(x, scale, bias, eps, block_rows, interpret), (x, scale, bias)


def _ln_bwd(eps, block_rows, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: layer_norm_xla(x_, s_, b_, eps),
                     x, scale, bias)
    return vjp(g)


_ln_pallas.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, scale, bias, eps: float = 1e-5, impl: str = "xla",
               block_rows: int = 256, interpret: bool | None = None):
    """LayerNorm over the last axis. impl: 'xla' | 'pallas'."""
    if impl != "pallas":
        return layer_norm_xla(x, scale, bias, eps)
    if interpret is None:
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        interpret = platform != "tpu"
    return _ln_pallas(x, scale, bias, eps, block_rows, interpret)
