#!/usr/bin/env python
"""Break down the scoring forward pass on the real chip: frontend conv
encoder vs transformer (attention vs FFN), measured against each region's
MXU roofline at the active precision. Drives the round-2+ kernel work —
identifies where the gap between delivered and ceiling throughput lives.

Usage: python scripts/profile_forward.py [--seconds 10] [--batch 16]
       [--precision high|default] [--csv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nomad_tpu.utils.cache import (cpu_compile_bypass,
                                   enable_compilation_cache)

enable_compilation_cache()

import jax
import jax.numpy as jnp


def _sync(r):
    # On the axon relay block_until_ready returns before execution finishes;
    # a host readback of one element is the only reliable barrier.
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])


def bench(fn, *args, reps=5):
    _sync(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def conv_flops(cfg, n_samples):
    """Total MACs*2 of the conv frontend for one item of n_samples."""
    t = n_samples
    total = 0
    cin = 1
    for dim, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
        total += 2 * t * k * cin * dim
        cin = dim
    return total, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.models.wav2vec2 import (
        ConvFeatureEncoder,
        TransformerEncoder,
        Wav2Vec2Model,
    )
    from nomad_tpu.scoring.engine import bucket_length

    n_samples = bucket_length(int(args.seconds * 16000))
    B = args.batch
    cfg = Wav2Vec2Config.base(matmul_precision=args.precision)

    model = NomadModel(cfg, emb_dim=256)
    wav = jnp.zeros((1, 4000), jnp.float32)
    # host-side CPU compile in a TPU process: keep it OUT of the
    # persistent cache (cross-host CPU AOT entries SIGILL-poison it)
    with cpu_compile_bypass():
        with jax.default_device(jax.devices("cpu")[0]):
            params = model.init(jax.random.key(0), wav, method=NomadModel.init_all)
    # device_get first: device_put(committed_cpu_array) with no target is a
    # no-op, which would leave params host-side and re-ship ~378 MB per call
    params = jax.device_put(jax.device_get(params), jax.devices()[0])

    rng = np.random.default_rng(0)
    wave = jax.device_put(
        rng.standard_normal((B, n_samples)).astype(np.float32) * 0.1
    )
    lengths = jax.device_put(np.full((B,), n_samples, np.int32))

    fl_flops, t_frames = conv_flops(cfg, n_samples)
    d, f, h = cfg.hidden_size, cfg.ffn_dim, cfg.num_heads
    L = cfg.num_layers
    qkvo = 4 * 2 * t_frames * d * d
    scores = 2 * 2 * t_frames * t_frames * d
    ffn = 2 * 2 * t_frames * d * f
    enc_flops = L * (qkvo + scores + ffn)
    proj_flops = 2 * t_frames * cfg.conv_dim[-1] * d
    total_flops = fl_flops + enc_flops + proj_flops

    # v5e (v5 lite): 197 TFLOP/s bf16; 'high' = 3 MXU passes, 'highest'≈6
    passes = {"default": 1, "high": 3, "highest": 6}[args.precision]
    peak = 197e12 / passes

    print(f"shape: B={B} T={n_samples} ({args.seconds}s) T'={t_frames} "
          f"precision={args.precision} (peak {peak/1e12:.1f} TF/s eff)")
    print(f"FLOPs/item: conv {fl_flops/1e9:.1f} GF | encoder {enc_flops/1e9:.1f} GF "
          f"(qkvo {L*qkvo/1e9:.1f}, scores {L*scores/1e9:.1f}, ffn {L*ffn/1e9:.1f}) "
          f"| total {total_flops/1e9:.1f} GF")

    # --- full model ---
    full_fn = jax.jit(lambda p, w, l: model.apply(p, w, lengths=l))
    t_full = bench(full_fn, params, wave, lengths, reps=args.reps)
    print(f"full model      : {t_full*1e3:8.1f} ms  "
          f"{B*total_flops/t_full/1e12:6.1f} TF/s  "
          f"({B*total_flops/t_full/peak*100:5.1f}% of ceiling)  "
          f"[{B*args.seconds/t_full:.0f} wav-s/s]")

    # --- frontend only ---
    fe = ConvFeatureEncoder(cfg)
    fe_params = {"params": params["params"]["backbone"]["feature_encoder"]}
    fe_fn = jax.jit(lambda p, w, l: fe.apply(p, w, l)[0])
    t_fe = bench(fe_fn, fe_params, wave, lengths, reps=args.reps)
    print(f"conv frontend   : {t_fe*1e3:8.1f} ms  "
          f"{B*fl_flops/t_fe/1e12:6.1f} TF/s  "
          f"({B*fl_flops/t_fe/peak*100:5.1f}% of ceiling)")

    # --- per-conv-layer breakdown ---
    x = wave[:, :, None]
    cin = 1
    t_in = n_samples
    import flax.linen as nn
    for i, (dim, k, s) in enumerate(
        zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
    ):
        conv = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                       use_bias=False, dtype=cfg.dtype,
                       param_dtype=jnp.float32)
        cp = {"params": params["params"]["backbone"]["feature_encoder"][f"conv_{i}"]}
        with jax.default_matmul_precision(args.precision):
            cf = jax.jit(lambda p, xx, _c=conv: _c.apply(p, xx))
        t_c = bench(cf, cp, x, reps=args.reps)
        t_out = (t_in - k) // s + 1
        fl = 2 * t_out * k * cin * dim * B
        print(f"  conv_{i} k={k} s={s} [{t_in}x{cin}->{t_out}x{dim}]: "
              f"{t_c*1e3:7.2f} ms  {fl/t_c/1e12:6.1f} TF/s "
              f"({fl/t_c/peak*100:5.1f}%)")
        x = jnp.zeros((B, t_out, dim), cfg.dtype)
        cin, t_in = dim, t_out

    # --- transformer only ---
    enc = TransformerEncoder(cfg)
    enc_params = {"params": params["params"]["backbone"]["encoder"]}
    feats = jnp.asarray(
        rng.standard_normal((B, t_frames, d)).astype(np.float32)
    )
    fr = jax.device_put(np.full((B,), t_frames, np.int32))
    enc_fn = jax.jit(lambda p, xx, l: enc.apply(p, xx, l))
    t_enc = bench(enc_fn, enc_params, feats, fr, reps=args.reps)
    print(f"transformer     : {t_enc*1e3:8.1f} ms  "
          f"{B*enc_flops/t_enc/1e12:6.1f} TF/s  "
          f"({B*enc_flops/t_enc/peak*100:5.1f}% of ceiling)")

    # --- single encoder layer, attention vs ffn ---
    from nomad_tpu.models.wav2vec2 import EncoderLayer
    lay = EncoderLayer(cfg)
    lp = jax.tree.map(
        lambda a: a[0],
        {"params": params["params"]["backbone"]["encoder"]["layers"]["layer"]},
    )
    km = jnp.ones((B, t_frames), bool)
    lay_fn = jax.jit(lambda p, xx: lay.apply(p, xx, km))
    t_lay = bench(lay_fn, lp, feats, reps=args.reps)
    lflops = B * (qkvo + scores + ffn)
    print(f"1 encoder layer : {t_lay*1e3:8.1f} ms  {lflops/t_lay/1e12:6.1f} TF/s "
          f"({lflops/t_lay/peak*100:5.1f}%)")

    # pure matmul reference at this precision/shape
    a = jnp.asarray(rng.standard_normal((B * t_frames, d)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, f)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((f, d)).astype(np.float32))
    with jax.default_matmul_precision(args.precision):
        mm = jax.jit(lambda a, w1, w2: (a @ w1) @ w2)
    t_mm = bench(mm, a, w1, w2, reps=args.reps)
    mmf = 2 * 2 * a.shape[0] * d * f
    print(f"bare ffn matmuls: {t_mm*1e3:8.1f} ms  {mmf/t_mm/1e12:6.1f} TF/s "
          f"({mmf/t_mm/peak*100:5.1f}%)  <- achievable ceiling at this shape")


if __name__ == "__main__":
    main()
