#!/usr/bin/env python
"""Training-path benchmark (supplementary to bench.py's scoring metric).

Times the full triplet fine-tune step (fused A/P/N forward + backward +
adam, reference recipe shapes) and the differentiable NOMAD loss+grad step
(SE demo shapes) on the current backend. Prints one JSON line.

    python scripts/benchmark_training.py [--bs 8] [--seconds 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--se-bs", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--attn", choices=("xla", "pallas"), default="xla")
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--remat-policy", choices=("full", "dots"), default="full")
    ap.add_argument(
        "--stop-frontend-grad", type=int, default=1,
        help="prune the frozen conv frontend's backward (freeze_convnet "
        "recipe; grads of trainable params are unchanged)",
    )
    ap.add_argument(
        "--precision", choices=("exact", "fast", "fast_bf16"), default="exact",
        help="exact = 'high' matmuls everywhere (parity default); fast = "
        "bf16 single-pass transformer matmuls with f32 islands; fast_bf16 "
        "additionally keeps block activations in bf16 (halves the remat "
        "recompute HBM traffic — training-only recipe, too lossy for "
        "scoring parity)",
    )
    args = ap.parse_args()

    from nomad_tpu.utils.cache import (cpu_compile_bypass,
                                   enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from nomad_tpu.api import Nomad
    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring.engine import bucket_length
    from nomad_tpu.training.triplet import Training

    if args.precision == "exact":
        cfg = Wav2Vec2Config.base(attention_impl=args.attn)
    elif args.precision == "fast":
        cfg = Wav2Vec2Config.fast(attention_impl=args.attn)
    else:  # fast_bf16
        import jax.numpy as _jnp

        cfg = Wav2Vec2Config.fast(
            attention_impl=args.attn, encoder_dtype=_jnp.bfloat16
        )
    model = NomadModel(cfg, emb_dim=256)
    # host-side CPU compile in a TPU process: keep it OUT of the
    # persistent cache (cross-host CPU AOT entries SIGILL-poison it)
    with cpu_compile_bypass():
        with jax.default_device(jax.devices("cpu")[0]):
            params = model.init(
                jax.random.key(0), jnp.zeros((1, 4000)), method=NomadModel.init_all
            )
    params = jax.device_get(params)

    # --- triplet train step (reference recipe: bs 8 x 10 s, frozen convnet)
    tr = Training(
        {"experiment_name": "none", "lr": 1e-4, "freeze_convnet": True,
         "freeze_all": False, "margin": 0.2, "emb_dim": 256,
         "masked_pool": True, "remat": True},
        params=params, model_config=None,
    )
    import dataclasses

    tr.model_config = dataclasses.replace(
        cfg, remat=bool(args.remat), remat_policy=args.remat_policy,
        frontend_stop_gradient=bool(args.stop_frontend_grad),
    )
    tr.model = NomadModel(tr.model_config, emb_dim=256)
    tr.margin = 0.2
    tr._build_optimizer()

    B = args.bs
    T = bucket_length(int(args.seconds * 16000))
    rng = np.random.default_rng(0)
    # pre-stage all batches on device: the relay's h2d rate swings 8-65 MB/s
    # minute-to-minute, and a device_put inside the timed loop would bury
    # the compute number under transfer weather
    batches = [
        tuple(
            jax.device_put((0.05 * rng.standard_normal((B, T))).astype(np.float32))
            for _ in range(3)
        )
        for _ in range(min(args.repeats, 3) + 1)
    ]
    lengths = jax.device_put(np.full((B,), int(args.seconds * 16000), np.int32))
    step = tr._get_step((B, T))
    p, o = tr.params, tr.opt_state
    t0 = time.time()
    p, o, loss = step(p, o, *batches[0], lengths, lengths, lengths,
                      jnp.float32(1e-5), jnp.float32(1e-4), jax.random.key(0))
    float(loss)
    compile_s = time.time() - t0
    ts = []
    for i in range(args.repeats):
        a_, p_, n_ = batches[1 + i % (len(batches) - 1)]
        t0 = time.time()
        p, o, loss = step(p, o, a_, p_, n_, lengths, lengths, lengths,
                          jnp.float32(1e-5), jnp.float32(1e-4),
                          jax.random.key(i))
        float(loss)
        ts.append(time.time() - t0)
    train_ms = min(ts) * 1e3

    # --- SE loss + grad (B x 1.02 s windows)
    nomad = Nomad(config=cfg, emb_dim=256, params={"params": params["params"]})
    p_dev = jax.device_put(nomad.params)
    est = jax.device_put(
        (0.05 * rng.standard_normal((args.se_bs, 16384))).astype(np.float32)
    )
    clean = jax.device_put(
        (0.05 * rng.standard_normal((args.se_bs, 16384))).astype(np.float32)
    )
    vg = jax.jit(jax.value_and_grad(lambda e, c, pp: nomad.loss_fn_p(pp, e, c),
                                    argnums=0))
    loss, g = vg(est, clean, p_dev)
    float(loss)
    ts = []
    for _ in range(args.repeats):
        t0 = time.time()
        loss, g = vg(est, clean, p_dev)
        float(loss)
        ts.append(time.time() - t0)
    se_ms = min(ts) * 1e3

    print(json.dumps({
        "metric": "training_throughput",
        "triplet_step_ms": round(train_ms, 1),
        "triplet_wav_sec_per_sec": round(3 * B * args.seconds / (train_ms / 1e3), 1),
        "se_loss_grad_ms": round(se_ms, 1),
        "detail": {"bs": B, "seconds": args.seconds, "se_bs": args.se_bs,
                   "attn": args.attn, "remat": bool(args.remat),
                   "remat_policy": args.remat_policy,
                   "stop_frontend_grad": bool(args.stop_frontend_grad),
                   "precision": args.precision,
                   "compile_s": round(compile_s, 1),
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
