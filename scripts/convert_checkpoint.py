#!/usr/bin/env python
"""Convert fairseq/NOMAD torch checkpoints to the nomad_tpu .npz format.

    python scripts/convert_checkpoint.py pt-models/nomad_best_model.pt \
        --out pt-models/nomad_tpu_params.npz

Accepts `wav2vec_small.pt` (fairseq ckpt wrapper) or `nomad_best_model.pt`
(TripletModel state_dict) — reference download targets at
`/root/reference/src/nomad_audio/nomad.py:20-33`. Runs torch on CPU only.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--out", default=None)
    ap.add_argument("--emb-dim", type=int, default=256)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nomad_tpu.api import _flatten
    from nomad_tpu.convert import (
        canonicalize,
        load_torch_checkpoint,
        merge_into,
        to_flax_params,
    )
    from nomad_tpu.models import NomadModel, Wav2Vec2Config

    cfg = Wav2Vec2Config.base()
    model = NomadModel(cfg, emb_dim=args.emb_dim)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 4000)), method=NomadModel.init_all
    )
    sd = load_torch_checkpoint(args.checkpoint)
    conv = to_flax_params(canonicalize(sd), cfg.num_layers, len(cfg.conv_dim))
    params = merge_into(params, conv)
    out = args.out or os.path.splitext(args.checkpoint)[0] + ".npz"
    np.savez(out, **_flatten(params["params"]))
    n = sum(int(np.prod(v.shape)) for v in _flatten(params["params"]).values())
    print(f"wrote {out} ({n/1e6:.1f}M params; head loaded: {'embedding' in conv})")


if __name__ == "__main__":
    main()
