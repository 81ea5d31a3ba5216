#!/usr/bin/env python
"""End-to-end training artifact (TRAIN_BENCH.json): a full synthetic
train -> eval -> checkpoint -> resume -> eval_audio_quality cycle on the
current backend, with epoch wall time, steady step time and loader
prefetch-overlap ratio.

The reference's loop (`/root/reference/src/training/train_triplet.py:154-199`)
has no timing, no resume and loses everything on a crash; this driver-visible
artifact proves the TPU rebuild's loop runs at speed WITH checkpoint/resume.

    python scripts/train_bench.py [--epochs 2] [--triplets 32] [--bs 8]
                                  [--seconds 10] [--precision exact]
Writes TRAIN_BENCH.json at the repo root (one JSON object).
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

# NOMAD_TPU_PLATFORM=cpu: smoke the full cycle off-TPU (pair with
# --out /tmp/... so the chip artifact isn't overwritten)
if os.environ.get("NOMAD_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["NOMAD_TPU_PLATFORM"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_wav(path, seconds, sr, seed):
    from nomad_tpu.io import write_wav
    from nomad_tpu.utils.synth import speech_like

    x = speech_like(1, seconds, sr=sr, seed=seed, dtype=np.float32)[0]
    write_wav(path, x[None], sr, bits=16)


def build_dataset(work, n_triplets, seconds):
    """Synthetic corpus + reference-schema CSVs: triplet train/valid tables
    (db,Anchor,Positive,Negative,+dists), an NMR dir, and a MOS test table
    for eval_audio_quality."""
    import pandas as pd

    sr = 16000
    n_files = max(8, n_triplets // 2)
    names = []
    for i in range(n_files):
        name = f"wavs/f{i:03d}.wav"
        os.makedirs(os.path.join(work, "wavs"), exist_ok=True)
        synth_wav(os.path.join(work, name), seconds, sr, seed=i)
        names.append(name)

    rng = np.random.default_rng(7)
    rows = []
    for i in range(n_triplets):
        a, p, n = rng.choice(len(names), 3, replace=False)
        rows.append({
            "db": 1, "Anchor": names[a], "Positive": names[p],
            "Negative": names[n], "anc_pos_dist": 0.1, "anc_neg_dist": 0.5,
        })
    df = pd.DataFrame(rows)
    train_csv = os.path.join(work, "train.csv")
    valid_csv = os.path.join(work, "valid.csv")
    df.iloc[: max(8, int(n_triplets * 0.75))].to_csv(train_csv, index=False)
    df.iloc[max(8, int(n_triplets * 0.75)):].to_csv(valid_csv, index=False)
    if len(pd.read_csv(valid_csv)) == 0:
        df.iloc[:8].to_csv(valid_csv, index=False)

    nmr_dir = os.path.join(work, "nmr")
    os.makedirs(nmr_dir, exist_ok=True)
    for i in range(4):
        synth_wav(os.path.join(nmr_dir, f"nmr{i}.wav"), seconds, sr,
                  seed=100 + i)

    test_rows = []
    for i, name in enumerate(names[:8]):
        test_rows.append({
            "db": "synth",
            "filepath_deg": os.path.join(work, name),
            "condition": f"cond_{i % 4}",
            "mos": 1.0 + 4.0 * (i % 4) / 3.0,
        })
    test_csv = os.path.join(work, "test_db.csv")
    pd.DataFrame(test_rows).to_csv(test_csv, index=False)
    return train_csv, valid_csv, nmr_dir, test_csv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--triplets", type=int, default=32)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--precision",
                    choices=("exact", "fast", "fast_bf16"), default="exact")
    ap.add_argument("--model", choices=("base", "tiny"), default="base",
                    help="tiny = smoke-test the cycle without TPU-scale "
                    "compiles")
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_BENCH.json"))
    args = ap.parse_args()

    from nomad_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from nomad_tpu.training.triplet import Training

    with tempfile.TemporaryDirectory() as work:
        train_csv, valid_csv, nmr_dir, test_csv = build_dataset(
            work, args.triplets, args.seconds
        )
        run_dir = os.path.join(work, "run")
        cfg = {
            "experiment_name": "Training",
            "root": work + "/",  # Q9 trailing slash
            "train_df": train_csv,
            "valid_df": valid_csv,
            "train_bs": args.bs,
            "val_bs": args.bs,
            "lr": 1e-4,
            "freeze_convnet": True,
            "freeze_all": False,
            "margin": 0.2,
            "num_epochs": args.epochs,
            "patience": 50,
            "lr_decay_step": 30,
            "lr_decay_factor": 0.99,
            "trim": True,
            "current_level": [1],
            "masked_pool": True,
            "precision": args.precision,
            "model_size": args.model,
            "emb_dim": 256 if args.model == "base" else 16,
            "run_dir": run_dir,
            "num_workers": 6,
            # eval_audio_quality inputs
            "non_match_dir": nmr_dir,
            "test_db_file": test_csv,
        }

        t0 = time.time()
        tr = Training(cfg)
        setup_s = time.time() - t0

        epoch_stats = []
        orig_train = tr.train

        def timed_train(*a, **kw):
            out = orig_train(*a, **kw)
            epoch_stats.append(dict(tr.last_train_stats))
            return out

        tr.train = timed_train
        t0 = time.time()
        tr.training_loop()
        loop_s = time.time() - t0

        # --- resume: a fresh process-equivalent picks up after the last
        # epoch (the reference cannot resume at all, SURVEY §5.3/5.4)
        cfg2 = dict(cfg, num_epochs=args.epochs + 1, resume=True)
        t0 = time.time()
        tr2 = Training(cfg2)
        state = tr2._load_resume_state()
        resume_ok = state is not None and state[2] == args.epochs
        tr2.training_loop()  # runs exactly the one remaining epoch
        resume_s = time.time() - t0

        # --- eval experiment on the best checkpoint
        best = os.path.join(run_dir, "best_model.npz")
        t0 = time.time()
        evals = tr2.eval_audio_quality(best, plot=False)
        eval_s = time.time() - t0

        steady = epoch_stats[-1] if epoch_stats else {}
        first = epoch_stats[0] if epoch_stats else {}
        steps = max(1, steady.get("steps", 1))
        step_ms = 1000.0 * steady.get("wall_s", 0.0) / steps
        result = {
            "metric": "triplet_train_step",
            "value": round(step_ms, 1),
            "unit": "ms/step",
            "detail": {
                "model": args.model,
                "bs": args.bs,
                "seconds_per_item": args.seconds,
                "precision": args.precision,
                "epochs_run": len(epoch_stats),
                "steps_per_epoch": steady.get("steps"),
                "epoch_wall_s": steady.get("wall_s"),
                "first_epoch_wall_s": first.get("wall_s"),  # includes compile
                "loader_wait_s": steady.get("loader_wait_s"),
                "loader_overlap": steady.get("loader_overlap"),
                "training_loop_s": round(loop_s, 2),
                "setup_s": round(setup_s, 2),
                "resume_ok": bool(resume_ok),
                "resume_epoch_s": round(resume_s, 2),
                "eval_audio_quality_s": round(eval_s, 2),
                "eval_srcc": {
                    str(k): round(float(v["srcc"]), 4)
                    if isinstance(v, dict) and "srcc" in v else v
                    for k, v in (evals or {}).items()
                },
                "backend": jax.default_backend(),
            },
        }
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
