#!/usr/bin/env python
"""Golden-score parity harness.

With the real checkpoints in pt-models/ (wav2vec_small.pt +
nomad_best_model.pt), scores the bundled demo data and checks against the
published golden values (reference README.md:69-81; BASELINE rows 1-4,
budget |delta| <= 1e-3). Zero-egress build environments can't download the
weights, so this runs wherever they exist — CI for the real deployment.

    python scripts/verify_parity.py [--data /root/reference/data] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_AVG = {
    "445-123860-0012_NOISE_15": 1.587,
    "6563-285357-0042_OPUS_64k": 0.294,
}
GOLDEN_PAIRWISE = {
    "445-123860-0012_NOISE_15": {
        "MJ60_10": 1.627, "FL67_01": 1.534, "FI53_04": 1.629, "MJ57_01": 1.561,
    },
    "6563-285357-0042_OPUS_64k": {
        "MJ60_10": 0.23, "FL67_01": 0.414, "FI53_04": 0.186, "MJ57_01": 0.346,
    },
}
BUDGET = 1e-3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--weights", default="pt-models")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    have = all(
        os.path.isfile(os.path.join(args.weights, f))
        for f in ("nomad_best_model.pt",)
    ) or os.path.isfile(os.path.join(args.weights, "nomad_tpu_params.npz"))
    if not have:
        print(
            "SKIP: no NOMAD checkpoint under "
            f"{args.weights!r} (zero-egress build env?). The pipeline itself "
            "is covered by the pytest suite; this harness verifies the "
            "published golden scores once weights are present."
        )
        return 0

    from nomad_tpu.api import Nomad

    # 'exact' is the parity anchor: the scoring default is 'balanced'
    # (measured pairwise delta up to 6.6e-4), and the golden constants are
    # rounded to 3 decimals (~5e-4 quantization) — combined they could
    # brush the 1e-3 budget, so this harness must not inherit the default.
    nomad = Nomad(weights_dir=args.weights, precision="exact")
    avg, dm = nomad.predict(
        "dir",
        os.path.join(args.data, "nmr-data"),
        os.path.join(args.data, "test-data"),
        results_path=None,
    )

    failures = []
    for name, want in GOLDEN_AVG.items():
        got = float(avg.loc[name, "NOMAD"])
        if abs(got - want) > BUDGET:
            failures.append(f"avg[{name}] = {got} vs {want}")
    for row, cols in GOLDEN_PAIRWISE.items():
        for col, want in cols.items():
            got = float(dm.loc[row, col])
            if abs(got - want) > BUDGET:
                failures.append(f"pairwise[{row},{col}] = {got} vs {want}")

    if failures:
        print("PARITY FAIL:")
        for f in failures:
            print("  " + f)
        return 1
    print(f"PARITY OK: all {len(GOLDEN_AVG) + 8} golden scores within {BUDGET}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
