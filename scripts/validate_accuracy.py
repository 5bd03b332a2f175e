"""Accuracy validation sweep: run every (model, dataset) at the reference's
best-documented config (mined from /root/reference/experiments/exp_history.json)
and write a comparison table to RESULTS.md.

Each config runs as its own subprocess (isolates faults; shares the
persistent XLA compile cache).  ONE TPU job at a time.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

# (model, dataset, ref_mean, extra flags) — reference best rows; all used
# cosine schedule, lr 5e-4, n_data 1500, fold [7], max_ell 3
CONFIGS = [
    ("tfn",     "star",         0.0667, ["--pool", "first", "--n_layers", "4", "--n_epochs", "200"]),
    ("mace",    "star",         0.0766, ["--pool", "first", "--n_layers", "2", "--n_epochs", "200"]),
    ("dimenet", "star",         0.0837, ["--pool", "first", "--n_layers", "4", "--n_epochs", "600"]),
    ("egnn",    "star",         0.0986, ["--pool", "first", "--n_layers", "4", "--n_epochs", "600"]),
    ("dimenet", "paired_star",  0.0078, ["--pool", "first", "--n_layers", "4", "--n_epochs", "600", "--n_pairs", "2"]),
    ("mace",    "paired_star",  0.0254, ["--pool", "mean", "--n_layers", "2", "--n_epochs", "200", "--n_pairs", "2"]),
    ("egnn",    "paired_star",  0.0271, ["--pool", "mean", "--n_layers", "4", "--n_epochs", "600", "--n_pairs", "2"]),
    ("tfn",     "paired_star",  0.0712, ["--pool", "mean", "--n_layers", "4", "--n_epochs", "200", "--n_pairs", "2"]),
    ("mace",    "paired_star2", 0.1013, ["--pool", "mean", "--n_layers", "2", "--n_epochs", "200", "--n_pairs", "2"]),
    ("egnn",    "paired_star2", 0.3008, ["--pool", "first", "--n_layers", "4", "--n_epochs", "600", "--n_pairs", "2"]),
    # tfn/paired_star2 mean-pool row IS runnable with the reference's current
    # source (unlike its "first_and_last" row); dimenet/paired_star2 DIVERGED
    # in the reference ledger (mean 3.95e7) — stability comparison row.
    ("tfn",     "paired_star2", 0.1888, ["--pool", "mean", "--n_layers", "4", "--n_epochs", "200", "--n_pairs", "2"]),
    ("dimenet", "paired_star2", 39526332.0, ["--pool", "mean", "--n_layers", "4", "--n_epochs", "600", "--n_pairs", "2"]),
    # the two rows below anchor to the reference's UNLABELED (pre-dataset-
    # flag) ledger entries — star dataset, model-default pooling, single
    # reference runs.  fold/n_data/epochs mined from exp_history.json.
    ("spherenet", "star", 0.0735, ["--n_layers", "2", "--n_epochs", "200",
                                   "--fold", "5", "6", "7"]),
    ("tfn",     "star", 0.0055, ["--n_layers", "4", "--n_epochs", "200",
                                 "--fold", "5"]),
    ("egnn",    "star", 0.0079, ["--n_layers", "4", "--n_epochs", "600",
                                 "--fold", "8"]),
    ("dimenet", "star", 0.0169, ["--n_layers", "4", "--n_epochs", "200",
                                 "--fold", "7"]),
    ("mace",    "star", 0.0482, ["--n_layers", "2", "--n_epochs", "200",
                                 "--fold", "5", "6", "7"]),
    ("schnet",    "star", 0.7351, ["--n_layers", "4", "--n_epochs", "1200",
                                   "--fold", "3", "4", "5", "6", "7",
                                   "--n_data", "1400"]),
]

BASE = ["--lr", "5e-4", "--n_data", "1500", "--fold", "7", "--max_ell", "3",
        "--cosine", "--n_times", "3", "--results_file",
        "validation_history.json"]


def main(only=None):
    rows = []
    for model, dataset, ref_mean, extra in CONFIGS:
        if only and model not in only and dataset not in only:
            continue
        # extra AFTER BASE so per-config flags (fold, n_data) override the
        # sweep-wide defaults (argparse last-wins)
        cmd = [sys.executable, "-m",
               "geometric_message_passing_tpu.experiments.cli",
               "--model", model, "--dataset", dataset] + BASE + extra
        t0 = time.time()
        print(f"== {model}/{dataset} (ref {ref_mean}) ...", flush=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=3400)
            tail = (out.stdout or "").strip().splitlines()
            line = next((l for l in reversed(tail) if "Test MAE" in l), "")
            mean = std = float("nan")
            if line:
                parts = line.split()
                mean, std = float(parts[2]), float(parts[4])
            status = "ok" if line else f"FAILED rc={out.returncode}"
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:], flush=True)
        except subprocess.TimeoutExpired:
            mean = std = float("nan")
            status = "timeout"
        dt = time.time() - t0
        rows.append(dict(model=model, dataset=dataset, ref_mean=ref_mean,
                         mean=mean, std=std, status=status,
                         wall_s=round(dt, 1)))
        print(f"   -> {mean:.4f} ± {std:.4f} ({status}, {dt:.0f}s)",
              flush=True)
        with open("validation_sweep.json", "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
