"""Append-only experiment results ledger — same JSON schema as the
reference's exp_history.json (written by graph_angle_prediction.py:152-175):
argparse args dict + best_val_acc / test_acc / train_time lists + mean/std."""

from __future__ import annotations

import json
import os
from typing import Any, Dict


def append_result(path: str, record: Dict[str, Any]) -> None:
    results = []
    if os.path.isfile(path):
        with open(path, "r") as f:
            results = json.load(f)
    results.append(record)
    with open(path, "w") as f:
        json.dump(results, f, indent=4)
