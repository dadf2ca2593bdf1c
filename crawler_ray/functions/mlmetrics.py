"""Classification evaluation metrics (SURVEY §2 A11).

Parity with the reference's offline evaluation helpers
(``utils/ml.py:77-107`` accuracy/precision/recall/F1;
``ml/training/train_model_utils.py:501-569`` per-class report) without
sklearn: exact numpy implementations.  Macro averaging over the classes
present in y_true ∪ y_pred, zero-division -> 0.0 (sklearn's
``zero_division=0`` convention).
"""

from __future__ import annotations

import numpy as np

__all__ = ["confusion_counts", "evaluate_classification"]


def confusion_counts(y_true, y_pred) -> dict[str, dict[str, int]]:
    """Per-class true-positive / false-positive / false-negative counts."""
    classes = sorted(set(y_true) | set(y_pred))
    t = np.asarray(y_true)
    p = np.asarray(y_pred)
    out = {}
    for c in classes:
        tp = int(np.sum((t == c) & (p == c)))
        fp = int(np.sum((t != c) & (p == c)))
        fn = int(np.sum((t == c) & (p != c)))
        out[c] = {"tp": tp, "fp": fp, "fn": fn,
                  "support": int(np.sum(t == c))}
    return out


def evaluate_classification(y_true, y_pred) -> dict:
    """accuracy + per-class and macro precision/recall/F1."""
    if len(y_true) != len(y_pred):
        raise ValueError("length mismatch")
    if not len(y_true):
        return {"accuracy": 0.0, "macro_precision": 0.0,
                "macro_recall": 0.0, "macro_f1": 0.0, "per_class": {}}
    counts = confusion_counts(y_true, y_pred)
    per_class = {}
    for c, cc in counts.items():
        prec = cc["tp"] / (cc["tp"] + cc["fp"]) if cc["tp"] + cc["fp"] else 0.0
        rec = cc["tp"] / (cc["tp"] + cc["fn"]) if cc["tp"] + cc["fn"] else 0.0
        f1 = (2 * prec * rec / (prec + rec)) if prec + rec else 0.0
        per_class[c] = {"precision": prec, "recall": rec, "f1": f1,
                        "support": cc["support"]}
    t = np.asarray(y_true)
    p = np.asarray(y_pred)
    n = len(per_class)
    return {
        "accuracy": float(np.mean(t == p)),
        "macro_precision": sum(v["precision"]
                               for v in per_class.values()) / n,
        "macro_recall": sum(v["recall"] for v in per_class.values()) / n,
        "macro_f1": sum(v["f1"] for v in per_class.values()) / n,
        "per_class": per_class,
    }
