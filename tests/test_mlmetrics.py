"""Evaluation metrics (A11) — exact values on hand-computed fixtures."""

from __future__ import annotations

import pytest

from crawler_ray.functions.mlmetrics import (confusion_counts,
                                             evaluate_classification)


def test_perfect_prediction():
    r = evaluate_classification(["a", "b", "a"], ["a", "b", "a"])
    assert r["accuracy"] == 1.0
    assert r["macro_f1"] == 1.0


def test_hand_computed():
    y_true = ["a", "a", "a", "b", "b", "c"]
    y_pred = ["a", "a", "b", "b", "c", "c"]
    r = evaluate_classification(y_true, y_pred)
    assert r["accuracy"] == pytest.approx(4 / 6)
    pc = r["per_class"]
    assert pc["a"]["precision"] == 1.0
    assert pc["a"]["recall"] == pytest.approx(2 / 3)
    assert pc["b"]["precision"] == pytest.approx(1 / 2)
    assert pc["b"]["recall"] == pytest.approx(1 / 2)
    assert pc["c"]["precision"] == pytest.approx(1 / 2)
    assert pc["c"]["recall"] == 1.0
    counts = confusion_counts(y_true, y_pred)
    assert counts["a"] == {"tp": 2, "fp": 0, "fn": 1, "support": 3}


def test_zero_division_and_empty():
    r = evaluate_classification(["a", "a"], ["b", "b"])
    assert r["accuracy"] == 0.0
    assert r["per_class"]["a"]["precision"] == 0.0  # no predictions of a
    assert r["per_class"]["b"]["recall"] == 0.0     # no true b
    empty = evaluate_classification([], [])
    assert empty["accuracy"] == 0.0
    with pytest.raises(ValueError):
        evaluate_classification(["a"], [])
