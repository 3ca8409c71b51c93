"""Unit tests for sort_and_pad (M12) and the metric kernels (G4)."""

import numpy as np
import pytest

from bioie_llm_ray.functions.align import sort_and_pad
from bioie_llm_ray.functions.metrics import (
    compute_metrics,
    from_label_counts,
    label_counts,
    merge_label_counts,
)


class TestSortAndPad:
    def test_common_first_then_pad(self):
        pred, true = sort_and_pad(["A", "B"], ["B", "C", "D"])
        assert pred == ["B", "A", "NONE"]
        assert true == ["B", "C", "D"]

    def test_truncate_to_k(self):
        gold = [f"G{i}" for i in range(15)]
        pred, true = sort_and_pad(gold[:3], gold, max_entity_list_len=10)
        assert len(pred) == 10 and len(true) == 10
        assert pred[:3] == gold[:3]
        assert pred[3:] == ["NONE"] * 7

    def test_all_match(self):
        pred, true = sort_and_pad(["A", "B"], ["A", "B"])
        assert pred == true == ["A", "B"]

    def test_empty_pred(self):
        pred, true = sort_and_pad([], ["A", "B"])
        assert pred == ["NONE", "NONE"]
        assert true == ["A", "B"]

    def test_dedup(self):
        pred, true = sort_and_pad(["A", "A", "B"], ["B", "B", "A"])
        assert pred == ["A", "B"]
        assert true == ["A", "B"]

    def test_pred_longer_not_padded_on_true(self):
        # reference pads only the pred side (base_processor.py:1590-1592)
        pred, true = sort_and_pad(["A", "B", "C"], ["A"])
        assert pred == ["A", "B", "C"]
        assert true == ["A"]


class TestMetrics:
    def test_perfect(self):
        m = compute_metrics(["a", "b", "a"], ["a", "b", "a"])
        assert m["accuracy"] == 1.0
        assert m["micro_f"] == 1.0
        assert m["macro_f"] == 1.0

    def test_known_values_vs_sklearn_hand_checked(self):
        # hand-verified against sklearn semantics:
        # true = [a a b b c], pred = [a b b c c]
        true = ["a", "a", "b", "b", "c"]
        pred = ["a", "b", "b", "c", "c"]
        m = compute_metrics(true, pred)
        # label a: tp=1 fp=0 fn=1 → P=1, R=.5, F=2/3
        # label b: tp=1 fp=1 fn=1 → P=.5, R=.5, F=.5
        # label c: tp=1 fp=1 fn=0 → P=.5, R=1, F=2/3
        assert m["accuracy"] == pytest.approx(3 / 5)
        assert m["micro_p"] == pytest.approx(3 / 5)
        assert m["micro_r"] == pytest.approx(3 / 5)
        assert m["macro_p"] == pytest.approx((1 + 0.5 + 0.5) / 3)
        assert m["macro_r"] == pytest.approx((0.5 + 0.5 + 1) / 3)
        assert m["macro_f"] == pytest.approx((2 / 3 + 0.5 + 2 / 3) / 3)
        # weighted by true support: a:2 b:2 c:1
        assert m["weighted_f"] == pytest.approx(
            (2 * (2 / 3) + 2 * 0.5 + 1 * (2 / 3)) / 5
        )

    def test_label_only_in_pred(self):
        # pred-only label enters the label set with support 0 (sklearn parity)
        m = compute_metrics(["a", "a"], ["a", "z"])
        # labels {a, z}: a: tp1 fn1 → P=1 R=.5 F=2/3 ; z: fp1 → P=0 R=0 F=0
        assert m["macro_p"] == pytest.approx(0.5)
        assert m["macro_f"] == pytest.approx((2 / 3) / 2)
        assert m["weighted_f"] == pytest.approx(2 / 3)  # z has 0 support

    def test_merge_partials_equals_single_shot(self):
        rng = np.random.RandomState(7)
        labels = np.array(["x", "y", "z", "w"])
        true = labels[rng.randint(0, 4, 500)].tolist()
        pred = labels[rng.randint(0, 4, 500)].tolist()
        whole = compute_metrics(true, pred)
        parts = [
            label_counts(true[i : i + 100], pred[i : i + 100])
            for i in range(0, 500, 100)
        ]
        merged = from_label_counts(merge_label_counts(parts))
        for k in whole:
            assert merged[k] == pytest.approx(whole[k])
