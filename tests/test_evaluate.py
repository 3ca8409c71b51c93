"""Evaluation jobs: confusion matrix, cross-model analytics, stage chaining."""

import numpy as np
import pandas as pd
import pytest
import ray

from bioie_llm_ray.functions.metrics import full_match_counts
from bioie_llm_ray.pipelines.evaluate import (
    chain_entity_to_relation,
    confusion_matrix,
    full_match_intersection,
    stage_agreement,
)


def _preds(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["src", "pred", "true"])
    )


class TestConfusionMatrix:
    def test_counts_and_label_filter(self):
        ds = _preds(
            [
                ("a", "yes", "yes"),
                ("b", "no", "yes"),
                ("c", "no", "no"),
                ("d", "garbage", "no"),  # pred outside label set → dropped
            ]
        )
        m, labels = confusion_matrix(ds, ["yes", "no"])
        assert labels == ["yes", "no"]
        # true=yes: pred yes 1, pred no 1; true=no: pred no 1
        assert m.tolist() == [[1, 1], [0, 1]]


class TestFullMatch:
    def test_counts(self):
        rows = []
        for src, hits in [("q1", 2), ("q2", 0), ("q3", 1)]:
            for i in range(2):
                rows.append(
                    (src, f"g{i}" if i < hits else "NONE", f"g{i}")
                )
        n_full, n_none, n_q = full_match_counts(_preds(rows), k=2)
        assert (n_full, n_none, n_q) == (1, 1, 3)

    def test_intersection_across_models(self):
        def model(hits_by_src):
            rows = []
            for src, hits in hits_by_src.items():
                for i in range(2):
                    rows.append(
                        (src, f"g{i}" if i < hits else "NONE", f"g{i}")
                    )
            return _preds(rows)

        a = model({"q1": 2, "q2": 2, "q3": 0})
        b = model({"q1": 2, "q2": 0, "q3": 2})
        out = full_match_intersection({"a": a, "b": b}, k=2)
        assert out["common"] == ["q1"]
        assert out["per_model_full"] == {"a": 2, "b": 2}
        assert out["unique"] == {"a": ["q2"], "b": ["q3"]}


class TestStageChaining:
    def test_entity_to_relation_roundtrip(self):
        # entity stage predicted: (P1,P2) (P1,P3) and a NONE row
        entity_preds = _preds(
            [
                ("P1", "P2", "P2"),
                ("P1", "P3", "P3"),
                ("P1", "NONE", "P4"),
            ]
        )
        # verifier KB holds only pair P1-P2 → confirms 1 of 2
        kb = {"P1\x1fP2"}
        rel = chain_entity_to_relation(
            entity_preds,
            scorer_cls=__import__(
                "bioie_llm_ray.stages.scorer", fromlist=["MockScorer"]
            ).MockScorer,
            scorer_kwargs={"kind": "relation", "kb": kb, "flip_rate": 0.0},
        )
        rows = rel.take_all()
        assert len(rows) == 2  # NONE row excluded
        agreement = stage_agreement(entity_preds, rel)
        assert agreement["n_pairs"] == 2
        assert agreement["n_confirmed"] == 1
        assert agreement["agreement"] == 0.5

    def test_result_comparer_parity_hand_computed(self):
        """Full result_comparer.py:74-128 semantics on a hand-built fixture.

        Chained rows (entity correct?, relation confirmed?):
          (P1,P2): ent True,  rel yes  -> agree
          (P1,P3): ent True,  rel no   -> disagree
          (P2,P4): ent False, rel yes  -> disagree
          (P2,P5): ent False, rel no   -> agree
        Joint accuracy 2/4; entity-correct subset = first two rows, relation
        accuracy there 1/2; confusion yes/yes=1 yes/no=1, no row zero.
        """
        entity_preds = _preds(
            [
                ("P1", "P2", "P2"),
                ("P1", "P3", "P3"),
                ("P2", "P4", "X"),
                ("P2", "P5", "Y"),
            ]
        )
        rel = _preds(
            [
                ("P1\x1fP2", "yes", "yes"),
                ("P1\x1fP3", "no", "yes"),
                ("P2\x1fP4", "yes", "yes"),
                ("P2\x1fP5", "no", "yes"),
            ]
        )
        out = stage_agreement(entity_preds, rel)
        assert out["joint_accuracy"] == 0.5
        assert out["n_joint_agree"] == 2
        assert out["joint_micro_f1"] == 0.5
        assert out["n_entity_correct"] == 2
        assert out["entity_correct_accuracy"] == 0.5
        assert out["confusion_yes_no"] == {
            "yes_yes": 1,
            "yes_no": 1,
            "no_yes": 0,
            "no_no": 0,
        }
