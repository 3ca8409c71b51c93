"""Containment-task pipeline (kbase variant, M11) and HFScorer contract."""

import pandas as pd
import pytest
import ray

from bioie_llm_ray.functions.metrics import metrics_from_predictions
from bioie_llm_ray.pipelines.tasks import containment_task
from bioie_llm_ray.stages.scorer import HFScorer, MockScorer


CHOICES = ["growth", "decay", "transport"]


def _statements():
    rows = [
        {"entity": f"SAMPLE{i}", "answer": CHOICES[i % 3].lower()}
        for i in range(30)
    ]
    return ray.data.from_pandas(pd.DataFrame(rows))


class TestContainmentTask:
    def test_noise_free_perfect(self):
        kb = {f"SAMPLE{i}": CHOICES[i % 3] for i in range(30)}
        res = containment_task(
            _statements(),
            choices=CHOICES,
            scorer_kwargs={
                "kind": "containment",
                "kb": kb,
                "flip_rate": 0.0,
                "choices": CHOICES,
            },
        )
        m = metrics_from_predictions(res.predictions)
        assert m["micro_f"] == 1.0, m
        t = res.triples.take(5)
        assert all(r["pred"] == "has_type" for r in t)

    def test_unknown_entity_yields_none(self):
        res = containment_task(
            _statements(),
            choices=CHOICES,
            scorer_kwargs={"kind": "containment", "kb": {}, "flip_rate": 0.0},
        )
        rows = res.predictions.take_all()
        assert all(r["pred"] == "None" for r in rows)
        assert res.triples.count() == 0


class TestHFScorerContract:
    def test_raises_clearly_without_transformers(self):
        with pytest.raises(NotImplementedError, match="transformers"):
            HFScorer("any-model")
