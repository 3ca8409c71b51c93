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


class TestEntityTypeTask:
    """run_model.py:549, 563-565 wiring over the containment parser."""

    def test_noise_free_perfect(self):
        from bioie_llm_ray.pipelines.tasks import entity_type_task

        rows = [
            {
                "entity": f"SAMPLE{i}",
                "text": f"the construct SAMPLE{i} was assayed",
                "answer": CHOICES[i % 3].lower(),
            }
            for i in range(30)
        ]
        kb = {f"SAMPLE{i}": CHOICES[i % 3] for i in range(30)}
        res = entity_type_task(
            ray.data.from_pandas(pd.DataFrame(rows)),
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

    def test_prompt_uses_family_entity_type_template(self):
        """Key the mock KB by the exact rendered prompt: the task only scores
        correctly if the scorer saw precisely that family template output."""
        from bioie_llm_ray.functions.prompts import get_templates
        from bioie_llm_ray.pipelines.tasks import entity_type_task

        templates = get_templates("llama2", "string")
        expected_prompt = templates.entity_type_q.format(
            entity="SAMPLE1", text="body text", choices=", ".join(CHOICES)
        )
        rows = [{"entity": "SAMPLE1", "text": "body text", "answer": "growth"}]
        res = entity_type_task(
            ray.data.from_pandas(pd.DataFrame(rows)),
            choices=CHOICES,
            scorer_kwargs={
                "kind": "containment",
                "kb": {expected_prompt: "growth"},
                "flip_rate": 0.0,
                "key_col": "text",
            },
            templates=templates,
            concurrency=1,
        )
        rows_out = res.predictions.take_all()
        assert rows_out[0]["pred"] == "growth"


class TestEntityAndEntityType:
    """Open extraction + K4 raw-JSON dump (run_model.py:737-762)."""

    GOLD = {
        "d0": ["pUC19 (plasmid)", "lacZ (reporter)"],
        "d1": ["T7 (promoter)"],
        "d2": [],
    }

    def _docs(self):
        return ray.data.from_items(
            [
                {"doc_id": d, "text": f"text of {d}", "answer": g}
                for d, g in sorted(self.GOLD.items())
            ]
        )

    def test_extraction_roundtrip(self):
        from bioie_llm_ray.pipelines.tasks import entity_and_entity_type_task

        out = entity_and_entity_type_task(
            self._docs(),
            choices=["plasmid", "reporter", "promoter"],
            scorer_kwargs={
                "kind": "entity_and_entity_type",
                "kb": self.GOLD,
                "miss_rate": 0.0,
                "key_col": "entity",
            },
        ).take_all()
        got = {(r["src"], r["pred_entity"], r["pred_type"]) for r in out}
        assert got == {
            ("d0", "pUC19", "plasmid"),
            ("d0", "lacZ", "reporter"),
            ("d1", "T7", "promoter"),
        }
        assert all(r["hit"] for r in out)

    def test_raw_json_dump(self, tmp_path):
        import json

        from bioie_llm_ray.pipelines.tasks import entity_and_entity_type_task
        from bioie_llm_ray.state.legacy import write_raw_results_json

        preds = entity_and_entity_type_task(
            self._docs(),
            choices=["plasmid", "reporter", "promoter"],
            scorer_kwargs={
                "kind": "entity_and_entity_type",
                "kb": self.GOLD,
                "miss_rate": 0.0,
                "key_col": "entity",
            },
        )
        path = write_raw_results_json(preds, str(tmp_path / "eet_result.txt"))
        with open(path) as f:
            rows = json.load(f)
        assert len(rows) == 3
        assert {r["pred_entity"] for r in rows} == {"pUC19", "lacZ", "T7"}

    def test_pair_parser(self):
        from bioie_llm_ray.functions.parsing import parse_entity_type_pairs

        assert parse_entity_type_pairs(
            "Answer: pUC19 (plasmid), lacZ promoter region (promoter)"
        ) == [("pUC19", "plasmid"), ("lacZ promoter region", "promoter")]
        assert parse_entity_type_pairs("no pairs here") == []


class TestHFScorerContract:
    def test_raises_clearly_without_transformers(self):
        with pytest.raises(NotImplementedError, match="transformers"):
            HFScorer("any-model")
