"""Model-family prompt-template registry (reference src/prompters/*.py)."""

import pytest

from bioie_llm_ray.functions.prompts import (
    REGISTRY,
    PromptTemplates,
    get_templates,
    resolve_family,
)

ALL_FAMILIES = [
    "llama2",
    "llama3",
    "llama3.1",
    "mistral",
    "mpt",
    "falcon",
    "galactica",
    "biogpt",
    "biomedlm",
    "solar",
    "alpaca",
    "rst",
]


class TestRegistry:
    @pytest.mark.parametrize("family", ALL_FAMILIES + ["default"])
    @pytest.mark.parametrize("dataset", ["string", "kegg", "indra"])
    def test_all_families_resolve(self, family, dataset):
        t = get_templates(family, dataset)
        assert isinstance(t, PromptTemplates)
        # every template renders with its placeholders
        assert "{entity}" in t.entity_q
        t.entity_q.format(entity="TP53")
        t.relation_q.format(e1="TP53", e2="MDM2")
        t.relation_type_q.format(
            text="s", e1="a", e2="b", choices="activation, inhibition"
        )
        t.entity_type_q.format(entity="x", text="s", choices="a, b")

    def test_family_shapes(self):
        """Spot-check each family's distinctive rendered markers
        (active lambdas of the reference prompter files)."""
        s = lambda fam: get_templates(fam, "string")  # noqa: E731
        assert s("llama2").entity_q.startswith("QUESTION: Which proteins interact")
        assert s("llama2").entity_q.endswith("\nANSWER:")
        assert s("falcon").entity_q.startswith(">>QUESTION<<")
        assert s("falcon").relation_q.endswith(">>ANSWER<<")
        assert s("galactica").entity_a.rstrip("\n").endswith("</s>")
        assert s("galactica").relation_q == (
            "Question: Are {e1} and {e2} related to each other?\n\nAnswer:"
        )
        assert s("biomedlm").relation_q.endswith("? Answer:")
        assert s("alpaca").entity_q == (
            'The following proteins interact with the protein "{entity}":'
        )
        assert s("rst").entity_q.endswith("? Answer:")
        assert s("biogpt").entity_q.startswith(
            "Question: Which proteins are related to"
        )
        k = get_templates("mpt", "kegg")
        assert "genes are related to" in k.entity_q
        assert "genes are associated with" in get_templates("llama3", "kegg").entity_q

    def test_template_hashes_distinct_per_family(self):
        hashes = {get_templates(f, "string").hash() for f in ALL_FAMILIES}
        # llama2/llama3/solar share active templates by design (identical
        # prompter lambdas in the reference); the distinct shapes must differ
        assert len(hashes) >= 7

    def test_resolve_family_from_model_names(self):
        cases = {
            "meta-llama/Llama-2-7b-chat-hf": "llama2",
            "meta-llama/Meta-Llama-3-8B": "llama3",
            "meta-llama/Llama-3.1-8B-Instruct": "llama3.1",
            "mistralai/Mistral-7B-v0.1": "mistral",
            "mosaicml/mpt-7b": "mpt",
            "tiiuae/falcon-7b": "falcon",
            "facebook/galactica-6.7b": "galactica",
            "microsoft/BioGPT-Large": "biogpt",
            "stanford-crfm/BioMedLM": "biomedlm",
            "upstage/SOLAR-10.7B-v1.0": "solar",
            "chavinlo/alpaca-native": "alpaca",
            "XLab/rst-all-11b": "rst",
            "some/unknown-model": "default",
        }
        for name, fam in cases.items():
            assert resolve_family(name) == fam, name
        # get_templates accepts a raw model name too
        assert get_templates("tiiuae/falcon-7b", "string").entity_q.startswith(
            ">>QUESTION<<"
        )

    def test_registry_complete(self):
        for fam in ALL_FAMILIES + ["default"]:
            for ds in ["string", "kegg", "indra"]:
                assert (fam, ds) in REGISTRY


class TestTaskUnderNonDefaultFamily:
    def test_string_entity_task_with_galactica_templates(self, tmp_path):
        """A task pipeline runs end-to-end under a non-default family and the
        prompts carry that family's markers."""
        import pandas as pd
        import ray

        from bioie_llm_ray.pipelines import tasks

        adjacency = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "src": [f"P{i}" for i in range(15)],
                    "neighbors": [
                        [f"P{(i + j) % 15}" for j in range(1, 12)]
                        for i in range(15)
                    ],
                }
            )
        )
        gold = {
            f"P{i}": sorted({f"P{(i + j) % 15}" for j in range(1, 12)})
            for i in range(15)
        }
        res = tasks.string_entity_task(
            adjacency,
            test_size=5,
            n_shots=1,
            scorer_kwargs={"kind": "entity", "kb": gold, "miss_rate": 0.0},
            templates=get_templates("galactica", "string"),
        )
        preds = res.predictions.take_all()
        assert preds and all(r["pred"] == r["true"] for r in preds)
