"""Reference-parity gate: Ray pipelines vs the sequential reference oracle.

The oracle (bioie_llm_ray/parity.py) reimplements the reference's parse →
align → score flow verbatim and independently; these tests drive BOTH
implementations with identical inputs and assert agreement — the
P/R ≥ 0.95 criterion of BASELINE.json (measured: 1.0).
"""

import os

import pytest
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from bioie_llm_ray import fixtures, parity
from bioie_llm_ray.functions.align import sort_and_pad
from bioie_llm_ray.functions.metrics import compute_metrics
from bioie_llm_ray.functions.parsing import (
    parse_choice_response,
    parse_entity_response,
)
from bioie_llm_ray.pipelines import tasks
from bioie_llm_ray.sources import readers

NAMES = ["TP53", "MDM2", "EB1", "RHEB", "PSD", "PSD-95", "GENE_A", "AKT1"]


class TestParserParity:
    @given(
        gold=st.lists(st.sampled_from(NAMES), min_size=1, max_size=6),
        parts=st.lists(
            st.sampled_from(NAMES + ["and", "binds", ",", "x", "(maybe)"]),
            max_size=12,
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_entity_parser_matches_reference(self, gold, parts):
        response = "Answer: " + " ".join(parts)
        assert parse_entity_response(response, gold) == (
            parity.ref_clean_response_entity(response, gold)
        )

    @given(
        tokens=st.lists(
            st.sampled_from(
                ["yes", "no", "Yes.", "(no)", "maybe", "the", "answer:", "NO"]
            ),
            max_size=6,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_choice_parser_matches_reference(self, tokens):
        response = " ".join(tokens)
        assert parse_choice_response(response, ["yes", "no"]) == (
            parity.ref_clean_response_choice(response, ["yes", "no"])
        )

    @given(
        pred=st.lists(st.sampled_from(NAMES), max_size=8),
        true=st.lists(st.sampled_from(NAMES), min_size=1, max_size=8),
    )
    @settings(max_examples=200, deadline=None)
    def test_sort_and_pad_order_insensitive_parity(self, pred, true):
        ours_p, ours_t = sort_and_pad(pred, true)
        ref_p, ref_t = parity.ref_sort_and_pad(
            list(dict.fromkeys(pred)), list(dict.fromkeys(true))
        )
        # positional order of non-common values is set-order dependent in the
        # reference; the score-relevant quantities must agree exactly:
        assert len(ours_p) == len(ref_p) and len(ours_t) == len(ref_t)
        assert {p for p, t in zip(ours_p, ours_t) if p == t} == {
            p for p, t in zip(ref_p, ref_t) if p == t
        }
        assert ours_p.count("NONE") == ref_p.count("NONE")
        # micro metrics over the aligned pairs agree
        ours_m = compute_metrics(ours_t, ours_p)
        ref_m = compute_metrics(ref_t, ref_p)
        assert ours_m["micro_f"] == pytest.approx(ref_m["micro_f"])


class TestPipelineParity:
    def test_string_entity_pipeline_matches_reference_oracle(self, tmp_path):
        base = str(tmp_path / "fx")
        kb = fixtures.write_all(base, n_docs=10)
        info = readers.read_protein_info(
            os.path.join(base, "STRING/protein.info.txt")
        )
        id2n = {
            r["string_protein_id"]: r["preferred_name"] for r in info.take_all()
        }
        adjacency = readers.edges_to_adjacency(
            readers.build_edges(
                readers.read_protein_links(
                    os.path.join(base, "STRING/protein.links.txt")
                ),
                id2n,
            )
        ).materialize()

        # miss_rate 0.4 ≈ a strong real model (reference best micro-F1 0.39):
        # most queries then match < k=10 golds, so the reference's
        # set-order-dependent truncation (see below) stays rare, as it is in
        # the reference's own published runs
        kb_ref = ray.put(kb.adjacency)
        res = tasks.string_entity_task(
            adjacency,
            test_size=25,
            n_shots=2,
            scorer_kwargs={"kind": "entity", "kb": kb_ref, "miss_rate": 0.4},
        )
        rows = res.predictions.take_all()

        # rebuild the oracle's inputs: same split, same mock responses
        from bioie_llm_ray.stages.scorer import MockScorer

        scorer = MockScorer(kind="entity", kb=kb.adjacency, miss_rate=0.4)
        queries = sorted({r["src"] for r in rows})
        items = [
            (q, scorer._respond(q), sorted(set(kb.adjacency[q])))
            for q in queries
        ]
        oracle = parity.ref_entity_eval(items, k=10)

        # 1) identical row volume
        assert len(rows) == oracle["n_rows"]
        # 2) per-query: matched counts and pad counts identical; matched SETS
        # identical except under truncation — when more than k gold names
        # match, the reference keeps a Python-set-order-dependent subset
        # (base_processor.py:1571-1584), i.e. the reference itself is
        # nondeterministic across processes there.  Both subsets must then
        # come from the same candidate pool.
        ours = {}
        for r in rows:
            entry = ours.setdefault(r["src"], [set(), 0, 0])
            if r["pred"] == r["true"]:
                entry[0].add(r["pred"])
            entry[1] += 1
            if r["pred"] == "NONE":
                entry[2] += 1
        n_truncated = 0
        for q, (m, n, p) in oracle["per_query"].items():
            om, on, op = ours[q]
            assert (len(om), on, op) == (len(m), n, p), q
            if len(m) < 10 or p > 0:  # no truncation of matches
                assert om == m, q
            else:
                n_truncated += 1
                candidates = set(kb.adjacency[q])
                assert om <= candidates and m <= candidates, q
        # 3) triple-set P/R vs the oracle ≥ 0.95 (BASELINE gate; <1.0 only
        # from the truncation ambiguity above)
        got_triples = {
            (r["src"], "interacts_with", r["pred"])
            for r in rows
            if r["pred"] != "NONE"
        }
        inter = got_triples & oracle["triples"]
        precision = len(inter) / len(got_triples)
        recall = len(inter) / len(oracle["triples"])
        assert precision >= 0.95 and recall >= 0.95, (precision, recall)

    def test_relation_pipeline_matches_reference_oracle(self, tmp_path):
        base = str(tmp_path / "fx2")
        kb = fixtures.write_all(base, n_docs=10)
        info = readers.read_protein_info(
            os.path.join(base, "STRING/protein.info.txt")
        )
        id2n = {
            r["string_protein_id"]: r["preferred_name"] for r in info.take_all()
        }
        adjacency = readers.edges_to_adjacency(
            readers.build_edges(
                readers.read_protein_links(
                    os.path.join(base, "STRING/protein.links.txt")
                ),
                id2n,
            )
        ).materialize()
        negatome = readers.read_negatome(os.path.join(base, "STRING/negatome.csv"))

        pos_pairs = {
            f"{min(a, b)}\x1f{max(a, b)}"
            for a, nbrs in kb.adjacency.items()
            for b in nbrs
        }
        res = tasks.string_relation_task(
            adjacency,
            negatome,
            n_pairs_per_side=20,
            scorer_kwargs={"kind": "relation", "kb": pos_pairs, "flip_rate": 0.05},
        )
        rows = res.predictions.take_all()

        from bioie_llm_ray.stages.scorer import MockScorer

        scorer = MockScorer(kind="relation", kb=pos_pairs, flip_rate=0.05)
        items = [
            (r["src"], scorer._respond(r["src"]), r["true"]) for r in rows
        ]
        oracle = parity.ref_choice_eval(items, ["yes", "no"])
        ours = [(r["src"], r["pred"], r["true"]) for r in rows]
        assert sorted(ours) == sorted(oracle)
        # metric parity follows from identical rows
        m = compute_metrics([t for _, _, t in ours], [p for _, p, _ in ours])
        assert 0.0 <= m["micro_f"] <= 1.0
