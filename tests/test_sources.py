"""Fixture generation + source readers parse raw formats → canonical tables."""

import json
import os

import pytest

from bioie_llm_ray import fixtures
from bioie_llm_ray.sources import readers


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fixtures"))
    kb = fixtures.write_all(base, n_docs=50)
    return base, kb


def test_fixture_determinism(tmp_path):
    kb1 = fixtures.make_kb()
    kb2 = fixtures.make_kb()
    assert kb1.adjacency == kb2.adjacency
    assert kb1.negatome == kb2.negatome
    assert kb1.indra["test"][0] == kb2.indra["test"][0]


def test_protein_info_reader(fixture_dir):
    base, kb = fixture_dir
    ds = readers.read_protein_info(os.path.join(base, "STRING", "protein.info.txt"))
    rows = {r["string_protein_id"]: r["preferred_name"] for r in ds.take_all()}
    assert rows == {v: k for k, v in kb.protein_ids.items()}


def test_links_to_adjacency_matches_kb(fixture_dir):
    """S2+G1: the distributed adjacency equals the reference-semantics dict."""
    base, kb = fixture_dir
    info = readers.read_protein_info(os.path.join(base, "STRING", "protein.info.txt"))
    id_to_name = {
        r["string_protein_id"]: r["preferred_name"] for r in info.take_all()
    }
    links = readers.read_protein_links(os.path.join(base, "STRING", "protein.links.txt"))
    edges = readers.build_edges(links, id_to_name)
    adj = readers.edges_to_adjacency(edges)
    got = {r["src"]: sorted(r["neighbors"]) for r in adj.take_all()}
    assert got == kb.adjacency


def test_negatome_reader_strips_bom(fixture_dir):
    base, kb = fixture_dir
    ds = readers.read_negatome(os.path.join(base, "STRING", "negatome.csv"))
    rows = sorted((r["p1"], r["p2"]) for r in ds.take_all())
    assert rows == sorted(kb.negatome)
    # the utf-8-sig BOM must not leak into the first value
    assert all(not p1.startswith("﻿") for p1, _ in rows)


def test_kegg_readers(fixture_dir):
    base, kb = fixture_dir
    paths = readers.read_kegg_pathways(os.path.join(base, "KEGG", "kegg.pathway.hsa"))
    got = {r["pathway_id"]: r["pathway_name"] for r in paths.take_all()}
    assert got == kb.pathways

    genes = readers.read_kegg_genes(os.path.join(base, "KEGG", "kegg.hsa.genes"))
    got_g = {r["gene_id"]: list(r["aliases"]) for r in genes.take_all()}
    assert got_g == kb.gene_aliases

    pg = readers.read_kegg_pathway_genes(
        os.path.join(base, "KEGG", "kegg.hsa.pathway.genes")
    )
    got_pg = {}
    for r in pg.take_all():
        got_pg.setdefault(r["pathway_id"], []).append(r["gene_id"])
    assert {k: sorted(v) for k, v in got_pg.items()} == {
        k: sorted(v) for k, v in kb.pathway_genes.items()
    }

    rank = readers.read_dose_ranking(os.path.join(base, "KEGG", "high_dose_pathways.txt"))
    got_r = sorted(rank.take_all(), key=lambda r: r["rank"])
    assert [r["pathway_id"] for r in got_r] == kb.dose_ranking["high"]


def test_indra_reader_filters_duplicate_mentions(fixture_dir):
    base, kb = fixture_dir
    ds = readers.read_indra_statements(os.path.join(base, "INDRA", "test.json"))
    rows = ds.take_all()
    ids = {r["id"] for r in rows}
    assert "test-dup" not in ids  # violating row dropped (M2)
    # reference semantics: substring count, so PROT1 paired with PROT12 is
    # also (correctly) dropped (indra_reader.py:72)
    expected = {
        s["id"]
        for s in kb.indra["test"]
        if s["text"].count(s["entity_1"][0]) == 1
        and s["text"].count(s["entity_2"][0]) == 1
    }
    assert ids == expected
    by_id = {r["id"]: r for r in rows}
    s0 = kb.indra["test"][0]
    got = by_id[s0["id"]]
    assert got["entity_1"]["name"] == s0["entity_1"][0]
    assert got["entity_1"]["span_start"] == s0["entity_1"][1][0]
    assert got["rel_type"] == s0["rel_type"]


def test_docs_reader_sha_invariant(fixture_dir):
    import hashlib

    base, _ = fixture_dir
    ds = readers.read_docs(os.path.join(base, "docs", "docs.parquet"))
    for r in ds.take(10):
        assert (
            r["content_sha256"]
            == hashlib.sha256(r["content"].encode()).hexdigest()
        )


def test_legacy_result_file_roundtrip(tmp_path):
    from bioie_llm_ray.state.legacy import write_result_file

    preds = [
        ("PROT1", "PROT2", "PROT2"),
        ("PROT1", "NONE", "PROT3"),
        ("PROT4", "PROT5", "PROT5"),
    ]
    path = str(tmp_path / "entity_result.txt")
    write_result_file(
        path,
        src=[p[0] for p in preds],
        pred=[p[1] for p in preds],
        true=[p[2] for p in preds],
        scores={"accuracy": 2 / 3, "micro_f": 2 / 3},
        n_shots=2,
    )
    ds = readers.read_legacy_result_file(path)
    rows = [(r["src"], r["pred"], r["true"]) for r in ds.take_all()]
    assert rows == preds
