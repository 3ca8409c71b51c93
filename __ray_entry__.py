"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).  Results are pandas
DataFrames (small aggregates); no function here calls ``ray.init``.

Query families (SURVEY.md §2 coverage):
- relational core: aggregates, broadcast + partitioned shuffle joins, top-k
- stream-shaped: tumbling windows, sessionization over the events log
- document/KG: mention detection (M9 boundary semantics), co-occurrence edge
  extraction, entity linking + salted canonical triple dedup
- training-data ops: exact dedup, MinHash-LSH / SimHash / embedding near-dup,
  brute-force + IVF similarity search, token counts, quality scoring,
  fingerprinting, language-ID
- reference benchmark tasks (STRING/KEGG/INDRA with the deterministic
  MockScorer) over self-generated fixtures — rows-only oracles.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_DOC_VOCAB_SQL = (
    "('spark','hash','join','merge','sort','filter','window','vector',"
    "'stream','batch')"
)

_TOKENS = (
    "SELECT doc_id, unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token "
    "FROM documents"
)

# Shared ER pipeline CTEs (blocking -> purge -> CBS weighting -> exact
# shingle-Jaccard verify -> recursive transitive closure); composed by the
# er_entity_clusters and er_golden_records oracles with different finals.
_ER_CTES = r"""arr AS (
                SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            tb AS (
                SELECT DISTINCT doc_id,
                       array_to_string(a[i + 1 : i + 3], ' ') AS key
                FROM arr, unnest(range(0, GREATEST(len(a) - 2, 0))) AS t(i)
                WHERE len(a) >= 3),
            sizes AS (SELECT key, count(*) AS c FROM tb GROUP BY 1),
            kept AS (
                SELECT tb.doc_id, tb.key
                FROM tb JOIN sizes USING (key)
                WHERE c BETWEEN 2 AND 10),
            cand AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM kept a JOIN kept b
                  ON a.key = b.key AND a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2),
            words AS (
                SELECT doc_id, w, i
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w,
                             generate_subscripts(
                                 string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'), 1) AS i
                      FROM documents)
                WHERE w <> ''),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM words a
                JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT cd.id_a, cd.id_b, count(*) AS m
                FROM cand cd
                JOIN sh x ON x.doc_id = cd.id_a
                JOIN sh y ON y.doc_id = cd.id_b AND y.s = x.s
                GROUP BY 1, 2),
            pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN cnt ca ON ca.doc_id = id_a
                JOIN cnt cb ON cb.doc_id = id_b
                WHERE m::DOUBLE / (ca.n + cb.n - m) >= 0.5),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
            r(n, x) AS (
                SELECT DISTINCT a, a FROM edges
                UNION
                SELECT r.n, e.b FROM r JOIN edges e ON e.a = r.x)"""


def entry() -> Any:
    """Flagship pipeline: canonical co-occurrence triples at sf0.001."""
    from bioie_llm_ray.pipelines import analytics

    return analytics.triples_canonical("/root/testdata/sf0.001")


def _kg_fixture_dir(sf_dir: str) -> str:
    """Deterministic synthetic KB fixtures, cached per scale under /tmp."""
    from bioie_llm_ray import fixtures

    from bioie_llm_ray import __version__

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join("/tmp", f"bioie_ray_fixtures_v{__version__}", tag)
    marker = os.path.join(base, ".complete")
    if not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        fixtures.write_all(base, n_docs=200)
        with open(marker, "w") as f:
            f.write("ok")
    return base


def _kg_adjacency(base: str):
    import ray

    from bioie_llm_ray.sources import readers

    info = readers.read_protein_info(os.path.join(base, "STRING/protein.info.txt"))
    id2n = {r["string_protein_id"]: r["preferred_name"] for r in info.take_all()}
    links = readers.read_protein_links(os.path.join(base, "STRING/protein.links.txt"))
    return readers.edges_to_adjacency(readers.build_edges(links, id2n))


def _kg_string_entity(sf_dir: str):
    import ray

    base = _kg_fixture_dir(sf_dir)
    adjacency = _kg_adjacency(base)
    gold = {r["src"]: sorted(r["neighbors"]) for r in adjacency.take_all()}
    from bioie_llm_ray.pipelines import tasks

    res = tasks.string_entity_task(
        _kg_adjacency(base),
        test_size=30,
        n_shots=2,
        scorer_kwargs={"kind": "entity", "kb": ray.put(gold), "miss_rate": 0.03},
    )
    out = res.predictions.to_pandas()
    return out.sort_values(["src", "pred"]).reset_index(drop=True)


def _kg_string_relation(sf_dir: str):
    import ray

    base = _kg_fixture_dir(sf_dir)
    adjacency = _kg_adjacency(base)
    pos_pairs = set()
    for r in adjacency.take_all():
        for n in r["neighbors"]:
            a, b = sorted((r["src"], n))
            pos_pairs.add(f"{a}\x1f{b}")
    from bioie_llm_ray.pipelines import tasks
    from bioie_llm_ray.sources import readers

    negatome = readers.read_negatome(os.path.join(base, "STRING/negatome.csv"))
    res = tasks.string_relation_task(
        _kg_adjacency(base),
        negatome,
        n_pairs_per_side=50,
        scorer_kwargs={"kind": "relation", "kb": ray.put(pos_pairs), "flip_rate": 0.03},
    )
    out = res.predictions.to_pandas()
    out["src"] = out["src"].str.replace("\x1f", "|")
    return out.sort_values("src").reset_index(drop=True)


def _indra_task_result(sf_dir: str):
    import ray

    base = _kg_fixture_dir(sf_dir)
    from bioie_llm_ray import fixtures
    from bioie_llm_ray.pipelines import tasks
    from bioie_llm_ray.sources import readers

    kb = fixtures.make_kb()
    label_map = {
        s["id"]: s["rel_type"] for split in kb.indra.values() for s in split
    }
    stmts = readers.read_indra_statements(os.path.join(base, "INDRA/test.json"))
    return tasks.indra_relation_type_task(
        stmts,
        per_class=8,
        scorer_kwargs={
            "kind": "relation_type",
            "kb": ray.put(label_map),
            "flip_rate": 0.03,
        },
    )


def _kg_indra(sf_dir: str):
    out = _indra_task_result(sf_dir).triples.to_pandas()
    return out.sort_values(["subj", "pred", "obj", "src_sha"]).reset_index(
        drop=True
    )


def _kg_predicate_stats(sf_dir: str):
    from bioie_llm_ray.pipelines.kg import predicate_profile

    return predicate_profile(_indra_task_result(sf_dir).triples)


def _kg_kegg_entity(sf_dir: str):
    import pyarrow as pa
    import ray

    base = _kg_fixture_dir(sf_dir)
    from bioie_llm_ray.pipelines import tasks
    from bioie_llm_ray.sources import readers

    pg = readers.read_kegg_pathway_genes(
        os.path.join(base, "KEGG/kegg.hsa.pathway.genes")
    )
    genes = readers.read_kegg_genes(os.path.join(base, "KEGG/kegg.hsa.genes"))
    paths = readers.read_kegg_pathways(os.path.join(base, "KEGG/kegg.pathway.hsa"))
    gmap = {r["gene_id"]: list(r["aliases"]) for r in genes.take_all()}
    pmap = {r["pathway_id"]: r["pathway_name"] for r in paths.take_all()}
    pathway_genes = readers.build_pathway_gene_table(pg, gmap, pmap)
    ranking = readers.read_dose_ranking(
        os.path.join(base, "KEGG/low_dose_pathways.txt")
    ).map_batches(
        lambda b: pa.table(
            {
                "pathway": pa.array(
                    [pmap[p] for p in b["pathway_id"].to_pylist()]
                ),
                "rank": b["rank"],
            }
        ),
        batch_format="pyarrow",
    )
    gold_map = {
        pmap[pid]: sorted({gmap[g][0] for g in gids})
        for pid, gids in __import__("bioie_llm_ray.fixtures", fromlist=["make_kb"]).make_kb().pathway_genes.items()
    }
    res = tasks.kegg_entity_task(
        pathway_genes,
        ranking,
        top_n=8,
        scorer_kwargs={"kind": "entity", "kb": ray.put(gold_map), "miss_rate": 0.03},
    )
    out = res.predictions.to_pandas()
    return out.sort_values(["src", "pred"]).reset_index(drop=True)


def _kg_entity_extraction(sf_dir: str):
    """kbase entity_and_entity_type open extraction (run_model.py:737-762)."""
    import ray

    from bioie_llm_ray.oracle import (
        EET_CHOICES,
        entity_and_entity_type_inputs,
    )
    from bioie_llm_ray.pipelines import tasks

    rows = entity_and_entity_type_inputs()
    kb = {r["doc_id"]: r["answer"] for r in rows}
    out = tasks.entity_and_entity_type_task(
        ray.data.from_items(rows),
        choices=EET_CHOICES,
        scorer_kwargs={
            "kind": "entity_and_entity_type",
            "kb": kb,
            "miss_rate": 0.05,
            "key_col": "entity",
        },
    ).to_pandas()
    return out.sort_values(["src", "pred_entity"]).reset_index(drop=True)


def _kg_chain_agreement(sf_dir: str):
    """§3.2 two-stage extract-then-verify joint agreement over fixtures."""
    import pandas as pd
    import ray

    base = _kg_fixture_dir(sf_dir)
    adjacency = _kg_adjacency(base)
    gold = {r["src"]: sorted(r["neighbors"]) for r in adjacency.take_all()}
    from bioie_llm_ray.pipelines import tasks
    from bioie_llm_ray.pipelines.evaluate import (
        chain_entity_to_relation,
        stage_agreement,
    )
    from bioie_llm_ray.stages.scorer import MockScorer

    ent = tasks.string_entity_task(
        _kg_adjacency(base),
        test_size=20,
        n_shots=1,
        scorer_kwargs={"kind": "entity", "kb": ray.put(gold), "miss_rate": 0.1},
    )
    pos_pairs = {
        f"{min(a, b)}\x1f{max(a, b)}" for a, ns in gold.items() for b in ns
    }
    rel = chain_entity_to_relation(
        ent.predictions,
        MockScorer,
        {"kind": "relation", "kb": ray.put(pos_pairs), "flip_rate": 0.02},
    )
    agg = stage_agreement(ent.predictions, rel)
    # flatten the nested confusion counts: one scalar column per cell
    flat = {k: v for k, v in agg.items() if not isinstance(v, dict)}
    flat.update(
        {f"confusion_{k}": v for k, v in agg["confusion_yes_no"].items()}
    )
    return pd.DataFrame([flat])


def _kg_kegg_relation(sf_dir: str):
    """Composed KEGG relation task with generated negatives (latent J4,
    kegg_processor.py:140-157)."""
    import ray

    base = _kg_fixture_dir(sf_dir)
    from bioie_llm_ray.pipelines import tasks
    from bioie_llm_ray.sources import readers

    membership = readers.read_kegg_pathway_genes(
        os.path.join(base, "KEGG/kegg.hsa.pathway.genes")
    )
    genes = readers.read_kegg_genes(os.path.join(base, "KEGG/kegg.hsa.genes"))
    paths = readers.read_kegg_pathways(os.path.join(base, "KEGG/kegg.pathway.hsa"))
    gmap = {r["gene_id"]: list(r["aliases"]) for r in genes.take_all()}
    pmap = {r["pathway_id"]: r["pathway_name"] for r in paths.take_all()}
    pos_key_set = {
        f"{g}\x1f{pmap[r['pathway_id']]}"
        for r in membership.take_all()
        for g in gmap[r["gene_id"]]
    }
    res = tasks.kegg_relation_task(
        readers.read_kegg_pathway_genes(
            os.path.join(base, "KEGG/kegg.hsa.pathway.genes")
        ),
        gmap,
        pmap,
        n_pairs_per_side=50,
        scorer_kwargs={
            "kind": "relation",
            "kb": ray.put(pos_key_set),
            "flip_rate": 0.03,
        },
    )
    out = res.predictions.to_pandas()
    out["src"] = out["src"].str.replace("\x1f", "|")
    return out.sort_values("src").reset_index(drop=True)


def _kg_entity_types(sf_dir: str):
    """kbase entity_type task (run_model.py:549) over fixture proteins."""
    from bioie_llm_ray.oracle import ENTITY_TYPE_CHOICES, entity_type_inputs
    from bioie_llm_ray.pipelines import tasks

    import ray

    rows = entity_type_inputs()
    kb_types = {r["entity"]: r["answer"] for r in rows}
    res = tasks.entity_type_task(
        ray.data.from_items(rows),
        choices=ENTITY_TYPE_CHOICES,
        scorer_kwargs={
            "kind": "containment",
            "kb": kb_types,
            "flip_rate": 0.02,
            "choices": ENTITY_TYPE_CHOICES,
        },
    )
    out = res.predictions.to_pandas()
    return out.sort_values("src").reset_index(drop=True)


def _multimodal_features(sf_dir: str):
    """Binary-payload plumbing: documents → fake payloads → decoded features."""
    import pyarrow as pa
    import ray.data

    from bioie_llm_ray.stages.multimodal import decode_features

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": pa.compute.cast(batch["doc_id"], pa.string()),
                "media_type": pa.array(
                    ["application/octet-stream"] * len(batch), type=pa.string()
                ),
                "payload": pa.array(
                    [t.encode("utf-8") for t in batch["text"].to_pylist()],
                    type=pa.binary(),
                ),
            }
        )

    media = docs.map_batches(to_media, batch_format="pyarrow")
    feats = decode_features(media, feature_dim=8, fake=True)

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        f = np.stack(batch["feature"].to_numpy(zero_copy_only=False))
        # float64 mean of exactly-representable b/256 values: bit-equal to
        # the SQL oracle's sum(byte)/(256*dim), no rounding needed
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feat_mean": pa.array(f.astype(np.float64).mean(axis=1)),
            }
        )

    out = feats.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def _code_fixture_path() -> str:
    """sf-independent deterministic code-repo table (input_hint shape),
    cached under /tmp; both queries() and oracle_sql() call this, so the
    parquet exists whichever side the driver runs first."""
    import pyarrow.parquet as pq

    from bioie_llm_ray import __version__, fixtures

    base = os.path.join("/tmp", f"bioie_ray_code_v{__version__}")
    path = os.path.join(base, "code_repo.parquet")
    if not os.path.exists(path):
        os.makedirs(base, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(fixtures.make_code_repo_table(), tmp)
        os.replace(tmp, path)
    return path


def _code_latest_snapshot(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.latest_snapshot_query(_code_fixture_path())


def _code_import_graph(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.import_edges_query(_code_fixture_path())


def _code_vendored_files(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.vendored_files_query(_code_fixture_path())


def _code_commit_diff(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.commit_diff_query(_code_fixture_path())


def _code_file_history(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.file_history_query(_code_fixture_path())


def _code_clone_pairs(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.clone_pairs_query(_code_fixture_path())


def _code_repo_stats(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.repo_stats_query(_code_fixture_path())


def _code_secret_scan(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.secret_scan_query(_code_fixture_path())


def _code_lang_loc(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.lang_loc_query(_code_fixture_path())


def _code_quality_metrics(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.quality_metrics_query(_code_fixture_path())


def _code_import_history(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.import_history_query(_code_fixture_path())


def _code_deps_asof(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.deps_asof_query(_code_fixture_path())


def _kg_incremental_triples(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.incremental_triples_query(_code_fixture_path())


def _code_license_scan(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.license_scan_query(_code_fixture_path())


def _kg_reachability(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.fn_reachability_query(_code_fixture_path())


def _kg_metapath_counts(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.metapath_counts_query(_code_fixture_path())


def _code_call_triples(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.call_triples_query(_code_fixture_path())


def _code_fork_pairs(sf_dir: str):
    from bioie_llm_ray.pipelines import code as C

    return C.fork_pairs_query(_code_fixture_path())


def _kg_code_triples(sf_dir: str):
    from bioie_llm_ray import fixtures
    from bioie_llm_ray.pipelines import code as C

    base = _kg_fixture_dir(sf_dir)
    kb = fixtures.make_kb()
    return C.code_triples_query(
        os.path.join(base, "docs", "docs.parquet"), vocab=kb.proteins
    )


def _bpe_docs(sf_dir: str):
    import ray

    base = _kg_fixture_dir(sf_dir)
    return ray.data.read_parquet(
        os.path.join(base, "docs", "docs.parquet"), columns=["content"]
    )


def _bpe_merges(sf_dir: str):
    """Distributed BPE training over the fixture corpus (20 merges)."""
    from bioie_llm_ray.stages import tokenizer as T

    return T.train_bpe(_bpe_docs(sf_dir), "content", n_merges=20)


def _bpe_token_counts(sf_dir: str):
    """Train, then tokenize the corpus with the learned table: top-50."""
    from bioie_llm_ray.stages import tokenizer as T

    docs = _bpe_docs(sf_dir)
    merges = T.train_bpe(docs, "content", n_merges=20)
    out = T.bpe_token_counts(docs, "content", merges).to_pandas()
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "token"], ascending=[False, True], kind="stable")
    return out.head(50).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from bioie_llm_ray.pipelines import analytics as A

    return {
        # relational core
        "q1_pricing_summary": A.q1_pricing_summary,
        "q3_order_revenue": A.q3_order_revenue,
        "q3_colocated": A.q3_colocated,
        "q3_bloom": A.q3_bloom,
        "q5_nation_revenue": A.q5_nation_revenue,
        "q8_market_share": A.q8_market_share,
        "part_profit_by_nation": A.part_profit_by_nation,
        "part_value_concentration": A.part_value_concentration,
        "supplier_part_variety": A.supplier_part_variety,
        "excess_quantity_suppliers": A.excess_quantity_suppliers,
        "top_brand_revenue": A.top_brand_revenue,
        "supplier_balance_by_nation": A.supplier_balance_by_nation,
        # events / stream-shaped
        "events_by_type": A.events_by_type,
        "user_hourly_activity": A.user_hourly_activity,
        "user_sessions": A.user_sessions,
        "user_session_spans": A.user_session_spans,
        "user_sessions_incremental": A.user_sessions_incremental,
        "purchase_in_session": A.purchase_in_session,
        "top_events_per_user": A.top_events_per_user,
        "user_sliding_window": A.user_sliding_window,
        "user_event_gaps": A.user_event_gaps,
        "user_first_last_event": A.user_first_last_event,
        "lang_token_set_ops": A.lang_token_set_ops,
        "lang_token_association": A.lang_token_association,
        "label_centroids": A.label_centroids,
        "embedding_cohesion": A.embedding_cohesion,
        "events_global_rank": A.events_global_rank,
        "user_moving_avg": A.user_moving_avg,
        "user_range_window": A.user_range_window,
        "events_score_auc": A.events_score_auc,
        "sample_join_weighted": A.sample_join_weighted,
        "events_late_arrivals": A.events_late_arrivals,
        "error_click_correlation": A.error_click_correlation,
        "events_drift_psi": A.events_drift_psi,
        "events_value_ks": A.events_value_ks,
        "events_type_dow_chi2": A.events_type_dow_chi2,
        "events_key_skew": A.events_key_skew,
        "price_weighted_median": A.price_weighted_median,
        "user_value_resampled": A.user_value_resampled,
        "part_copurchase": A.part_copurchase,
        "supplier_name_neardup": A.supplier_name_neardup,
        "price_quantiles_cont": A.price_quantiles_cont,
        "lineitem_checksum": A.lineitem_checksum,
        "user_final_state": A.user_final_state,
        "user_event_paths": A.user_event_paths,
        "cohort_retention": A.cohort_retention,
        "word_countmin": A.word_countmin,
        "peak_concurrency": A.peak_concurrency,
        "lineitem_constraints": A.lineitem_constraints,
        "embedding_norms": A.embedding_norms,
        "doc_inverted_index": A.doc_inverted_index,
        "user_value_rank": A.user_value_rank,
        "value_outliers": A.value_outliers,
        "lineitem_regression": A.lineitem_regression,
        "hll_user_overlap": A.hll_user_overlap,
        "source_heavy_words": A.source_heavy_words,
        "top_similar_docs": A.top_similar_docs,
        "value_winsorized": A.value_winsorized,
        "forecast_revenue": A.forecast_revenue,
        "value_quantiles_cont_by_type": A.value_quantiles_cont_by_type,
        "supplier_name_clusters": A.supplier_name_clusters,
        "doc_containment": A.doc_containment,
        "embedding_covariance": A.embedding_covariance,
        "nation_revenue_share": A.nation_revenue_share,
        "customer_pareto": A.customer_pareto,
        "daily_top_users": A.daily_top_users,
        "top_supplier_revenue": A.top_supplier_revenue,
        "event_type_transitions": A.event_type_transitions,
        "event_type_stationary": A.event_type_stationary,
        "rolling_active_users": A.rolling_active_users,
        "events_incremental_hourly": A.events_incremental_hourly,
        "event_props_stats": A.event_props_stats,
        "signup_purchase_users": A.signup_purchase_users,
        "purchase_since_signup": A.purchase_since_signup,
        "cdc_user_state": A.cdc_user_state,
        # documents: text analysis + dedup + fingerprints
        "doc_stats_by_lang": A.doc_stats_by_lang,
        "doc_token_counts": A.doc_token_counts,
        "doc_pack_blocks": A.doc_pack_blocks,
        "doc_dedup_exact": A.doc_dedup_exact,
        "doc_fingerprint": A.doc_fingerprint,
        "word_frequency": A.word_frequency,
        "doc_repeated_ngrams": A.doc_repeated_ngrams,
        "doc_tfidf": A.doc_tfidf,
        "doc_bm25": A.doc_bm25,
        "word_zipf_fit": A.word_zipf_fit,
        "word_pmi_bigrams": A.word_pmi_bigrams,
        "word_cooccur_window": A.word_cooccur_window,
        "token_vocab": A.token_vocab,
        "doc_quality": A.doc_quality,
        "q6_discount_revenue": A.q6_discount_revenue,
        "distinct_counts": A.distinct_counts,
        "lineitem_profile": A.lineitem_profile,
        "price_quantiles_hist": A.price_quantiles_hist,
        "word_heavy_hitters": A.word_heavy_hitters,
        "doc_chunks": A.doc_chunks,
        "rag_retrieval": A.rag_retrieval,
        "rag_retrieval_eval": A.rag_retrieval_eval,
        "rag_rerank": A.rag_rerank,
        "rag_mmr": A.rag_mmr,
        "doc_decontaminate": A.doc_decontaminate,
        "doc_pii_scrub": A.doc_pii_scrub,
        "doc_repetition": A.doc_repetition,
        "doc_classifier_score": A.doc_classifier_score,
        "customer_order_distribution": A.customer_order_distribution,
        "lineitem_skyline": A.lineitem_skyline,
        "cheapest_supplier_per_part": A.cheapest_supplier_per_part,
        "purchase_attribution": A.purchase_attribution,
        "hard_negatives": A.hard_negatives,
        "price_decile_stats": A.price_decile_stats,
        "kg_sssp_weighted": A.kg_sssp_weighted,
        "value_anova_by_type": A.value_anova_by_type,
        "corpus_report": A.corpus_report,
        "events_dedup_window": A.events_dedup_window,
        "clf_calibration": A.clf_calibration,
        "events_k_anonymity": A.events_k_anonymity,
        "rag_retrieval_per_doc": A.rag_retrieval_per_doc,
        "signup_survival_km": A.signup_survival_km,
        "revenue_forecast_ses": A.revenue_forecast_ses,
        "holt_forecast": A.holt_forecast,
        "daily_trend_theilsen": A.daily_trend_theilsen,
        "dow_seasonality": A.dow_seasonality,
        "lang_source_infogain": A.lang_source_infogain,
        "doc_span_corruption": A.doc_span_corruption,
        "knn_ivf_store": A.knn_ivf_store,
        "part_triple_copurchase": A.part_triple_copurchase,
        "late_shipment_orders": A.late_shipment_orders,
        "doc_lang_confusion": A.doc_lang_confusion,
        "user_event_entropy": A.user_event_entropy,
        "events_max_gap": A.events_max_gap,
        "brand_supplier_counts": A.brand_supplier_counts,
        "events_decayed_counts": A.events_decayed_counts,
        "customer_rfm_segments": A.customer_rfm_segments,
        "events_changepoint": A.events_changepoint,
        "price_benford": A.price_benford,
        "revenue_gini": A.revenue_gini,
        "nb_lang_classifier": A.nb_lang_classifier,
        "lang_balance_sample": A.lang_balance_sample,
        "source_mixture_sample": A.source_mixture_sample,
        "curate_corpus": A.curate_corpus,
        "quantity_quantiles": A.quantity_quantiles,
        "distinct_users_hll": A.distinct_users_hll,
        "distinct_users_hll_by_type": A.distinct_users_hll_by_type,
        "doc_language_id": A.doc_language_id,
        "doc_unigram_lm": A.doc_unigram_lm,
        "ccnet_buckets": A.ccnet_buckets,
        "dsir_select": A.dsir_select,
        "doc_bigram_perplexity": A.doc_bigram_perplexity,
        "customer_order_counts": A.customer_order_counts,
        "orders_with_returns": A.orders_with_returns,
        "lineitem_rollup": A.lineitem_rollup,
        "lineitem_cube": A.lineitem_cube,
        "monthly_revenue_growth": A.monthly_revenue_growth,
        "event_funnel": A.event_funnel,
        "user_event_pivot": A.user_event_pivot,
        "quantity_quantiles_by_flag": A.quantity_quantiles_by_flag,
        "user_event_unpivot": A.user_event_unpivot,
        "embedding_clusters": A.embedding_clusters,
        "embedding_pq_codes": A.embedding_pq_codes,
        "knn_pq": A.knn_pq,
        "semantic_dedup": A.semantic_dedup,
        "small_quantity_revenue": A.small_quantity_revenue,
        "customers_without_orders": A.customers_without_orders,
        "cross_nation_trade": A.cross_nation_trade,
        "top_return_customers": A.top_return_customers,
        "urgent_by_linestatus": A.urgent_by_linestatus,
        "promo_revenue_ratio": A.promo_revenue_ratio,
        "large_orders": A.large_orders,
        "disjunctive_revenue": A.disjunctive_revenue,
        "rich_idle_customers": A.rich_idle_customers,
        "sole_return_suppliers": A.sole_return_suppliers,
        "user_cumulative_value": A.user_cumulative_value,
        "doc_dup_ngram_spans": A.doc_dup_ngram_spans,
        "doc_cross_dup_spans": A.doc_cross_dup_spans,
        "doc_cut_dup_spans": A.doc_cut_dup_spans,
        "source_ngram_overlap": A.source_ngram_overlap,
        "doc_split_assign": A.doc_split_assign,
        "er_blocking_pairs": A.er_blocking_pairs,
        "er_entity_clusters": A.er_entity_clusters,
        "er_golden_records": A.er_golden_records,
        "events_range_pruned": A.events_range_pruned,
        "events_box_pruned": A.events_box_pruned,
        # KG construction over documents
        "doc_mentions": A.doc_mentions,
        "cooccur_edges": A.cooccur_edges,
        "kg_graph_nodes": A.kg_graph_nodes,
        "kg_pagerank": A.kg_pagerank,
        "kg_hits": A.kg_hits,
        "kg_random_walks": A.kg_random_walks,
        "kg_spanning_forest": A.kg_spanning_forest,
        "kg_scc": A.kg_scc,
        "kg_assortativity": A.kg_assortativity,
        "kg_condensation_levels": A.kg_condensation_levels,
        "kg_wl_colors": A.kg_wl_colors,
        "part_price_band_pairs": A.part_price_band_pairs,
        "kg_bowtie_regions": A.kg_bowtie_regions,
        "kg_ktruss": A.kg_ktruss,
        "kg_modularity": A.kg_modularity,
        "user_event_trigrams": A.user_event_trigrams,
        "kg_landmark_distances": A.kg_landmark_distances,
        "kg_personalized_pagerank": A.kg_personalized_pagerank,
        "kg_two_hop_paths": A.kg_two_hop_paths,
        "kg_triangles": A.kg_triangles,
        "kg_clustering_coeff": A.kg_clustering_coeff,
        "kg_bfs_levels": A.kg_bfs_levels,
        "triples_canonical": A.triples_canonical,
        "kg_negative_samples": A.kg_negative_samples,
        "kg_communities": A.kg_communities,
        "kg_kcore": A.kg_kcore,
        "kg_link_prediction": A.kg_link_prediction,
        "kg_graph_stats": A.kg_graph_stats,
        # similarity / near-dup
        "knn_bruteforce": A.knn_bruteforce,
        "knn_self_join": A.knn_self_join_exact,
        "embedding_label_prop": A.embedding_label_prop,
        "knn_join_split": A.knn_join_split,
        "knn_ivf": A.knn_ivf,
        "knn_ivf_probed": A.knn_ivf_probed,
        "knn_lsh": A.knn_lsh,
        "knn_lsh_store": A.knn_lsh_store,
        "knn_ivf_exact": A.knn_ivf_exact,
        "dedup_minhash": A.dedup_minhash,
        "doc_near_dedup": A.doc_near_dedup,
        "pca_project_2d": A.pca_project_2d,
        "click_purchase_attribution": A.click_purchase_attribution,
        "dedup_jaccard": A.dedup_jaccard,
        "dedup_components": A.dedup_components,
        "dedup_keep_best": A.dedup_keep_best,
        "dedup_simhash": A.dedup_simhash,
        "embedding_neardup": A.embedding_neardup,
        # reference benchmark tasks (MockScorer over synthetic KB fixtures)
        "kg_string_entity": _kg_string_entity,
        "kg_string_relation": _kg_string_relation,
        "kg_kegg_entity": _kg_kegg_entity,
        "kg_kegg_relation": _kg_kegg_relation,
        "kg_indra_triples": _kg_indra,
        "kg_predicate_stats": _kg_predicate_stats,
        "kg_mention_contexts": A.kg_mention_contexts,
        "kg_entity_types": _kg_entity_types,
        "kg_entity_extraction": _kg_entity_extraction,
        "kg_chain_agreement": _kg_chain_agreement,
        "bpe_merges": _bpe_merges,
        "bpe_token_counts": _bpe_token_counts,
        # multimodal plumbing
        "multimodal_features": _multimodal_features,
        # source-code repository table (north-rule input_hint shape)
        "code_latest_snapshot": _code_latest_snapshot,
        "code_commit_diff": _code_commit_diff,
        "code_file_history": _code_file_history,
        "code_clone_pairs": _code_clone_pairs,
        "code_repo_stats": _code_repo_stats,
        "code_secret_scan": _code_secret_scan,
        "code_lang_loc": _code_lang_loc,
        "code_quality_metrics": _code_quality_metrics,
        "code_import_history": _code_import_history,
        "code_deps_asof": _code_deps_asof,
        "code_import_graph": _code_import_graph,
        "code_vendored_files": _code_vendored_files,
        "code_license_scan": _code_license_scan,
        "code_call_triples": _code_call_triples,
        "kg_reachability": _kg_reachability,
        "kg_metapath_counts": _kg_metapath_counts,
        "code_fork_pairs": _code_fork_pairs,
        "kg_code_triples": _kg_code_triples,
        "kg_incremental_triples": _kg_incremental_triples,
        # round-3 late additions
        "kg_reciprocity": A.kg_reciprocity,
        "part_fd_violations": A.part_fd_violations,
        "events_autocorrelation": A.events_autocorrelation,
        "embedding_pca_power": A.embedding_pca_power,
        "gopher_quality_rules": A.gopher_quality_rules,
        "events_mannwhitney": A.events_mannwhitney,
        "doc_fusion_rrf": A.doc_fusion_rrf,
        "kg_mis": A.kg_mis,
        "orders_consistent_sample": A.orders_consistent_sample,
        "referential_integrity": A.referential_integrity,
        "events_l_diversity": A.events_l_diversity,
        "events_score_pr_auc": A.events_score_pr_auc,
        "kg_maximal_matching": A.kg_maximal_matching,
        "value_mad_outliers": A.value_mad_outliers,
        "value_mean_blb": A.value_mean_blb,
        "user_time_weighted_value": A.user_time_weighted_value,
        "kg_rich_club": A.kg_rich_club,
        "events_burstiness": A.events_burstiness,
        "join_size_countmin": A.join_size_countmin,
        "kg_square_count": A.kg_square_count,
        "kg_harmonic_centrality": A.kg_harmonic_centrality,
    }


def _g2_sql(lang: str = "en", top_n: int = 25, min_count: int = 50) -> str:
    """Dunning G² keyness oracle — the IDENTICAL xlogx expressions the Ray
    side evaluates (term order preserved so float arithmetic agrees)."""

    def xlogx(e: str) -> str:
        return f"(CASE WHEN ({e}) > 0 THEN ({e}) * ln({e}) ELSE 0 END)"

    g2 = (
        f"2.0 * ({xlogx('a')} + {xlogx('b')} + {xlogx('c')} + {xlogx('d')}"
        f" - {xlogx('a + b')} - {xlogx('c + d')}"
        f" - {xlogx('a + c')} - {xlogx('b + d')} + n * ln(n))"
    )
    return rf"""
        WITH toks AS (
            SELECT CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END AS il,
                   t.w AS token
            FROM documents,
                 unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS t(w)
            WHERE t.w <> ''),
        ct AS (
            SELECT token, sum(il)::BIGINT AS k_in,
                   sum(1 - il)::BIGINT AS k_out
            FROM toks GROUP BY 1),
        tot AS (SELECT sum(k_in)::BIGINT AS n_in,
                       sum(k_out)::BIGINT AS n_out FROM ct),
        f AS (
            SELECT token, k_in, k_out,
                   k_in::DOUBLE AS a, k_out::DOUBLE AS b,
                   (n_in - k_in)::DOUBLE AS c, (n_out - k_out)::DOUBLE AS d,
                   (n_in + n_out)::DOUBLE AS n, n_in::DOUBLE AS n_in_f
            FROM ct, tot
            WHERE k_in + k_out >= {min_count})
        SELECT token, k_in, k_out,
               round_even(CASE WHEN a >= (a + b) * (n_in_f / n)
                               THEN {g2} ELSE -({g2}) END, 6) AS g2
        FROM f
        ORDER BY g2 DESC, token
        LIMIT {top_n}
    """


def oracle_sql() -> dict[str, str]:
    # The kg_* MockScorer tasks are deterministic end-to-end, so their
    # expected tables are computed serially (plain Python over the fixture
    # KB, bioie_llm_ray/oracle.py — no Ray) and registered as DuckDB VALUES
    # relations: full row/schema/value-hash verification of the distributed
    # sampling + scoring + alignment plumbing.
    from bioie_llm_ray import oracle as O

    kg_oracles = {
        "kg_string_entity": O.values_sql(O.expected_kg_string_entity()),
        "kg_string_relation": O.values_sql(O.expected_kg_string_relation()),
        "kg_kegg_entity": O.values_sql(O.expected_kg_kegg_entity()),
        "kg_kegg_relation": O.values_sql(O.expected_kg_kegg_relation()),
        "kg_indra_triples": O.values_sql(O.expected_kg_indra_triples()),
        # schema induction: per-predicate cardinality profile over the
        # same serially-rebuilt triple relation
        "kg_predicate_stats": (
            "SELECT pred, count(*)::BIGINT AS n_triples,"
            " count(DISTINCT subj)::BIGINT AS n_subj,"
            " count(DISTINCT obj)::BIGINT AS n_obj,"
            " round_even(count(*) / count(DISTINCT subj)::DOUBLE"
            "     * 1000000.0, 0) / 1000000.0 AS fanout_subj,"
            " round_even(count(*) / count(DISTINCT obj)::DOUBLE"
            "     * 1000000.0, 0) / 1000000.0 AS fanout_obj"
            " FROM (" + O.values_sql(O.expected_kg_indra_triples()) + ") t"
            " GROUP BY pred ORDER BY pred"
        ),
        "kg_entity_types": O.values_sql(O.expected_kg_entity_types()),
        "kg_entity_extraction": O.values_sql(O.expected_kg_entity_extraction()),
        "kg_chain_agreement": O.values_sql(O.expected_kg_chain_agreement()),
        # distributed BPE training vs the textbook serial Sennrich loop
        "bpe_merges": O.values_sql(O.expected_bpe_merges()),
        "bpe_token_counts": O.values_sql(O.expected_bpe_token_counts()),
        "doc_language_id": O.language_id_sql(),
        # heuristic-detector evaluation: (true, detected) confusion counts
        "doc_lang_confusion": O.lang_confusion_sql(),
        # independent SQL reimplementations of the md5-derived kernels
        # (splitmix64 decomposed into 32-bit HUGEINT mulmods) — see
        # oracle.simhash_sql / oracle.minhash_sql / oracle.hll_distinct_sql
        "dedup_simhash": O.simhash_sql(),
        "dedup_minhash": O.minhash_sql(),
        "doc_near_dedup": O.near_dedup_sql(),
        "pca_project_2d": O.pca2d_sql(),
        # salted-join output is hot-set-invariant (pair-meet-once is
        # structural), so the oracle is the plain SQL join + rollup
        "click_purchase_attribution": """
            SELECT c.user_id, count(*)::BIGINT AS n_pairs,
                   round_even(sum(p.value) * 100.0, 0) / 100.0
                       AS purchase_value_sum
            FROM (SELECT user_id FROM events
                  WHERE event_type = 'click') c
            JOIN (SELECT user_id, value FROM events
                  WHERE event_type = 'purchase') p USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        "embedding_clusters": O.kmeans_sql(),
        "embedding_pq_codes": O.pq_sql(),
        "knn_pq": O.pq_adc_sql(),
        "semantic_dedup": O.semantic_dedup_sql(),
        "distinct_users_hll": O.hll_distinct_sql(),
        # hashed-linear-model inference rebuilt on the same integer kernels
        "doc_classifier_score": O.classifier_score_sql(),
        # composed dataset card: every metric independently recomputed
        "corpus_report": O.corpus_report_sql(),
        # classifier reliability bins vs exact-dup labels (integer-exact
        # binning; explicit floor division — DuckDB // truncates)
        "clf_calibration": O.clf_calibration_sql(),
        # T5-style span corruption: hash coin + run structure + both
        # rendered strings rebuilt in SQL
        "doc_span_corruption": O.span_corruption_sql(),
        # TPC-H q13: distribution of customers by order count
        "customer_order_distribution": """
            SELECT n_orders, count(*)::BIGINT AS n_customers
            FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders
                  FROM customer LEFT OUTER JOIN orders
                       ON c_custkey = o_custkey
                  GROUP BY c_custkey)
            GROUP BY n_orders
            ORDER BY n_customers DESC, n_orders DESC
        """,
        # exponential smoothing (α=1/2): exact float halving, recursive CTE
        "revenue_forecast_ses": """
            WITH RECURSIVE rev AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       sum(round_even(o_totalprice * 100, 0)::BIGINT)
                           AS cents
                FROM orders GROUP BY 1),
            ord AS (
                SELECT day, cents / 100.0 AS revenue,
                       row_number() OVER (ORDER BY day) AS rn
                FROM rev),
            ses(rn, s) AS (
                SELECT 1, (SELECT revenue FROM ord WHERE rn = 1)
                UNION ALL
                SELECT ses.rn + 1, (o.revenue + ses.s) / 2
                FROM ses JOIN ord o ON o.rn = ses.rn + 1)
            -- np.round(x, 6) = rint(x * 1e6) / 1e6: replicate the scaled
            -- form (plain round_even(x, 6) disagrees by 1 ulp when the
            -- scaled double lands off the half boundary)
            SELECT o.day, o.revenue,
                   round_even(ses.s * 1000000.0, 0) / 1000000.0 AS smoothed
            FROM ord o JOIN ses ON ses.rn = o.rn
            ORDER BY o.day
        """,
        # Holt's linear smoothing (α=β=1/2): exact float halvings in the
        # same association order as the numpy recurrence
        "holt_forecast": """
            WITH RECURSIVE rev AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       sum(round_even(o_totalprice * 100, 0)::BIGINT)
                           AS cents
                FROM orders GROUP BY 1),
            ord AS (
                SELECT day, cents / 100.0 AS revenue,
                       row_number() OVER (ORDER BY day) AS rn
                FROM rev),
            init AS (
                SELECT (SELECT revenue FROM ord WHERE rn = 1) AS x0,
                       (SELECT revenue FROM ord WHERE rn = 2) AS x1),
            holt(rn, l, b, f) AS (
                SELECT 1, x0, x1 - x0, x0 FROM init
                UNION ALL
                SELECT h.rn + 1,
                       (o.revenue + (h.l + h.b)) / 2,
                       ((((o.revenue + (h.l + h.b)) / 2) - h.l) + h.b) / 2,
                       h.l + h.b
                FROM holt h JOIN ord o ON o.rn = h.rn + 1)
            -- round via scale → ties-to-even rint → divide, mirroring
            -- np.round bit-for-bit (plain round_even(x, 6) computes the
            -- true decimal digit and can disagree with np.round by one
            -- ulp when the scaled double lands off the half boundary)
            SELECT o.day, o.revenue,
                   round_even(h.l * 1000000.0, 0) / 1000000.0 AS level,
                   round_even(h.b * 1000000.0, 0) / 1000000.0 AS trend,
                   round_even(h.f * 1000000.0, 0) / 1000000.0 AS forecast
            FROM ord o JOIN holt h ON h.rn = o.rn
            WHERE (SELECT count(*) FROM ord) >= 2
            ORDER BY o.day
        """,
        # day-of-week seasonal indices over calendar-bounded daily sums
        # (cents-exact doubles: every sum/mean is bit-identical)
        "dow_seasonality": """
            WITH daily AS (
                SELECT o_orderdate AS d, sum(o_totalprice) AS rev
                FROM orders GROUP BY 1),
            g AS (SELECT avg(rev) AS grand FROM daily)
            SELECT isodow(d)::BIGINT AS dow,
                   count(*)::BIGINT AS n_days,
                   round_even(avg(rev) * 100.0, 0) / 100.0 AS avg_revenue,
                   round_even(avg(rev) / g.grand * 1000000.0, 0)
                       / 1000000.0 AS seasonal_index
            FROM daily, g GROUP BY dow, g.grand
        """,
        # information gain of source about lang (natural-log entropies)
        "lang_source_infogain": """
            WITH c AS (
                SELECT source, lang, count(*)::DOUBLE AS n
                FROM documents GROUP BY 1, 2),
            tot AS (SELECT sum(n) AS n FROM c),
            pl AS (SELECT lang, sum(n) AS nl FROM c GROUP BY 1),
            hl AS (
                SELECT -sum((nl / tot.n) * ln(nl / tot.n)) AS h
                FROM pl, tot),
            ps AS (SELECT source, sum(n) AS ns FROM c GROUP BY 1),
            hw AS (
                SELECT c.source,
                       -sum((c.n / ps.ns) * ln(c.n / ps.ns)) AS h
                FROM c JOIN ps USING (source) GROUP BY 1),
            hc AS (
                SELECT sum((ps.ns / tot.n) * hw.h) AS h
                FROM hw JOIN ps USING (source), tot)
            SELECT round_even(hl.h, 6) AS h_lang,
                   round_even(hc.h, 6) AS h_lang_given_source,
                   round_even(hl.h - hc.h, 6) AS info_gain,
                   round_even((hl.h - hc.h) / hl.h, 6) AS ig_ratio
            FROM hl, hc
        """,
        # Theil-Sen: median pairwise slope + median intercept, the
        # interpolating quantile_cont matching the numpy read-off
        "daily_trend_theilsen": """
            WITH rev AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       sum(round_even(o_totalprice * 100, 0)::BIGINT)
                           AS cents
                FROM orders GROUP BY 1),
            pts AS (
                SELECT (day::DATE - DATE '1970-01-01') AS x,
                       cents::DOUBLE AS y
                FROM rev),
            sl AS (
                SELECT quantile_cont((b.y - a.y) / (b.x - a.x)::DOUBLE, 0.5)
                           AS slope
                FROM pts a JOIN pts b ON b.x > a.x),
            ic AS (
                SELECT quantile_cont(p.y - s.slope * p.x::DOUBLE, 0.5)
                           AS intercept
                FROM pts p CROSS JOIN sl s)
            SELECT (SELECT count(*)::BIGINT FROM pts) AS n_days,
                   round_even(s.slope, 6) AS slope,
                   round_even(i.intercept, 6) AS intercept
            FROM sl s CROSS JOIN ic i
            WHERE (SELECT count(*) FROM pts) >= 2
        """,
        # Kaplan-Meier signup→purchase survival with right-censoring;
        # windowed product() rebuilds the cumulative survival
        "signup_survival_km": """
            WITH su AS (
                SELECT user_id, min(ts) AS st
                FROM events WHERE event_type = 'signup' GROUP BY 1),
            pu AS (
                SELECT e.user_id, min(e.ts) AS pt
                FROM events e JOIN su USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= su.st
                GROUP BY 1),
            mx AS (SELECT max(ts) AS endt
                   FROM events
                   WHERE event_type IN ('signup', 'purchase')),
            u AS (
                SELECT su.user_id,
                       CASE WHEN pu.pt IS NOT NULL THEN 1 ELSE 0 END AS ev,
                       CASE WHEN pu.pt IS NOT NULL
                            THEN epoch_us(pu.pt) - epoch_us(su.st)
                            ELSE (SELECT epoch_us(endt) FROM mx)
                                 - epoch_us(su.st) END AS dur_us
                FROM su LEFT JOIN pu USING (user_id)),
            d AS (SELECT dur_us // 86400000000 AS t, ev FROM u),
            grp AS (SELECT t, sum(ev)::BIGINT AS d, count(*)::BIGINT AS n
                    FROM d GROUP BY 1),
            ord AS (
                SELECT t, d, n,
                       (SELECT sum(n) FROM grp) -
                       coalesce(sum(n) OVER (ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS n_risk
                FROM grp)
            SELECT t::BIGINT AS duration_days, n_risk::BIGINT AS n_risk,
                   d AS n_events,
                   round_even(product(1.0 - d / n_risk::DOUBLE)
                              OVER (ORDER BY t), 6) AS survival
            FROM ord WHERE d > 0
            ORDER BY duration_days
        """,
        # doc-diversified retrieval: per-(query, doc) MAX cosine, then
        # top-k docs per query (same chunk/embed CTEs as rag_retrieval)
        "rag_retrieval_per_doc": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            sized AS (SELECT doc_id, arr, len(arr) AS n FROM toks),
            chunks AS (
                SELECT doc_id, arr,
                       unnest(range(0, GREATEST((n - 16 + 47) // 48, 1)))
                           AS chunk_id
                FROM sized),
            ctext AS (
                SELECT doc_id * 100000 + chunk_id AS chunk_key,
                       md5(array_to_string(
                           arr[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' '))
                           AS hx
                FROM chunks),
            cvec AS (
                SELECT chunk_key, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM ctext, unnest(range(0, 8)) AS t(i)),
            q AS (SELECT qid, md5(qt) AS hx FROM (VALUES
                    (0, 'spark join stream'),
                    (1, 'hash table scan'),
                    (2, 'window batch merge')) AS v(qid, qt)),
            qvec AS (
                SELECT qid, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM q, unnest(range(0, 8)) AS t(i)),
            cn AS (SELECT chunk_key, sqrt(sum(x * x)) AS nv
                   FROM cvec GROUP BY 1),
            qn AS (SELECT qid, sqrt(sum(x * x)) AS nv FROM qvec GROUP BY 1),
            dots AS (
                SELECT q.qid, c.chunk_key, sum(q.x * c.x) AS dp
                FROM qvec q JOIN cvec c USING (i)
                GROUP BY 1, 2),
            cosines AS (
                SELECT d.qid, d.chunk_key // 100000 AS doc_id,
                       d.dp / (qn.nv * cn.nv) AS cosine
                FROM dots d JOIN qn ON qn.qid = d.qid
                            JOIN cn ON cn.chunk_key = d.chunk_key),
            per_doc AS (
                SELECT qid, doc_id, max(cosine) AS cosine
                FROM cosines GROUP BY 1, 2),
            ranked AS (
                SELECT qid, doc_id, cosine,
                       row_number() OVER (
                           PARTITION BY qid
                           ORDER BY cosine DESC, doc_id) AS rnk
                FROM per_doc)
            SELECT qid::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
                   rnk::BIGINT AS rank, round(cosine, 6) AS cosine
            FROM ranked WHERE rnk <= 5
            ORDER BY query_id, rank
        """,
        # closed-form NB training + resubstitution eval; integer confusion
        "nb_lang_classifier": r"""
            WITH toks AS (
                SELECT doc_id, lang,
                       unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            ct AS (SELECT lang, w, count(*)::BIGINT AS n
                   FROM toks GROUP BY 1, 2),
            lt AS (SELECT lang, sum(n)::BIGINT AS tot FROM ct GROUP BY 1),
            vv AS (SELECT count(DISTINCT w)::BIGINT AS v FROM ct),
            pri AS (SELECT lang, count(*)::BIGINT AS nd
                    FROM documents GROUP BY 1),
            tp AS (SELECT sum(nd)::BIGINT AS tnd FROM pri),
            grid AS (
                SELECT l.lang, t.w,
                       ln((coalesce(c.n, 0) + 1.0)
                          / (lt.tot + (SELECT v FROM vv))) AS lp
                FROM (SELECT DISTINCT lang FROM pri) l
                CROSS JOIN (SELECT DISTINCT w FROM ct) t
                JOIN lt ON lt.lang = l.lang
                LEFT JOIN ct c ON c.lang = l.lang AND c.w = t.w),
            docsc AS (
                SELECT tk.doc_id, g.lang, sum(g.lp) AS s
                FROM toks tk JOIN grid g ON g.w = tk.w
                GROUP BY 1, 2),
            scored AS (
                SELECT d.doc_id, d.lang AS true_lang, p.lang AS cand,
                       coalesce(ds.s, 0)
                       + ln(p.nd / (SELECT tnd FROM tp)::DOUBLE) AS score
                FROM documents d
                CROSS JOIN pri p
                LEFT JOIN docsc ds
                    ON ds.doc_id = d.doc_id AND ds.lang = p.lang),
            pred AS (
                SELECT doc_id, true_lang, cand,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, cand) AS rk
                FROM scored)
            SELECT true_lang, cand AS pred_lang,
                   count(*)::BIGINT AS n_docs
            FROM pred WHERE rk = 1
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # exact Gini from integer cents; one final float division
        "revenue_gini": """
            WITH pc AS (
                SELECT o_custkey,
                       sum(round_even(o_totalprice * 100, 0)::BIGINT)
                           AS cents
                FROM orders GROUP BY 1),
            r AS (
                SELECT cents,
                       row_number() OVER (ORDER BY cents, o_custkey)
                           AS rn
                FROM pc),
            a AS (SELECT sum(rn * cents)::BIGINT AS s1,
                         sum(cents)::BIGINT AS t,
                         count(*)::BIGINT AS n
                  FROM r)
            SELECT n AS n_customers, t / 100.0 AS total_value,
                   round_even((2 * s1 - (n + 1) * t)
                              / (n * t)::DOUBLE, 6) AS gini
            FROM a
        """,
        # Benford first-digit audit; exact digit via integer-cents string
        "price_benford": """
            WITH d AS (
                SELECT substr((round_even(o_totalprice * 100, 0)::BIGINT)
                              ::VARCHAR, 1, 1)::BIGINT AS digit
                FROM orders),
            g AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d
                  GROUP BY 1),
            t AS (SELECT sum(n_obs)::BIGINT AS tot FROM g)
            SELECT digit, n_obs,
                   round_even(n_obs / (SELECT tot FROM t)::DOUBLE, 6)
                       AS obs_frac,
                   round_even(log10(1.0 + 1.0 / digit), 6) AS benford_frac
            FROM g ORDER BY digit
        """,
        # integer-exact CUSUM changepoint on the daily series
        "events_changepoint": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS day,
                       count(*)::BIGINT AS n
                FROM events GROUP BY 1),
            t AS (SELECT count(*)::BIGINT AS nd, sum(n)::BIGINT AS tot
                  FROM d),
            c AS (
                SELECT day,
                       sum(n * (SELECT nd FROM t) - (SELECT tot FROM t))
                           OVER (ORDER BY day)::BIGINT AS s
                FROM d)
            SELECT (SELECT nd FROM t) AS n_days,
                   (SELECT tot FROM t) AS n_events,
                   make_timestamp(day * 86400000000) AS change_day,
                   s AS cusum_scaled,
                   CASE WHEN s < 0 THEN 'up' ELSE 'down' END AS direction
            FROM c ORDER BY abs(s) DESC, day ASC LIMIT 1
        """,
        # RFM terciles: percentile_cont boundaries + strict lower-bound
        "customer_rfm_segments": """
            WITH pc AS (
                SELECT o_custkey, max(o_orderdate) AS last_o,
                       count(*)::BIGINT AS f,
                       sum(round_even(o_totalprice * 100, 0)::BIGINT)
                           AS cents
                FROM orders GROUP BY 1),
            mx AS (SELECT max(o_orderdate) AS endd FROM orders),
            m AS (
                SELECT epoch_us((SELECT endd FROM mx)) - epoch_us(last_o)
                           AS r_us,
                       f, cents
                FROM pc),
            qb AS (
                SELECT percentile_cont([1.0/3, 2.0/3])
                           WITHIN GROUP (ORDER BY r_us) AS rb,
                       percentile_cont([1.0/3, 2.0/3])
                           WITHIN GROUP (ORDER BY f) AS fb,
                       percentile_cont([1.0/3, 2.0/3])
                           WITHIN GROUP (ORDER BY cents) AS cb
                FROM m),
            seg AS (
                SELECT 'R' || (1 + len(list_filter((SELECT rb FROM qb),
                                   b -> r_us > b)))
                       || 'F' || (1 + len(list_filter((SELECT fb FROM qb),
                                   b -> f > b)))
                       || 'M' || (1 + len(list_filter((SELECT cb FROM qb),
                                   b -> cents > b))) AS segment,
                       cents
                FROM m)
            SELECT segment, count(*)::BIGINT AS n_customers,
                   sum(cents) / 100.0 AS total_value
            FROM seg GROUP BY 1 ORDER BY 1
        """,
        # exponentially-decayed counts: identical per-event terms in SQL
        "events_decayed_counts": """
            WITH mx AS (SELECT max(ts) AS endt FROM events)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   round_even(sum(pow(2.0,
                       -(epoch_us((SELECT endt FROM mx)) - epoch_us(ts))
                       / (7.0 * 86400000000.0))), 6) AS decayed_count
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # q16 shape: grouped exact COUNT DISTINCT via pair dedup
        "brand_supplier_counts": """
            SELECT p_brand, count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1 ORDER BY 1
        """,
        # global LAG max-gap (outage detection); earliest start on ties
        "events_max_gap": """
            WITH o AS (
                SELECT ts, lag(ts) OVER (ORDER BY ts, event_id) AS pts
                FROM events),
            g AS (
                SELECT epoch_us(ts) - epoch_us(pts) AS gap,
                       pts AS gs, ts AS ge
                FROM o WHERE pts IS NOT NULL)
            SELECT (SELECT count(*) FROM events)::BIGINT AS n_events,
                   gap::BIGINT AS max_gap_us, gs AS gap_start,
                   ge AS gap_end
            FROM g ORDER BY gap DESC, gs ASC LIMIT 1
        """,
        # per-user Shannon entropy from exact (user, type) counts
        "user_event_entropy": """
            WITH c AS (
                SELECT user_id, event_type, count(*)::BIGINT AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT user_id, sum(n)::BIGINT AS tot FROM c GROUP BY 1)
            SELECT c.user_id, any_value(t.tot)::BIGINT AS n_events,
                   count(*)::BIGINT AS n_types,
                   round_even(sum(-(c.n / t.tot::DOUBLE)
                                  * ln(c.n / t.tot::DOUBLE)), 6)
                       AS entropy
            FROM c JOIN t USING (user_id)
            GROUP BY c.user_id ORDER BY c.user_id
        """,
        # q4 shape: correlated EXISTS (predicate needs both sides)
        "late_shipment_orders": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY 1 ORDER BY 1
        """,
        # level-3 frequent itemsets (A-Priori prune is an optimization,
        # not a semantics change — plain three-way join oracle)
        "part_triple_copurchase": """
            WITH b AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem)
            SELECT a.p AS part_a, b2.p AS part_b, c.p AS part_c,
                   count(*)::BIGINT AS n_orders
            FROM b a
            JOIN b b2 ON a.o = b2.o AND a.p < b2.p
            JOIN b c ON a.o = c.o AND b2.p < c.p
            GROUP BY 1, 2, 3 HAVING count(*) >= 2
            ORDER BY 1, 2, 3
        """,
        # k-anonymity audit over the (type, isodow, hour) quasi-id tuple
        "events_k_anonymity": """
            WITH g AS (
                SELECT event_type, isodow(ts) AS dow, hour(ts) AS hour,
                       count(*)::BIGINT AS n
                FROM events GROUP BY 1, 2, 3)
            SELECT sum(n)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_classes,
                   sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)::BIGINT
                       AS n_small_classes,
                   sum(CASE WHEN n < 10 THEN n ELSE 0 END)::BIGINT
                       AS n_exposed_rows,
                   round_even(sum(CASE WHEN n < 10 THEN n ELSE 0 END)
                              / sum(n)::DOUBLE, 6) AS exposed_frac,
                   min(n)::BIGINT AS min_class_size
            FROM g
        """,
        # windowed duplicate suppression via LAG per (user, type)
        "events_dedup_window": """
            WITH lagged AS (
                SELECT event_type,
                       ts - lag(ts) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS gap
                FROM events)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   sum(CASE WHEN gap <= INTERVAL 600 SECOND
                            THEN 1 ELSE 0 END)::BIGINT AS n_suppressed,
                   round_even(sum(CASE WHEN gap <= INTERVAL 600 SECOND
                                       THEN 1 ELSE 0 END)
                              / count(*)::DOUBLE, 6) AS suppress_rate
            FROM lagged GROUP BY 1 ORDER BY 1
        """,
        # one-way ANOVA from the same raw-moment expressions
        "value_anova_by_type": """
            WITH g AS (
                SELECT event_type, count(*)::DOUBLE AS n, sum(value) AS sv,
                       sum(value * value) AS svv
                FROM events GROUP BY 1),
            t AS (SELECT sum(n) AS nt, count(*)::DOUBLE AS k,
                         sum(sv) AS svt
                  FROM g),
            c AS (
                SELECT (SELECT nt FROM t) AS nt, (SELECT k FROM t) AS k,
                       sum(n * pow(sv / n - (SELECT svt / nt FROM t), 2))
                           AS ssb,
                       sum(svv - sv * sv / n) AS ssw
                FROM g)
            SELECT nt::BIGINT AS n, k::BIGINT AS k,
                   round_even(ssb, 2) AS ss_between,
                   round_even(ssw, 2) AS ss_within,
                   round_even((ssb / (k - 1)) / (ssw / (nt - k)), 6)
                       AS f_stat,
                   round_even(ssb / (ssb + ssw), 6) AS eta_sq
            FROM c
        """,
        # round-bounded Bellman-Ford: min cost over paths of <= 12 edges,
        # integer weights — exact at the shared bound regardless of
        # convergence
        "kg_sssp_weighted": f"""
            WITH RECURSIVE m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            e AS (
                SELECT a.token AS s, b.token AS o, count(*)::BIGINT AS w
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            bidir AS (SELECT s, o, w FROM e
                      UNION ALL SELECT o, s, w FROM e),
            sp(node, d, hops) AS (
                SELECT 'batch', 0::BIGINT, 0
                UNION
                SELECT bd.o, sp.d + bd.w, sp.hops + 1
                FROM sp JOIN bidir bd ON bd.s = sp.node
                WHERE sp.hops < 12
            )
            SELECT node, min(d)::BIGINT AS dist
            FROM sp GROUP BY 1 ORDER BY 1
        """,
        # equi-depth decile build+apply: percentile_cont boundaries, strict
        # lower-bound assignment, exact cents
        "price_decile_stats": """
            WITH bl AS (
                SELECT percentile_cont(
                        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                    WITHIN GROUP (ORDER BY l_extendedprice) AS bs
                FROM lineitem),
            asg AS (
                SELECT l_extendedprice AS price,
                       round_even(l_extendedprice * 100, 0)::BIGINT AS cents,
                       1 + len(list_filter((SELECT bs FROM bl),
                                           b -> l_extendedprice > b))
                           AS decile
                FROM lineitem)
            SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n,
                   sum(cents) / 100.0 AS total_value,
                   min(price) AS min_price, max(price) AS max_price
            FROM asg GROUP BY 1 ORDER BY 1
        """,
        # contrastive hard negatives: label-excluded exact cosine top-k
        "hard_negatives": """
            WITH q AS (
                SELECT vec_id AS query_id, label AS query_label, embedding
                FROM embeddings WHERE vec_id < 20),
            sims AS (
                SELECT q.query_id, q.query_label,
                       e.vec_id AS neighbor_id, e.label AS neighbor_label,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.label <> q.query_label),
            ranked AS (
                SELECT *, row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS rnk
                FROM sims)
            SELECT query_id, query_label::BIGINT AS query_label,
                   neighbor_id, neighbor_label::BIGINT AS neighbor_label,
                   CAST(rnk AS BIGINT) AS rank, round(sim, 6) AS cosine
            FROM ranked WHERE rnk <= 3
            ORDER BY query_id, rank
        """,
        # last-touch attribution: ASOF LEFT JOIN + window gate; exact cents
        "purchase_attribution": """
            WITH p AS (
                SELECT user_id, ts,
                       round_even(value * 100, 0)::BIGINT AS cents
                FROM events WHERE event_type = 'purchase'),
            t AS (
                SELECT user_id, ts, max(event_type) AS channel
                FROM events WHERE event_type IN ('click', 'view')
                GROUP BY 1, 2),
            m AS (
                SELECT p.cents, t.channel, p.ts AS pts, t.ts AS tts
                FROM p ASOF LEFT JOIN t
                    ON p.user_id = t.user_id AND t.ts <= p.ts),
            c AS (
                SELECT CASE WHEN channel IS NOT NULL
                             AND pts - tts <= INTERVAL 7 DAY
                            THEN channel ELSE 'direct' END AS channel,
                       cents
                FROM m)
            SELECT channel, count(*)::BIGINT AS n_purchases,
                   sum(cents) / 100.0 AS total_value
            FROM c GROUP BY 1 ORDER BY 1
        """,
        # TPC-H q2 shape: group-wise argmin join with dim lookup
        "cheapest_supplier_per_part": """
            WITH m AS (
                SELECT l_partkey, min(l_extendedprice) AS min_price
                FROM lineitem GROUP BY 1),
            w AS (
                SELECT l.l_partkey, m.min_price,
                       min(l.l_suppkey) AS s_suppkey
                FROM lineitem l
                JOIN m ON l.l_partkey = m.l_partkey
                      AND l.l_extendedprice = m.min_price
                GROUP BY 1, 2)
            SELECT w.l_partkey AS p_partkey, w.min_price, w.s_suppkey,
                   s.s_name
            FROM w JOIN supplier s USING (s_suppkey)
            ORDER BY p_partkey
        """,
        # 2-D Pareto frontier via the running-max window identity
        "lineitem_skyline": """
            WITH pts AS (
                SELECT l_extendedprice AS price, max(l_quantity) AS qty
                FROM lineitem GROUP BY 1),
            w AS (
                SELECT price, qty,
                       max(qty) OVER (ORDER BY price
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prevmax
                FROM pts)
            SELECT price, qty FROM w
            WHERE prevmax IS NULL OR qty > prevmax
            ORDER BY price
        """,
        "hll_user_overlap": O.hll_overlap_sql(),
        "source_heavy_words": """
            WITH toks AS (
                SELECT source, t.w AS w
                FROM documents,
                     unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS t(w)
                WHERE t.w <> ''),
            n AS (SELECT source, count(*) AS n FROM toks GROUP BY 1)
            SELECT t.source, t.w AS word, count(*)::BIGINT AS cnt
            FROM toks t JOIN n USING (source)
            GROUP BY t.source, t.w, n.n
            HAVING count(*) >= ceil(0.03 * n.n)
            ORDER BY t.source, word
        """,
        "word_countmin": O.countmin_sql(
            sorted(
                ("spark", "hash", "join", "merge", "sort", "filter",
                 "window", "vector", "stream", "batch")
            )
        ),
        "distinct_users_hll_by_type": O.hll_grouped_sql(),
        # power iteration unrolled as chained CTEs
        "kg_pagerank": O.pagerank_sql(),
        # HITS unrolled the same way pagerank is; directed co-occur graph
        "kg_hits": O.hits_sql(),
        # hash-derandomized DeepWalk corpus replayed step by step
        "kg_random_walks": O.random_walks_sql(),
        # seeded synchronous majority rounds over the exact kNN graph
        "embedding_label_prop": O.label_prop_sql(),
        # unique MSF by the cycle property: an edge is in the forest iff
        # its endpoints are NOT connected using strictly smaller edges
        # (rank order = (w, subj, obj)); per-edge reachability as one
        # recursive CTE keyed by edge rank
        "kg_spanning_forest": """
            WITH RECURSIVE m AS (
                SELECT DISTINCT doc_id, token
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token
                      FROM documents)
                WHERE token IN ('spark','hash','join','merge','sort',
                                'filter','window','vector','stream','batch')),
            und AS (
                SELECT a.token AS s, b.token AS o, count(*)::BIGINT AS w
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            e AS (
                SELECT s, o, w,
                       row_number() OVER (ORDER BY w, s, o) AS rk
                FROM und),
            sym AS (
                SELECT s, o, rk FROM e
                UNION ALL SELECT o, s, rk FROM e),
            reach(id, node) AS (
                SELECT rk AS id, s AS node FROM e
                UNION
                SELECT r.id, sym.o
                FROM reach r JOIN sym
                    ON sym.s = r.node AND sym.rk < r.id)
            SELECT e.s AS subj, e.o AS obj, e.w
            FROM e
            LEFT JOIN reach r ON r.id = e.rk AND r.node = e.o
            WHERE r.node IS NULL
            ORDER BY subj, obj
        """,
        # SCC labels (min mutual-reach node) over the deterministic
        # modular-key digraph; closure as a recursive CTE, mutuality as a
        # closure self-join, label as a LEFT-JOIN min
        "kg_scc": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            tc(src, dst) AS (
                SELECT src, dst FROM e
                UNION
                SELECT t.src, e.dst FROM tc t JOIN e ON e.src = t.dst),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            mut AS (
                SELECT a.src AS u, a.dst AS v
                FROM tc a JOIN tc b ON a.src = b.dst AND a.dst = b.src
                WHERE a.src <> a.dst)
            SELECT n.node,
                   CAST(least(n.node, coalesce(min(m.v), n.node)) AS BIGINT)
                       AS scc
            FROM nodes n LEFT JOIN mut m ON m.u = n.node
            GROUP BY n.node
            ORDER BY node
        """,
        # 4-truss: synchronous peeling unrolled (unique fixpoint — extra
        # rounds are no-ops on both engines)
        "kg_ktruss": O.ktruss_sql(),
        # per-community Newman modularity terms over the same LPA chain
        "kg_modularity": O.modularity_sql(),
        # random walk with restart to the 3 smallest node ids, unrolled
        "kg_personalized_pagerank": O.ppr_sql(),
        # landmark BFS hop histograms: one recursive CTE keyed
        # (seed, node, d), min(d) per pair, depth-guarded at 64 like the
        # Ray side's max_iters
        "kg_landmark_distances": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            seeds AS (
                SELECT node FROM (
                    SELECT src AS node FROM e UNION SELECT dst FROM e)
                ORDER BY node LIMIT 3),
            walk(seed, node, d) AS (
                SELECT node, node, 0 FROM seeds
                UNION
                SELECT w.seed, e.dst, w.d + 1
                FROM walk w JOIN e ON e.src = w.node
                WHERE w.d < 64),
            dist AS (
                SELECT seed, node, min(d) AS dd
                FROM walk GROUP BY 1, 2)
            SELECT seed AS landmark, dd AS dist, count(*)::BIGINT AS n_nodes
            FROM dist
            GROUP BY 1, 2
            ORDER BY landmark, dist
        """,
        # second-order sequence patterns: double LAG within user order
        "user_event_trigrams": """
            WITH lagged AS (
                SELECT lag(event_type, 2) OVER w AS t1,
                       lag(event_type, 1) OVER w AS t2,
                       event_type AS t3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, count(*)::BIGINT AS n
            FROM lagged
            WHERE t1 IS NOT NULL
            GROUP BY 1, 2, 3
            HAVING count(*) >= 2
            ORDER BY t1, t2, t3
        """,
        # bow-tie decomposition: core = largest SCC (ties: min label);
        # in/out via single-node closure probes against the core label
        "kg_bowtie_regions": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            tc(src, dst) AS (
                SELECT src, dst FROM e
                UNION
                SELECT t.src, e.dst FROM tc t JOIN e ON e.src = t.dst),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            mut AS (
                SELECT a.src AS u, a.dst AS v
                FROM tc a JOIN tc b ON a.src = b.dst AND a.dst = b.src
                WHERE a.src <> a.dst),
            lab AS (
                SELECT n.node,
                       least(n.node, coalesce(min(m.v), n.node)) AS scc
                FROM nodes n LEFT JOIN mut m ON m.u = n.node
                GROUP BY n.node),
            core AS (
                SELECT scc FROM lab GROUP BY scc
                ORDER BY count(*) DESC, scc LIMIT 1)
            SELECT l.node,
                   CASE WHEN l.scc = (SELECT scc FROM core) THEN 'core'
                        WHEN EXISTS (SELECT 1 FROM tc
                                     WHERE tc.src = l.node
                                       AND tc.dst = (SELECT scc FROM core))
                            THEN 'in'
                        WHEN EXISTS (SELECT 1 FROM tc
                                     WHERE tc.dst = l.node
                                       AND tc.src = (SELECT scc FROM core))
                            THEN 'out'
                        ELSE 'other' END AS region
            FROM lab l
            ORDER BY node
        """,
        # numeric band self-join on exact integer cents (no equi key)
        "part_price_band_pairs": """
            WITH c AS (
                SELECT p_partkey,
                       round_even(p_retailprice * 100, 0)::BIGINT AS cents
                FROM part)
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   abs(a.cents - b.cents) AS diff_cents
            FROM c a JOIN c b
              ON a.p_partkey < b.p_partkey
             AND abs(a.cents - b.cents) <= 10
            ORDER BY id_a, id_b
        """,
        # Weisfeiler-Leman color refinement: degree init, two rounds of
        # md5-u64(own || '|' || lexicographically-ordered neighbor colors)
        "kg_wl_colors": """
            WITH e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            und AS (
                SELECT src AS u, dst AS v FROM e
                UNION
                SELECT dst, src FROM e),
            c0 AS (
                SELECT v AS node, count(*)::VARCHAR AS color
                FROM und GROUP BY v),
            c1 AS (
                SELECT n.node,
                       (('0x' || substr(md5(n.color || '|' || ns.s), 1, 16))::UBIGINT)::VARCHAR AS color
                FROM c0 n JOIN (
                    SELECT und.v AS node,
                           string_agg(c.color, ',' ORDER BY c.color) AS s
                    FROM und JOIN c0 c ON c.node = und.u
                    GROUP BY und.v) ns ON ns.node = n.node),
            c2 AS (
                SELECT n.node,
                       (('0x' || substr(md5(n.color || '|' || ns.s), 1, 16))::UBIGINT)::VARCHAR AS color
                FROM c1 n JOIN (
                    SELECT und.v AS node,
                           string_agg(c.color, ',' ORDER BY c.color) AS s
                    FROM und JOIN c1 c ON c.node = und.u
                    GROUP BY und.v) ns ON ns.node = n.node)
            SELECT node, color FROM c2 ORDER BY node
        """,
        # condensation DAG layering: SCC labels → distinct inter-SCC edges
        # → longest-path level per SCC (recursive CTE from all-zero seeds)
        "kg_condensation_levels": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            tc(src, dst) AS (
                SELECT src, dst FROM e
                UNION
                SELECT t.src, e.dst FROM tc t JOIN e ON e.src = t.dst),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            mut AS (
                SELECT a.src AS u, a.dst AS v
                FROM tc a JOIN tc b ON a.src = b.dst AND a.dst = b.src
                WHERE a.src <> a.dst),
            lab AS (
                SELECT n.node,
                       least(n.node, coalesce(min(m.v), n.node)) AS scc
                FROM nodes n LEFT JOIN mut m ON m.u = n.node
                GROUP BY n.node),
            cond AS (
                SELECT DISTINCT la.scc AS src, lb.scc AS dst
                FROM e JOIN lab la ON la.node = e.src
                       JOIN lab lb ON lb.node = e.dst
                WHERE la.scc <> lb.scc),
            lev(node, l) AS (
                SELECT scc, 0 FROM (SELECT DISTINCT scc FROM lab)
                UNION
                SELECT c.dst, lev.l + 1 FROM lev JOIN cond c ON c.src = lev.node)
            SELECT CAST(node AS BIGINT) AS scc, CAST(max(l) AS BIGINT) AS level
            FROM lev
            GROUP BY node
            ORDER BY scc
        """,
        # directed out-in degree assortativity (Newman 2002) over the same
        # modular-key digraph; all moment sums exact BIGINTs, one float
        # expression mirrored term-for-term against the numpy side
        "kg_assortativity": """
            WITH e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            od AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src),
            idg AS (SELECT dst, count(*)::BIGINT AS d FROM e GROUP BY dst),
            xy AS (
                SELECT od.d AS x, idg.d AS y
                FROM e JOIN od USING (src) JOIN idg USING (dst)),
            s AS (
                SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                       sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                       sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
                FROM xy)
            SELECT n AS n_edges,
                   round_even(
                       CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                       AS assortativity
            FROM s
        """,
        # Markov-chain power iteration over event-type transitions
        "event_type_stationary": O.stationary_sql(),
        # synchronous weighted LPA unrolled the same way
        "kg_communities": O.lpa_sql(),
        "kg_kcore": O.kcore_sql(),
        # graph-health diagnostics: CSN power-law alpha + assortativity,
        # every statistic a sum decomposition over the shared edge CTEs
        "kg_graph_stats": r"""
            WITH m AS MATERIALIZED (
                SELECT DISTINCT doc_id, token
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'))
                                 AS token
                      FROM documents)
                WHERE token IN ('spark','hash','join','merge','sort',
                                'filter','window','vector','stream','batch')),
            und AS MATERIALIZED (
                SELECT a.token AS s, b.token AS o
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2
                HAVING count(*) >= 326),
            half AS (SELECT o AS mid, s AS endpoint FROM und
                     UNION ALL SELECT s, o FROM und),
            deg AS (SELECT mid AS node, count(*)::DOUBLE AS d
                    FROM half GROUP BY 1),
            dstat AS (SELECT count(*)::DOUBLE AS n, sum(ln(d)) AS sln,
                             min(d) AS dmin, max(d) AS dmax
                      FROM deg),
            es AS (SELECT count(*)::DOUBLE AS ne FROM und),
            pairs AS (
                SELECT da.d AS x, db.d AS y
                FROM und JOIN deg da ON da.node = und.s
                         JOIN deg db ON db.node = und.o
                UNION ALL
                SELECT db.d, da.d
                FROM und JOIN deg da ON da.node = und.s
                         JOIN deg db ON db.node = und.o),
            mo AS (SELECT count(*)::DOUBLE AS m, sum(x) AS sx,
                          sum(x * x) AS sxx, sum(x * y) AS sxy
                   FROM pairs)
            SELECT n::BIGINT AS n_nodes, ne::BIGINT AS n_edges,
                   round_even(2.0 * ne / n, 6) AS avg_degree,
                   dmax::BIGINT AS max_degree,
                   round_even(CASE WHEN sln - n * ln(dmin) > 0
                                   THEN 1.0 + n / (sln - n * ln(dmin))
                                   ELSE 0 END, 6) AS powerlaw_alpha,
                   round_even(CASE WHEN sxx / mo.m - (sx / mo.m) ^ 2 > 0
                                   THEN (sxy / mo.m - (sx / mo.m) ^ 2)
                                        / (sxx / mo.m - (sx / mo.m) ^ 2)
                                   ELSE 0 END, 6) AS assortativity
            FROM dstat, es, mo
        """,
        # Adamic-Adar link prediction: wedges via the shared strong-edge
        # CTEs, scores rounded BEFORE ranking on both sides
        "kg_link_prediction": r"""
            WITH m AS MATERIALIZED (
                SELECT DISTINCT doc_id, token
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'))
                                 AS token
                      FROM documents)
                WHERE token IN ('spark','hash','join','merge','sort',
                                'filter','window','vector','stream','batch')),
            und AS MATERIALIZED (
                SELECT a.token AS s, b.token AS o
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2
                HAVING count(*) >= 326),
            half AS (SELECT o AS mid, s AS endpoint FROM und
                     UNION ALL SELECT s, o FROM und),
            deg AS (SELECT mid AS node, count(*) AS d FROM half GROUP BY 1),
            wedge AS (
                SELECT h1.endpoint AS src, h2.endpoint AS dst, h1.mid
                FROM half h1 JOIN half h2 USING (mid)
                WHERE h1.endpoint < h2.endpoint),
            aa AS (
                SELECT src, dst, count(*) AS cn,
                       round_even(sum(1.0 / ln(d)), 6) AS adamic_adar
                FROM wedge JOIN deg ON deg.node = wedge.mid
                GROUP BY 1, 2),
            cand AS (
                SELECT * FROM aa
                WHERE NOT EXISTS (SELECT 1 FROM und
                                  WHERE und.s = aa.src AND und.o = aa.dst))
            SELECT src, dst, cn::BIGINT AS common_neighbors, adamic_adar
            FROM cand
            ORDER BY adamic_adar DESC, src, dst LIMIT 20
        """,
        "kg_code_triples": O.values_sql(O.expected_kg_code_triples()),
        "kg_incremental_triples": O.values_sql(
            O.expected_kg_incremental_triples()
        ),
    }
    # Code-repo table oracles: independent SQL re-derivations over the SAME
    # deterministic parquet the Ray queries read (absolute /tmp path; the
    # helper writes it if the oracle runs before the query).
    code_pq = _code_fixture_path()
    kg_oracles |= {
        # serial winnowing walk (oracle.py) rendered as a VALUES relation
        # (small integer literals parse as INT32 — cast back to BIGINT)
        "code_clone_pairs": (
            "SELECT repo_a, path_a, repo_b, path_b,"
            " n_shared::BIGINT AS n_shared FROM ("
            + O.values_sql(O.code_clone_pairs_expected(code_pq))
            + ") v"
        ),
        "code_latest_snapshot": f"""
            SELECT repo, path,
                   arg_max("commit", commit_ts) AS "commit",
                   max(commit_ts) AS commit_ts,
                   arg_max(lang, commit_ts) AS lang
            FROM read_parquet('{code_pq}')
            GROUP BY repo, path
        """,
        "code_commit_diff": f"""
            WITH h AS (
                SELECT repo, path, commit_ts, sha256(content) AS sha
                FROM read_parquet('{code_pq}')),
            b AS (
                SELECT repo, path, arg_max(sha, commit_ts) AS sha
                FROM h WHERE commit_ts <= 2000000000 GROUP BY 1, 2),
            a AS (
                SELECT repo, path, arg_max(sha, commit_ts) AS sha
                FROM h WHERE commit_ts <= 1605000000 GROUP BY 1, 2)
            SELECT b.repo, b.path,
                   CASE WHEN a.sha IS NULL THEN 'added'
                        WHEN a.sha <> b.sha THEN 'modified'
                        ELSE 'unchanged' END AS status
            FROM b LEFT JOIN a USING (repo, path)
            ORDER BY repo, path
        """,
        "code_repo_stats": f"""
            WITH snap AS (
                SELECT repo, path FROM read_parquet('{code_pq}')
                QUALIFY row_number() OVER (
                    PARTITION BY repo, path ORDER BY commit_ts DESC) = 1),
            f AS (SELECT repo, count(*)::BIGINT AS n_files
                  FROM snap GROUP BY 1),
            v AS (SELECT repo, count(*)::BIGINT AS n_versions,
                         max(commit_ts) AS last_commit_ts
                  FROM read_parquet('{code_pq}') GROUP BY 1),
            l AS (SELECT repo, count(DISTINCT lang)::BIGINT AS n_langs
                  FROM read_parquet('{code_pq}') GROUP BY 1)
            SELECT f.repo, f.n_files, v.n_versions, l.n_langs,
                   v.last_commit_ts
            FROM f JOIN v USING (repo) JOIN l USING (repo)
            ORDER BY repo
        """,
        "code_file_history": f"""
            SELECT repo, path, "commit",
                   commit_ts AS valid_from,
                   coalesce(
                       lead(commit_ts) OVER (
                           PARTITION BY repo, path ORDER BY commit_ts),
                       9223372036854775807) AS valid_to,
                   lead(commit_ts) OVER (
                       PARTITION BY repo, path ORDER BY commit_ts) IS NULL
                       AS is_current
            FROM read_parquet('{code_pq}')
        """,
        "code_import_graph": f"""
            WITH snap AS (
                SELECT repo, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path
            )
            SELECT DISTINCT repo,
                   unnest(regexp_extract_all(
                       content,
                       '(?m)^import ([A-Za-z_][A-Za-z0-9_]*)$', 1)) AS module
            FROM snap
        """,
        "code_deps_asof": f"""
            WITH snap AS (
                SELECT repo, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                WHERE commit_ts <= 1605000000
                GROUP BY repo, path)
            SELECT DISTINCT repo,
                   unnest(regexp_extract_all(content,
                       '(?m)^import ([A-Za-z_][A-Za-z0-9_]*)$', 1))
                       AS module
            FROM snap
            ORDER BY repo, module
        """,
        "code_import_history": f"""
            WITH v AS (
                SELECT repo, path, content, commit_ts AS s,
                       coalesce(lead(commit_ts) OVER (
                           PARTITION BY repo, path ORDER BY commit_ts),
                           9223372036854775807) AS e
                FROM read_parquet('{code_pq}')),
            edges AS (
                SELECT DISTINCT repo, path, s, e,
                       unnest(regexp_extract_all(content,
                           '(?m)^import ([A-Za-z_][A-Za-z0-9_]*)$', 1))
                           AS module
                FROM v),
            ord AS (
                SELECT repo, path, module, s, e,
                       CASE WHEN s = lag(e) OVER (
                                PARTITION BY repo, path, module
                                ORDER BY s)
                            THEN 0 ELSE 1 END AS brk
                FROM edges),
            isl AS (
                SELECT repo, path, module, s, e,
                       sum(brk) OVER (
                           PARTITION BY repo, path, module ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS island
                FROM ord)
            SELECT repo, path, module,
                   min(s) AS valid_from, max(e) AS valid_to,
                   max(e) = 9223372036854775807 AS is_current
            FROM isl GROUP BY repo, path, module, island
            ORDER BY repo, path, module, valid_from
        """,
        "code_lang_loc": f"""
            WITH snap AS (
                SELECT repo, lang, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path, lang
            )
            SELECT repo, lang,
                   count(*)::BIGINT AS n_files,
                   sum(length(content)
                       - length(replace(content, chr(10), ''))
                       + CASE WHEN content <> ''
                                   AND NOT ends_with(content, chr(10))
                              THEN 1 ELSE 0 END)::BIGINT AS n_lines,
                   sum(strlen(content))::BIGINT AS n_bytes
            FROM snap
            GROUP BY repo, lang
            ORDER BY repo, lang
        """,
        # per-file quality gates over the latest snapshot; trailing empty
        # line dropped on both engines, interior blanks kept
        "code_quality_metrics": f"""
            WITH snap AS (
                SELECT repo, path, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path),
            adj AS (
                SELECT repo, path,
                       CASE WHEN len(l) > 0 AND l[len(l)] = ''
                            THEN l[1 : len(l) - 1] ELSE l END AS ls
                FROM (SELECT repo, path,
                             string_split(content, chr(10)) AS l
                      FROM snap)),
            ln AS (SELECT repo, path, unnest(ls) AS line FROM adj),
            agg AS (
                SELECT repo, path, count(*)::BIGINT AS n_lines,
                       sum(CASE WHEN regexp_matches(line, '^\\s*#')
                                THEN 1 ELSE 0 END)::BIGINT AS n_comments,
                       max(length(line))::BIGINT AS max_line_len,
                       sum(length(line))::BIGINT AS total_len
                FROM ln GROUP BY 1, 2)
            SELECT repo, path, n_lines, n_comments, max_line_len,
                   round_even(n_comments / n_lines::DOUBLE, 6)
                       AS comment_ratio,
                   round_even(total_len / n_lines::DOUBLE, 6)
                       AS avg_line_len
            FROM agg ORDER BY repo, path
        """,
        "code_secret_scan": f"""
            WITH snap AS (
                SELECT repo, path, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path
            )
            SELECT repo, path,
                   len(regexp_extract_all(content,
                       'sk_live_[0-9a-f]+'))::BIGINT AS n_secrets,
                   len(regexp_extract_all(content,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))::BIGINT
                       AS n_emails,
                   sha256(
                       regexp_replace(
                           regexp_replace(content,
                               'sk_live_[0-9a-f]+', '[REDACTED]', 'g'),
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                           '[EMAIL]', 'g')) AS redacted_sha
            FROM snap
            ORDER BY repo, path
        """,
        "code_vendored_files": f"""
            SELECT sha256(content) AS content_sha256,
                   count(DISTINCT repo) AS n_repos,
                   count(*) AS n_copies
            FROM read_parquet('{code_pq}')
            GROUP BY 1
            HAVING count(DISTINCT repo) >= 2
        """,
        "code_license_scan": f"""
            WITH snap AS (
                SELECT repo, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path)
            SELECT repo,
                   coalesce(nullif(regexp_extract(content,
                       'SPDX-License-Identifier: ([A-Za-z0-9.\\-]+)', 1),
                       ''), 'none') AS license,
                   count(*)::BIGINT AS n_files
            FROM snap
            GROUP BY 1, 2
            ORDER BY repo, license
        """,
        "code_fork_pairs": f"""
            WITH snap AS (
                SELECT repo, path,
                       arg_max(sha256(content), commit_ts) AS sha
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path),
            rs AS (SELECT DISTINCT repo, sha FROM snap),
            sz AS (SELECT repo, count(*)::BIGINT AS n FROM rs GROUP BY 1),
            pr AS (
                SELECT a.repo AS repo_a, b.repo AS repo_b,
                       count(*)::BIGINT AS n_shared
                FROM rs a JOIN rs b
                    ON a.sha = b.sha AND a.repo < b.repo
                GROUP BY 1, 2)
            SELECT p.repo_a, p.repo_b, p.n_shared,
                   round_even(p.n_shared
                       / (sa.n + sb.n - p.n_shared)::DOUBLE
                       * 1000000.0, 0) / 1000000.0 AS jaccard
            FROM pr p
            JOIN sz sa ON sa.repo = p.repo_a
            JOIN sz sb ON sb.repo = p.repo_b
            ORDER BY p.repo_a, p.repo_b
        """,
        "code_call_triples": f"""
            WITH snap AS (
                SELECT repo, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path),
            defs AS (
                SELECT DISTINCT
                       unnest(regexp_extract_all(content,
                           'def (fn_\\d+)\\(', 1)) AS fn,
                       repo AS def_repo
                FROM snap),
            calls AS (
                SELECT unnest(regexp_extract_all(content,
                           '= (fn_\\d+)\\(\\)', 1)) AS fn,
                       repo AS caller_repo
                FROM snap)
            SELECT c.caller_repo AS subj, 'calls' AS pred,
                   d.def_repo AS obj,
                   count(*)::BIGINT AS n_calls,
                   count(DISTINCT c.fn)::BIGINT AS n_fns
            FROM calls c JOIN defs d USING (fn)
            GROUP BY 1, 2, 3
            ORDER BY subj, obj
        """,
        # metapath (predicate-bigram) profile: distinct imports/defines/
        # calls triples from latest-snapshot .py files, self-joined on the
        # shared mid entity, counted per ordered predicate pair
        "kg_metapath_counts": f"""
            WITH snap AS (
                SELECT repo, path, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path),
            base AS (
                SELECT regexp_extract(path, '([^/]+)\\.[A-Za-z0-9]+$', 1)
                           AS stem,
                       content
                FROM snap
                WHERE regexp_extract(path,
                           '([^/]+)\\.[A-Za-z0-9]+$', 1) <> ''),
            t AS (
                SELECT DISTINCT stem AS subj, 'imports' AS pred,
                       unnest(regexp_extract_all(content,
                           'import ([A-Za-z_][A-Za-z0-9_]*)', 1)) AS obj
                FROM base
                UNION
                SELECT DISTINCT stem, 'defines',
                       unnest(regexp_extract_all(content,
                           'def (fn_\\d+)\\(', 1))
                FROM base
                UNION
                SELECT DISTINCT regexp_extract(content,
                           'def (fn_\\d+)\\(', 1), 'calls',
                       unnest(regexp_extract_all(content,
                           '= (fn_\\d+)\\(\\)', 1))
                FROM base
                WHERE regexp_extract(content, 'def (fn_\\d+)\\(', 1) <> '')
            SELECT a.pred AS p1, b.pred AS p2, count(*)::BIGINT AS n_paths
            FROM t a JOIN t b ON a.obj = b.subj
            GROUP BY 1, 2
            ORDER BY p1, p2
        """,
        # recursive-CTE walk of the same fn-level call edges; the Ray side
        # computes the identical closure by path doubling (log-round joins)
        "kg_reachability": f"""
            WITH RECURSIVE snap AS (
                SELECT repo, arg_max(content, commit_ts) AS content
                FROM read_parquet('{code_pq}')
                GROUP BY repo, path),
            pairs AS (
                SELECT DISTINCT
                       regexp_extract(content, 'def (fn_\\d+)\\(', 1) AS src,
                       unnest(regexp_extract_all(content,
                           '= (fn_\\d+)\\(\\)', 1)) AS dst
                FROM snap
                WHERE regexp_extract(content, 'def (fn_\\d+)\\(', 1) <> ''),
            tc(src, dst) AS (
                SELECT src, dst FROM pairs
                UNION
                SELECT tc.src, p.dst
                FROM tc JOIN pairs p ON p.src = tc.dst)
            SELECT src, dst FROM tc ORDER BY src, dst
        """,
    }
    q3_sql = """
            SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY 1, 2
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """
    return kg_oracles | {
        # the bucketed-storage path must produce byte-identical q3 results
        "q3_colocated": q3_sql,
        # the bloom-prefiltered fact-fact join must too (false positives
        # are eliminated by the join; no false negatives by construction)
        "q3_bloom": q3_sql,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_order_revenue": """
            SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY 1, 2
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        # q8 market share: per-row exact cents make both sums order-free
        # integers; one float division at the end (np.round-mirrored)
        "q8_market_share": """
            WITH li AS (
                SELECT l.l_orderkey,
                       round_even(l.l_extendedprice * (1 - l.l_discount)
                           * 100.0, 0)::BIGINT AS cents,
                       sn.n_name AS supp_nation
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                    AND p.p_type = 'ECONOMY'
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation sn ON sn.n_nationkey = s.s_nationkey),
            o AS (
                SELECT o.o_orderkey, year(o.o_orderdate) AS o_year
                FROM orders o
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation cn ON cn.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = cn.n_regionkey
                    AND r.r_name = 'ASIA'
                WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o.o_orderdate <= TIMESTAMP '1996-12-31')
            SELECT o.o_year::BIGINT AS o_year,
                   round_even(
                       sum(CASE WHEN li.supp_nation = 'NATION_2'
                                THEN li.cents ELSE 0 END)::DOUBLE
                       / sum(li.cents)::DOUBLE * 1000000.0, 0)
                       / 1000000.0 AS mkt_share
            FROM li JOIN o ON o.o_orderkey = li.l_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        # q9 profit: per-row exact cents (identical numpy/DuckDB expression
        # tree + half-even rounding) make the per-group sums order-free ints
        "part_profit_by_nation": """
            SELECT n.n_name AS nation,
                   year(o.o_orderdate)::BIGINT AS o_year,
                   sum(round_even((l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * l.l_quantity) * 100.0,
                       0)::BIGINT) / 100.0 AS profit
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                AND p.p_name LIKE '%red%'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # q11 value concentration: integer-cents sums, one global scalar
        "part_value_concentration": """
            WITH pp AS (
                SELECT l_partkey,
                       sum(round_even(l_extendedprice * (1 - l_discount)
                               * 100.0, 0)::BIGINT) AS cents
                FROM lineitem GROUP BY 1)
            SELECT l_partkey, cents / 100.0 AS value
            FROM pp
            WHERE cents::DOUBLE > (SELECT sum(cents) FROM pp)::DOUBLE * 0.0006
            ORDER BY value DESC, l_partkey
        """,
        # q16 supplier variety: distinct-supplier count per part attrs with
        # brand/size filters and a supplier blacklist (acctbal < 0 standing
        # in for the complaints-comment scan; no s_comment in this corpus)
        "supplier_part_variety": """
            SELECT p.p_brand, p.p_size::BIGINT AS p_size,
                   count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand <> 'Brand#2'
              AND p.p_size IN (1, 5, 11, 15, 23, 37, 41, 49)
              AND l.l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2
            ORDER BY supplier_cnt DESC, p.p_brand, p_size
        """,
        # q20 excess quantity: nested pair/part aggregate -> supplier semi-join
        "excess_quantity_suppliers": """
            WITH pairs AS (
                SELECT l.l_partkey, l.l_suppkey,
                       sum(round_even(l.l_quantity * 100.0, 0)::BIGINT)
                           AS q100
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                    AND p.p_name LIKE 'small%'
                WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
                GROUP BY 1, 2),
            per_part AS (
                SELECT l_partkey, sum(q100) AS part_sum,
                       count(*) AS n_pairs
                FROM pairs GROUP BY 1)
            SELECT s.s_suppkey, s.s_name
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
                AND n.n_name = 'NATION_18'
            WHERE s.s_suppkey IN (
                SELECT pr.l_suppkey
                FROM pairs pr JOIN per_part pp USING (l_partkey)
                WHERE pr.q100::DOUBLE >
                      0.6 * (pp.part_sum::DOUBLE / pp.n_pairs::DOUBLE))
            ORDER BY s.s_suppkey
        """,
        "q5_nation_revenue": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY 1
        """,
        "top_brand_revenue": """
            SELECT p.p_brand,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        """,
        "supplier_balance_by_nation": """
            SELECT n.n_name, round(sum(s.s_acctbal), 2) AS total_bal,
                   count(*) AS n_suppliers
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "events_by_type": """
            SELECT event_type, round(sum(value), 2) AS total_value,
                   count(*) AS n_events,
                   round(sum(value) / count(*), 4) AS avg_value
            FROM events GROUP BY 1
        """,
        "user_hourly_activity": """
            SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "user_sessions": """
            WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events)
            SELECT user_id, CAST(sum(new_s) + 1 AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY 1
        """,
        "user_session_spans": """
            WITH flags AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events),
            sids AS (
                SELECT user_id, ts,
                       sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flags)
            SELECT user_id, CAST(sid + 1 AS BIGINT) AS session_idx,
                   min(ts) AS start_ts, max(ts) AS end_ts,
                   count(*) AS n_events
            FROM sids GROUP BY 1, 2
        """,
        # incremental sessionize: the oracle IS the full recompute — the
        # gate proves the delta-driven path equals rebuilding from scratch
        "user_sessions_incremental": """
            WITH flags AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events),
            sids AS (
                SELECT user_id, ts,
                       sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flags)
            SELECT user_id, CAST(sid + 1 AS BIGINT) AS session_idx,
                   min(ts) AS start_ts, max(ts) AS end_ts,
                   count(*) AS n_events
            FROM sids GROUP BY 1, 2
            ORDER BY user_id, session_idx
        """,
        "purchase_in_session": """
            WITH flags AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events),
            sids AS (
                SELECT user_id, ts,
                       sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flags),
            spans AS (
                SELECT user_id, CAST(sid + 1 AS BIGINT) AS session_idx,
                       min(ts) AS start_ts, max(ts) AS end_ts
                FROM sids GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, e.ts,
                   s.session_idx, s.start_ts, s.end_ts
            FROM events e
            JOIN spans s ON s.user_id = e.user_id
                        AND e.ts BETWEEN s.start_ts AND s.end_ts
            WHERE e.event_type = 'purchase'
        """,
        "top_events_per_user": """
            WITH ranked AS (
                SELECT user_id, event_id, value,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY value DESC, event_id) AS rnk
                FROM events)
            SELECT user_id, event_id, round(value, 2) AS value,
                   CAST(rnk AS BIGINT) AS rank
            FROM ranked WHERE rnk <= 3
        """,
        "user_sliding_window": """
            WITH h AS (
                SELECT user_id, date_trunc('hour', ts) AS hour,
                       count(*) AS n
                FROM events GROUP BY 1, 2)
            SELECT user_id, hour, n,
                   CAST(sum(n) OVER (
                       PARTITION BY user_id ORDER BY hour
                       RANGE BETWEEN INTERVAL 2 HOUR PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS n_3h
            FROM h
        """,
        "purchase_since_signup": """
            SELECT p.event_id, p.user_id, p.ts, s.ts AS ts_signup
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT user_id, ts FROM events
                       WHERE event_type = 'signup') s
            ON p.user_id = s.user_id AND p.ts >= s.ts
        """,
        # cdc_user_state: merge_upsert compaction == one-pass log compaction
        # (max sequence over a union is associative); errors are tombstones
        "cdc_user_state": """
            WITH ranked AS (
                SELECT user_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events)
            SELECT user_id, ts AS last_ts, event_type AS last_event_type,
                   value AS last_value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
            ORDER BY user_id
        """,
        "doc_stats_by_lang": """
            SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   count(*) AS n_docs,
                   round(sum(n_chars) / count(*), 4) AS avg_chars
            FROM documents GROUP BY 1
        """,
        "doc_token_counts": """
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        # doc_pack_blocks: the distributed prefix sum IS the window cumsum;
        # block spans are integer arithmetic off the exclusive offset
        "doc_pack_blocks": """
            WITH toks AS (
                SELECT doc_id,
                       CAST(len(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS BIGINT) AS n_tokens
                FROM documents),
            scanned AS (
                SELECT doc_id, n_tokens,
                       CAST(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
                           AS token_start
                FROM toks)
            SELECT doc_id, n_tokens, token_start,
                   CAST(token_start // 256 AS BIGINT) AS block_first,
                   CAST(CASE WHEN n_tokens > 0
                        THEN (token_start + n_tokens - 1) // 256
                        ELSE token_start // 256 END AS BIGINT) AS block_last
            FROM scanned ORDER BY doc_id
        """,
        "doc_dedup_exact": """
            SELECT min(doc_id) AS doc_id, sha256(text) AS text_sha256,
                   count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "word_frequency": f"""
            SELECT token, count(*) AS n
            FROM ({_TOKENS})
            GROUP BY 1
            ORDER BY n DESC, token
            LIMIT 100
        """,
        # repeated n-gram spans (Lee et al. 2022): 8-token windows that
        # appear in >= 2 distinct documents; slice arr[i:i+7] is 1-based
        # inclusive, i.e. 8 tokens
        "doc_repeated_ngrams": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents),
            ng AS (
                SELECT doc_id, array_to_string(arr[i:i+7], ' ') AS ngram
                FROM toks, unnest(range(1, len(arr) - 6)) AS t(i))
            SELECT ngram, count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_total
            FROM ng GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
            ORDER BY n_total DESC, ngram
        """,
        # bigram LM: add-0.5 smoothing, rounded-rank top-15 weird tail
        "doc_bigram_perplexity": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            big AS (
                SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
                FROM toks, unnest(range(1, len(arr))) AS t(i)),
            bc AS (SELECT w1, w2, count(*)::DOUBLE AS c12
                   FROM big GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1),
            v AS (SELECT count(DISTINCT w)::DOUBLE AS vsz
                  FROM (SELECT unnest(arr) AS w FROM toks)),
            sc AS (
                SELECT b.doc_id,
                       sum(-log2((bc.c12 + 0.5) / (ctx.c1 + 0.5 * vsz)))
                           AS bits,
                       count(*) AS n
                FROM big b JOIN bc USING (w1, w2) JOIN ctx USING (w1)
                CROSS JOIN v
                GROUP BY 1)
            SELECT doc_id,
                   round_even(bits / n, 6) AS bits_per_bigram,
                   n::BIGINT AS n_bigrams
            FROM sc
            ORDER BY round_even(bits / n, 6) DESC, doc_id LIMIT 15
        """,
        # DSIR importance resampling: hashed-unigram bag LMs for the
        # target domain (lang='en') vs the raw pool, add-0.5 smoothing over
        # 1024 hashed buckets, mean per-token log ratio, top-100 raw docs.
        # Weights rank on round_even(·, 6) on BOTH sides (numpy half-even).
        "dsir_select": f"""
            WITH tok AS (
                SELECT doc_id, lang, t.token AS token
                FROM documents,
                     unnest(regexp_split_to_array(
                        trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '),
                        '\\s+')) AS t(token)
                WHERE t.token <> ''),
            bkt AS (
                SELECT doc_id, lang,
                       (('0x' || substr(md5(token),1,16))::UBIGINT % 1024) AS b
                FROM tok),
            cnt AS (
                SELECT b,
                       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS nt,
                       sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::DOUBLE AS nr
                FROM bkt GROUP BY 1),
            tot AS (SELECT sum(nt) AS t_tot, sum(nr) AS r_tot FROM cnt),
            lr AS (
                SELECT b,
                       ln((nt + 0.5) / ((SELECT t_tot FROM tot) + 512.0))
                     - ln((nr + 0.5) / ((SELECT r_tot FROM tot) + 512.0)) AS lr
                FROM cnt),
            scored AS (
                SELECT doc_id, any_value(bkt.lang) AS lang,
                       count(*) AS n_tokens, avg(lr.lr) AS w
                FROM bkt JOIN lr USING (b)
                WHERE bkt.lang <> 'en'
                GROUP BY doc_id)
            SELECT doc_id, lang, n_tokens, round_even(w, 6) AS weight
            FROM scored
            ORDER BY round_even(w, 6) DESC, doc_id
            LIMIT 100
        """,
        "doc_unigram_lm": f"""
            WITH tok AS ({_TOKENS}),
            counts AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
            tot AS (SELECT sum(n)::DOUBLE AS n_total FROM counts),
            top AS (SELECT token, n FROM counts
                    ORDER BY n DESC, token LIMIT 20),
            oov AS (SELECT (SELECT n_total FROM tot)
                           - (SELECT sum(n)::DOUBLE FROM top) AS m),
            scored AS (
                SELECT t.doc_id,
                       coalesce(
                           log2(tp.n::DOUBLE / (SELECT n_total FROM tot)),
                           log2((SELECT m FROM oov)
                                / (SELECT n_total FROM tot))) AS lp
                FROM tok t LEFT JOIN top tp USING (token))
            SELECT doc_id, count(*) AS n_tokens,
                   round(-avg(lp), 6) AS bits_per_token
            FROM scored GROUP BY doc_id
        """,
        # distant-supervision context windows around vocabulary mentions
        "kg_mention_contexts": """
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text,
                           chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '),
                           '\\s+') AS l
                FROM documents),
            m AS (
                SELECT doc_id, l, unnest(l) AS token,
                       generate_subscripts(l, 1) AS i
                FROM tok)
            SELECT doc_id, token AS mention, i::BIGINT AS pos,
                   array_to_string(
                       l[greatest(1, i - 3):least(len(l), i + 3)], ' ')
                       AS context
            FROM m
            WHERE token IN ('spark','hash','join','merge','sort','filter',
                            'window','vector','stream','batch')
            ORDER BY doc_id, pos
        """,
        # CCNet head/middle/tail stratification at the exact interpolated
        # terciles of the unigram-LM score
        "ccnet_buckets": f"""
            WITH tok AS ({_TOKENS}),
            counts AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
            tot AS (SELECT sum(n)::DOUBLE AS n_total FROM counts),
            top AS (SELECT token, n FROM counts
                    ORDER BY n DESC, token LIMIT 20),
            oov AS (SELECT (SELECT n_total FROM tot)
                           - (SELECT sum(n)::DOUBLE FROM top) AS m),
            scored AS (
                SELECT t.doc_id,
                       coalesce(
                           log2(tp.n::DOUBLE / (SELECT n_total FROM tot)),
                           log2((SELECT m FROM oov)
                                / (SELECT n_total FROM tot))) AS lp
                FROM tok t LEFT JOIN top tp USING (token)),
            agg AS (
                SELECT doc_id, count(*) AS n_tokens,
                       round(-avg(lp), 6) AS bits_per_token
                FROM scored GROUP BY doc_id),
            ts AS (
                SELECT quantile_cont(bits_per_token, 1.0/3) AS t1,
                       quantile_cont(bits_per_token, 2.0/3) AS t2
                FROM agg)
            SELECT a.doc_id, a.n_tokens, a.bits_per_token,
                   CASE WHEN a.bits_per_token <= ts.t1 THEN 'head'
                        WHEN a.bits_per_token <= ts.t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM agg a CROSS JOIN ts
            ORDER BY a.doc_id
        """,
        "customer_order_counts": """
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1
        """,
        "orders_with_returns": """
            SELECT o.o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY 1
        """,
        "cross_nation_trade": """
            WITH rows AS (
                SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                       year(l.l_shipdate) AS l_year,
                       l.l_extendedprice * (1 - l.l_discount) AS rev
                FROM lineitem l
                JOIN orders o   ON l.l_orderkey = o.o_orderkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
                WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
                  AND sn.n_name <> cn.n_name
            )
            SELECT supp_nation, cust_nation, l_year,
                   round_even(sum(rev), 2) AS revenue
            FROM rows GROUP BY 1, 2, 3
            ORDER BY round_even(sum(rev), 2) DESC, supp_nation, cust_nation, l_year
            LIMIT 20
        """,
        "top_return_customers": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   round_even(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2, 3
            ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC,
                     c.c_custkey
            LIMIT 20
        """,
        "urgent_by_linestatus": """
            SELECT l.l_linestatus,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_count,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END)::BIGINT AS low_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        "promo_revenue_ratio": """
            SELECT round_even(
                100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN l.l_extendedprice * (1 - l.l_discount)
                                 ELSE 0 END)
                      / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                AS promo_pct
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
              AND l.l_shipdate <  TIMESTAMP '1996-04-01'
        """,
        "large_orders": """
            SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
                   t.sum_qty
            FROM orders o
            JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY 1
                  HAVING sum(l_quantity) > 150.0) t
              ON o.o_orderkey = t.l_orderkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 10
        """,
        "disjunctive_revenue": """
            SELECT round_even(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12'
                   AND l.l_quantity BETWEEN 1 AND 11
                   AND p.p_size BETWEEN 1 AND 5)
               OR (p.p_brand = 'Brand#23'
                   AND l.l_quantity BETWEEN 10 AND 20
                   AND p.p_size BETWEEN 1 AND 10)
               OR (p.p_brand = 'Brand#3'
                   AND l.l_quantity BETWEEN 20 AND 30
                   AND p.p_size BETWEEN 1 AND 15)
        """,
        "rich_idle_customers": """
            WITH a AS (SELECT avg(c_acctbal) AS v FROM customer
                       WHERE c_acctbal > 0)
            SELECT c.c_mktsegment,
                   count(*)::BIGINT AS n_customers,
                   round_even(sum(c.c_acctbal), 2) AS total_bal
            FROM customer c, a
            WHERE c.c_acctbal > a.v
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY 1 ORDER BY 1
        """,
        "sole_return_suppliers": """
            WITH per AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                           AS any_r
                FROM lineitem GROUP BY 1, 2
            ),
            ok AS (
                SELECT l_orderkey FROM per GROUP BY 1
                HAVING count(*) >= 2 AND sum(any_r) = 1
            ),
            hit AS (
                SELECT p.l_suppkey, count(*)::BIGINT AS n_orders
                FROM per p JOIN ok USING (l_orderkey)
                WHERE p.any_r = 1 GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name, h.n_orders
            FROM hit h JOIN supplier s ON s.s_suppkey = h.l_suppkey
            ORDER BY h.n_orders DESC, s.s_suppkey
            LIMIT 10
        """,
        "small_quantity_revenue": """
            SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem l
            JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS lim
                  FROM lineitem GROUP BY 1) t
              ON l.l_partkey = t.l_partkey
            WHERE l.l_quantity < t.lim
        """,
        "user_event_unpivot": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            t(et) AS (VALUES ('click'), ('error'), ('purchase'),
                             ('signup'), ('view')),
            c AS (SELECT user_id, event_type, count(*) AS n
                  FROM events GROUP BY 1, 2)
            SELECT u.user_id, 'n_' || t.et AS cat,
                   coalesce(c.n, 0) AS n
            FROM u CROSS JOIN t
            LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.et
        """,
        "quantity_quantiles_by_flag": """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.25) AS p25,
                   quantile_disc(l_quantity, 0.50) AS p50,
                   quantile_disc(l_quantity, 0.75) AS p75
            FROM lineitem GROUP BY 1
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_view
            FROM events GROUP BY 1
        """,
        "event_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
            SELECT 1::BIGINT AS step, 'view' AS event_type,
                   count(*) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', count(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', count(*) FROM s3
        """,
        "lineitem_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   count(l_quantity) AS n_items
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "monthly_revenue_growth": """
            WITH s AS (
                SELECT year(o_orderdate)::BIGINT AS y,
                       month(o_orderdate)::BIGINT AS m,
                       round_even(sum(o_totalprice), 2) AS revenue
                FROM orders GROUP BY 1, 2)
            SELECT y, m, revenue,
                   coalesce(
                       round_even((revenue - lag(revenue) OVER w)
                             / lag(revenue) OVER w * 100.0, 6),
                       0.0) AS growth_pct
            FROM s WINDOW w AS (ORDER BY y, m)
            ORDER BY y, m
        """,
        "lineitem_cube": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   round_even(sum(l_quantity), 2) AS sum_qty,
                   round_even(sum(l_extendedprice), 2) AS sum_price,
                   count(l_quantity) AS n_items
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "customers_without_orders": """
            SELECT c.c_nationkey::BIGINT AS c_nationkey,
                   count(*) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'F')
            GROUP BY 1
        """,
        "doc_dup_ngram_spans": r"""
            WITH arr AS (
                SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            w AS (
                SELECT doc_id,
                       array_to_string(a[i + 1 : i + 5], ' ') AS win
                FROM arr, unnest(range(0, GREATEST(len(a) - 4, 0))) AS t(i)
                WHERE len(a) >= 5)
            SELECT win AS window, count(*) AS n_occ,
                   count(DISTINCT doc_id) AS n_docs
            FROM w GROUP BY 1 HAVING count(*) >= 2
        """,
        # cross-document duplicated spans: w-gram anchors shared by >= 2
        # docs, merged per doc into maximal runs via gaps-and-islands
        "doc_cross_dup_spans": r"""
            WITH arr AS (
                SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            w AS (
                SELECT doc_id, i,
                       array_to_string(a[i + 1 : i + 5], ' ') AS win
                FROM arr, unnest(range(0, GREATEST(len(a) - 4, 0))) AS t(i)
                WHERE len(a) >= 5),
            shared AS (
                SELECT win FROM w GROUP BY 1
                HAVING count(DISTINCT doc_id) >= 2),
            hits AS (
                SELECT doc_id, i FROM w
                WHERE win IN (SELECT win FROM shared)),
            isl AS (
                SELECT doc_id, i,
                       i - row_number() OVER (
                           PARTITION BY doc_id ORDER BY i) AS grp
                FROM hits)
            SELECT doc_id, min(i) AS span_start, max(i) + 5 AS span_end,
                   count(*) AS n_windows
            FROM isl GROUP BY doc_id, grp
        """,
        # APPLY half of the substring-dedup cut: per-doc removed-token
        # accounting over ALL docs (zero-filled where nothing matched)
        "doc_cut_dup_spans": r"""
            WITH arr AS (
                SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents),
            w AS (
                SELECT doc_id, i,
                       array_to_string(a[i + 1 : i + 5], ' ') AS win
                FROM arr, unnest(range(0, GREATEST(len(a) - 4, 0))) AS t(i)
                WHERE len(a) >= 5),
            shared AS (
                SELECT win FROM w GROUP BY 1
                HAVING count(DISTINCT doc_id) >= 2),
            hits AS (
                SELECT doc_id, i FROM w
                WHERE win IN (SELECT win FROM shared)),
            isl AS (
                SELECT doc_id, i,
                       i - row_number() OVER (
                           PARTITION BY doc_id ORDER BY i) AS grp
                FROM hits),
            sp AS (
                SELECT doc_id, min(i) AS s, max(i) + 5 AS e
                FROM isl GROUP BY doc_id, grp),
            dup AS (
                SELECT doc_id, sum(e - s)::BIGINT AS n_dup_tokens
                FROM sp GROUP BY 1)
            SELECT arr.doc_id, len(arr.a)::BIGINT AS n_tokens,
                   coalesce(dup.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
                   round_even(coalesce(dup.n_dup_tokens, 0)
                              / len(arr.a)::DOUBLE, 6) AS dup_ratio
            FROM arr LEFT JOIN dup USING (doc_id)
        """,
        # cross-source n-gram containment matrix (corpus-slice
        # contamination screen over distinct w-grams)
        "source_ngram_overlap": r"""
            WITH arr AS (
                SELECT source, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents),
            w AS (
                SELECT DISTINCT source,
                       array_to_string(a[i + 1 : i + 5], ' ') AS win
                FROM arr, unnest(range(0, GREATEST(len(a) - 4, 0))) AS t(i)
                WHERE len(a) >= 5),
            tot AS (
                SELECT source, count(*)::BIGINT AS n FROM w GROUP BY 1),
            pr AS (
                SELECT a.source AS s1, b.source AS s2,
                       count(*)::BIGINT AS n_shared
                FROM w a JOIN w b
                  ON a.win = b.win AND a.source <> b.source
                GROUP BY 1, 2)
            SELECT pr.s1, pr.s2, pr.n_shared, tot.n AS n_windows_s1,
                   round_even(pr.n_shared / tot.n::DOUBLE, 6) AS containment
            FROM pr JOIN tot ON tot.source = pr.s1
        """,
        "doc_split_assign": """
            SELECT doc_id,
                   CASE WHEN h < 8 THEN 'train'
                        WHEN h = 8 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT
                             % 10 AS h
                  FROM documents)
        """,
        "events_range_pruned": """
            SELECT count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                         AND TIMESTAMP '2024-01-12 00:00:00'
        """,
        "doc_bm25": r"""
            WITH toks AS (
                SELECT doc_id, t.w AS token
                FROM documents,
                     unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS t(w)
                WHERE t.w <> ''),
            len AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1),
            stats AS (SELECT count(*)::DOUBLE AS n_docs,
                             sum(dl) / count(*) AS avgdl FROM len),
            tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
                   FROM toks WHERE token IN ('spark', 'join', 'stream')
                   GROUP BY 1, 2),
            dft AS (SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            sc AS (
                SELECT tf.doc_id,
                       sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * tf * (1.2 + 1.0)
                           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
                           AS score
                FROM tf JOIN dft USING (token) JOIN len USING (doc_id)
                CROSS JOIN stats
                GROUP BY 1),
            top AS (
                -- top-20 membership on the RAW score (matches the Ray
                -- side); round only for display, then re-order on the
                -- rounded value so both sides sort identically
                SELECT doc_id, score FROM sc
                ORDER BY score DESC, doc_id LIMIT 20)
            SELECT doc_id, round_even(score, 6) AS score
            FROM top ORDER BY round_even(score, 6) DESC, doc_id
        """,
        "word_zipf_fit": r"""
            WITH toks AS (
                SELECT t.w AS token
                FROM documents,
                     unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS t(w)
                WHERE t.w <> ''),
            wc AS (SELECT token, count(*)::BIGINT AS n
                   FROM toks GROUP BY 1
                   ORDER BY n DESC, token LIMIT 100),
            r AS (SELECT ln(row_number() OVER (ORDER BY n DESC, token))
                         AS x,
                         ln(n::DOUBLE) AS y
                  FROM wc),
            mo AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                          sum(x * x) AS sxx, sum(x * y) AS sxy
                   FROM r)
            SELECT n::BIGINT AS n_words,
                   round_even((sxy / n - (sx / n) * (sy / n))
                              / (sxx / n - (sx / n) ^ 2), 6) AS slope,
                   round_even(sy / n - ((sxy / n - (sx / n) * (sy / n))
                              / (sxx / n - (sx / n) ^ 2)) * (sx / n), 6)
                       AS intercept
            FROM mo
        """,
        "lang_token_association": _g2_sql(),
        # silhouette-lite: own-centroid cosine + margin over best competitor
        "embedding_cohesion": """
            WITH ve AS (
                SELECT vec_id, label, i AS j, embedding[i]::DOUBLE AS x
                FROM embeddings,
                     unnest(range(1, len(embedding) + 1)) AS t(i)),
            cent AS (SELECT label, j, avg(x) AS v FROM ve GROUP BY 1, 2),
            cn AS (SELECT label, sqrt(sum(v * v)) AS nv FROM cent GROUP BY 1),
            vn AS (SELECT vec_id, sqrt(sum(x * x)) AS nx FROM ve GROUP BY 1),
            dots AS (SELECT ve.vec_id, c.label AS clabel,
                            sum(ve.x * c.v) AS dp
                     FROM ve JOIN cent c USING (j) GROUP BY 1, 2),
            sims AS (SELECT d.vec_id, d.clabel,
                            d.dp / (vn.nx * cn.nv) AS cos
                     FROM dots d JOIN vn USING (vec_id)
                                 JOIN cn ON cn.label = d.clabel),
            vl AS (SELECT DISTINCT vec_id, label FROM ve),
            own AS (SELECT s.vec_id, s.cos AS own_cos
                    FROM sims s JOIN vl ON vl.vec_id = s.vec_id
                                       AND vl.label = s.clabel),
            oth AS (SELECT s.vec_id, max(s.cos) AS best_other
                    FROM sims s JOIN vl ON vl.vec_id = s.vec_id
                                       AND vl.label <> s.clabel
                    GROUP BY 1),
            per AS (SELECT vl.label, own.own_cos,
                           own.own_cos - oth.best_other AS margin
                    FROM vl JOIN own USING (vec_id)
                            JOIN oth USING (vec_id))
            SELECT label::BIGINT AS label, count(*)::BIGINT AS n_vecs,
                   round_even(avg(own_cos), 6) AS mean_own_cos,
                   round_even(avg(margin), 6) AS mean_margin
            FROM per GROUP BY 1 ORDER BY 1
        """,
        "label_centroids": """
            SELECT label::BIGINT AS label, u.i::BIGINT AS i,
                   round_even(sum(u.v) / count(*), 9) AS mean
            FROM (SELECT label,
                         unnest(embedding)::DOUBLE AS v,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings) u
            GROUP BY label, u.i
            ORDER BY label, u.i
        """,
        "user_first_last_event": """
            WITH r AS (
                SELECT user_id, event_type, ts,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn_d,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events)
            SELECT user_id,
                   max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn_a = 1 THEN ts END) AS first_ts,
                   max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
                   max(CASE WHEN rn_d = 1 THEN ts END) AS last_ts,
                   any_value(n)::BIGINT AS n_events
            FROM r GROUP BY user_id ORDER BY user_id
        """,
        "lang_token_set_ops": r"""
            WITH toks AS (
                SELECT DISTINCT lang, t.w AS token
                FROM documents,
                     unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS t(w)
                WHERE t.w <> '' AND lang IN ('en', 'fr')),
            m AS (
                SELECT token,
                       max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS in_a,
                       max(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS in_b
                FROM toks GROUP BY token)
            SELECT count(*)::BIGINT AS n_union,
                   count(*) FILTER (WHERE in_a = 1 AND in_b = 1)::BIGINT
                       AS n_intersect,
                   count(*) FILTER (WHERE in_a = 1 AND in_b = 0)::BIGINT
                       AS n_a_only,
                   count(*) FILTER (WHERE in_a = 0 AND in_b = 1)::BIGINT
                       AS n_b_only
            FROM m
        """,
        "events_box_pruned": """
            SELECT count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events
            WHERE user_id BETWEEN 3 AND 7
              AND ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
                         AND TIMESTAMP '2024-01-16 00:00:00'
        """,
        "user_cumulative_value": """
            SELECT event_id, user_id, ts,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 4) AS cum_value
            FROM events
        """,
        "doc_tfidf": f"""
            WITH tf AS (
                SELECT doc_id, token, count(*) AS tf
                FROM ({_TOKENS}) GROUP BY 1, 2),
            df AS (
                SELECT token, count(DISTINCT doc_id) AS df
                FROM ({_TOKENS}) GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.token, tf.tf,
                       tf.tf * ln(n.n / df.df) AS tfidf_raw,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf * ln(n.n / df.df) DESC, tf.token
                       ) AS rnk
                FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
            SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
                   round(tfidf_raw, 6) AS tfidf, CAST(rnk AS BIGINT) AS rank
            FROM scored WHERE rnk <= 3
        """,
        # GloVe-style distance-weighted co-occurrence (1/d, d <= 2);
        # weights are dyadic-rational sums so float addition is exact
        "word_cooccur_window": r"""
            WITH arr AS (
                SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            pos AS (
                SELECT doc_id, i, a[i + 1] AS tok
                FROM arr, unnest(range(0, len(a))) AS t(i)),
            pr AS (
                SELECT p1.tok AS w1, p2.tok AS w2,
                       1.0::DOUBLE / (p2.i - p1.i) AS wt
                FROM pos p1 JOIN pos p2
                  ON p1.doc_id = p2.doc_id
                 AND p2.i - p1.i BETWEEN 1 AND 2),
            agg AS (
                SELECT w1, w2, sum(wt) AS weight FROM pr GROUP BY 1, 2)
            SELECT w1, w2, weight FROM agg
            ORDER BY weight DESC, w1, w2 LIMIT 50
        """,
        # frequency-ranked vocabulary: contiguous token ids by
        # (count DESC, token)
        "token_vocab": r"""
            WITH toks AS (
                SELECT t.w AS token
                FROM documents,
                     unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS t(w)
                WHERE t.w <> ''),
            wc AS (SELECT token, count(*)::BIGINT AS n FROM toks GROUP BY 1)
            SELECT row_number() OVER (ORDER BY n DESC, token) - 1
                       AS token_id,
                   token, n
            FROM wc
        """,
        "word_pmi_bigrams": f"""
            WITH arr AS (
                SELECT regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+') AS a
                FROM documents),
            z AS (SELECT unnest(list_zip(a[:-1], a[2:])) AS p FROM arr),
            bi AS (
                -- list_zip pads to the longer list with NULLs: drop the
                -- phantom (last-token, NULL) pairs
                SELECT p[1] AS w1, p[2] AS w2, count(*) AS n
                FROM z WHERE p[1] IS NOT NULL AND p[2] IS NOT NULL
                GROUP BY 1, 2),
            uni AS (SELECT token, count(*) AS n FROM ({_TOKENS}) GROUP BY 1),
            tot AS (SELECT (SELECT sum(n) FROM bi) AS tb,
                           (SELECT sum(n) FROM uni) AS tu)
            SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n,
                   round(ln((b.n / t.tb) /
                             ((u1.n / t.tu) * (u2.n / t.tu))), 6) AS pmi
            FROM bi b
            JOIN uni u1 ON b.w1 = u1.token
            JOIN uni u2 ON b.w2 = u2.token
            CROSS JOIN tot t
            ORDER BY b.n DESC, b.w1, b.w2
            LIMIT 20
        """,
        "q6_discount_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        # token-window chunking: stride 48 = 64 - 16; window i covers
        # tokens [i*48, i*48+64), chunk count = max(1, ceil((n-16)/48))
        "doc_chunks": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents
                WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            sized AS (SELECT doc_id, arr, len(arr) AS n FROM toks),
            exploded AS (
                SELECT doc_id, arr, n,
                       unnest(range(0, GREATEST((n - 16 + 47) // 48, 1)))
                           AS chunk_id
                FROM sized)
            SELECT doc_id,
                   chunk_id,
                   LEAST(64, n - chunk_id * 48)::BIGINT AS n_tokens,
                   array_to_string(arr[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
                       AS chunk_text
            FROM exploded
            ORDER BY doc_id, chunk_id
        """,
        # composed RAG pipeline: the doc_chunks CTE chain + the md5-byte
        # embedding (multimodal_features hex trick) + exact cosine top-k,
        # all recomputed independently
        "rag_retrieval": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            sized AS (SELECT doc_id, arr, len(arr) AS n FROM toks),
            chunks AS (
                SELECT doc_id, arr,
                       unnest(range(0, GREATEST((n - 16 + 47) // 48, 1)))
                           AS chunk_id
                FROM sized),
            ctext AS (
                SELECT doc_id * 100000 + chunk_id AS chunk_key,
                       md5(array_to_string(
                           arr[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' '))
                           AS hx
                FROM chunks),
            cvec AS (
                SELECT chunk_key, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM ctext, unnest(range(0, 8)) AS t(i)),
            q AS (SELECT qid, md5(qt) AS hx FROM (VALUES
                    (0, 'spark join stream'),
                    (1, 'hash table scan'),
                    (2, 'window batch merge')) AS v(qid, qt)),
            qvec AS (
                SELECT qid, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM q, unnest(range(0, 8)) AS t(i)),
            cn AS (SELECT chunk_key, sqrt(sum(x * x)) AS nv
                   FROM cvec GROUP BY 1),
            qn AS (SELECT qid, sqrt(sum(x * x)) AS nv FROM qvec GROUP BY 1),
            dots AS (
                SELECT q.qid, c.chunk_key, sum(q.x * c.x) AS dp
                FROM qvec q JOIN cvec c USING (i)
                GROUP BY 1, 2),
            ranked AS (
                SELECT d.qid, d.chunk_key,
                       d.dp / (qn.nv * cn.nv) AS cosine,
                       row_number() OVER (
                           PARTITION BY d.qid
                           ORDER BY d.dp / (qn.nv * cn.nv) DESC,
                                    d.chunk_key) AS rnk
                FROM dots d JOIN qn ON qn.qid = d.qid
                            JOIN cn ON cn.chunk_key = d.chunk_key)
            SELECT qid::BIGINT AS query_id,
                   (chunk_key // 100000)::BIGINT AS doc_id,
                   (chunk_key % 100000)::BIGINT AS chunk_id,
                   rnk AS rank, round_even(cosine, 6) AS cosine
            FROM ranked WHERE rnk <= 5
            ORDER BY query_id, rank
        """,
        # MMR diversified retrieval: the greedy selection chain unrolled
        # as one single-pick CTE per round
        "rag_mmr": O.mmr_sql(),
        # two-stage retrieval: the rag_retrieval chain proposes top-20, the
        # cross-encoder md5 score (exact dyadic arithmetic) reranks to top-5
        "rag_rerank": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            sized AS (SELECT doc_id, arr, len(arr) AS n FROM toks),
            chunks AS (
                SELECT doc_id, arr,
                       unnest(range(0, GREATEST((n - 16 + 47) // 48, 1)))
                           AS chunk_id
                FROM sized),
            ctext AS (
                SELECT doc_id * 100000 + chunk_id AS chunk_key,
                       array_to_string(
                           arr[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
                           AS chunk_text
                FROM chunks),
            cemb AS (SELECT chunk_key, md5(chunk_text) AS hx FROM ctext),
            cvec AS (
                SELECT chunk_key, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM cemb, unnest(range(0, 8)) AS t(i)),
            q AS (SELECT qid, qt, md5(qt) AS hx FROM (VALUES
                    (0, 'spark join stream'),
                    (1, 'hash table scan'),
                    (2, 'window batch merge')) AS v(qid, qt)),
            qvec AS (
                SELECT qid, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM q, unnest(range(0, 8)) AS t(i)),
            cn AS (SELECT chunk_key, sqrt(sum(x * x)) AS nv
                   FROM cvec GROUP BY 1),
            qn AS (SELECT qid, sqrt(sum(x * x)) AS nv FROM qvec GROUP BY 1),
            dots AS (
                SELECT qv.qid, c.chunk_key, sum(qv.x * c.x) AS dp
                FROM qvec qv JOIN cvec c USING (i)
                GROUP BY 1, 2),
            ranked AS (
                SELECT d.qid, d.chunk_key,
                       row_number() OVER (
                           PARTITION BY d.qid
                           ORDER BY d.dp / (qn.nv * cn.nv) DESC,
                                    d.chunk_key) AS rnk
                FROM dots d JOIN qn ON qn.qid = d.qid
                            JOIN cn ON cn.chunk_key = d.chunk_key),
            cand AS (
                SELECT r.qid, r.chunk_key,
                       md5(q.qt || '|' || ct.chunk_text) AS shx
                FROM ranked r
                JOIN q ON q.qid = r.qid
                JOIN ctext ct ON ct.chunk_key = r.chunk_key
                WHERE r.rnk <= 20),
            ceval AS (
                SELECT qid, chunk_key,
                       sum((strpos('0123456789abcdef',
                                   substring(shx, i + 1, 1)) - 1)
                           * power(16, 7 - i)) / 4294967296.0 AS ce_score
                FROM cand, unnest(range(0, 8)) AS t(i)
                GROUP BY 1, 2),
            rr AS (
                SELECT qid, chunk_key, ce_score,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY ce_score DESC,
                                                   chunk_key) AS rnk2
                FROM ceval)
            SELECT qid::BIGINT AS query_id,
                   (chunk_key // 100000)::BIGINT AS doc_id,
                   (chunk_key % 100000)::BIGINT AS chunk_id,
                   rnk2 AS rank, round_even(ce_score, 6) AS ce_score
            FROM rr WHERE rnk2 <= 5
            ORDER BY query_id, rank
        """,
        # retrieval metrics: the full rag_retrieval CTE chain + AND-semantics
        # term relevance + MRR / NDCG@5 / P@5 recomputed independently
        "rag_retrieval_eval": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS arr
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            sized AS (SELECT doc_id, arr, len(arr) AS n FROM toks),
            chunks AS (
                SELECT doc_id, arr,
                       unnest(range(0, GREATEST((n - 16 + 47) // 48, 1)))
                           AS chunk_id
                FROM sized),
            ctext AS (
                SELECT doc_id * 100000 + chunk_id AS chunk_key,
                       array_to_string(
                           arr[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
                           AS chunk_text
                FROM chunks),
            cemb AS (SELECT chunk_key, md5(chunk_text) AS hx FROM ctext),
            cvec AS (
                SELECT chunk_key, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM cemb, unnest(range(0, 8)) AS t(i)),
            q AS (SELECT qid, md5(qt) AS hx FROM (VALUES
                    (0, 'spark join stream'),
                    (1, 'hash table scan'),
                    (2, 'window batch merge')) AS v(qid, qt)),
            qvec AS (
                SELECT qid, i,
                       ((strpos('0123456789abcdef',
                                substring(hx, i * 2 + 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) / 256.0
                           AS x
                FROM q, unnest(range(0, 8)) AS t(i)),
            cn AS (SELECT chunk_key, sqrt(sum(x * x)) AS nv
                   FROM cvec GROUP BY 1),
            qn AS (SELECT qid, sqrt(sum(x * x)) AS nv FROM qvec GROUP BY 1),
            dots AS (
                SELECT qv.qid, c.chunk_key, sum(qv.x * c.x) AS dp
                FROM qvec qv JOIN cvec c USING (i)
                GROUP BY 1, 2),
            ranked AS (
                SELECT d.qid, d.chunk_key,
                       row_number() OVER (
                           PARTITION BY d.qid
                           ORDER BY d.dp / (qn.nv * cn.nv) DESC,
                                    d.chunk_key) AS rnk
                FROM dots d JOIN qn ON qn.qid = d.qid
                            JOIN cn ON cn.chunk_key = d.chunk_key),
            qterms AS (SELECT qid, unnest(ts) AS term FROM (VALUES
                    (0, ['spark', 'join', 'stream']),
                    (1, ['hash', 'table', 'scan']),
                    (2, ['window', 'batch', 'merge'])) AS v(qid, ts)),
            nq AS (SELECT qid, count(*) AS ntq FROM qterms GROUP BY 1),
            crelcnt AS (
                SELECT c.chunk_key, t.qid, count(*) AS m
                FROM ctext c JOIN qterms t
                  ON contains(' ' || c.chunk_text || ' ',
                              ' ' || t.term || ' ')
                GROUP BY 1, 2),
            crel AS (
                SELECT chunk_key, qid
                FROM crelcnt JOIN nq USING (qid) WHERE m = ntq),
            rcnt AS (SELECT qid, count(*) AS r FROM crel GROUP BY 1),
            retr AS (
                SELECT rk.qid, rk.rnk,
                       CASE WHEN c.chunk_key IS NOT NULL THEN 1 ELSE 0 END
                           AS rel
                FROM ranked rk
                LEFT JOIN crel c
                  ON c.chunk_key = rk.chunk_key AND c.qid = rk.qid
                WHERE rk.rnk <= 5),
            met AS (
                SELECT qid,
                       coalesce(max(CASE WHEN rel = 1
                                         THEN 1.0 / rnk END), 0) AS mrr,
                       sum(rel * 1.0 / log2(rnk + 1)) AS dcg,
                       sum(rel)::DOUBLE / 5 AS p_raw
                FROM retr GROUP BY 1),
            idcg AS (
                SELECT qid, sum(1.0 / log2(i + 1)) AS idcg
                FROM rcnt, unnest(range(1, LEAST(5, r) + 1)) AS t(i)
                GROUP BY 1)
            SELECT m.qid AS query_id,
                   round_even(m.mrr, 6) AS mrr,
                   round_even(CASE WHEN i.idcg > 0 THEN m.dcg / i.idcg
                                   ELSE 0 END, 6) AS ndcg,
                   round_even(m.p_raw, 6) AS p_at_k
            FROM met m LEFT JOIN idcg i USING (qid)
            ORDER BY query_id
        """,
        # benchmark slice = doc_id % 10 == 0; a doc is contaminated when it
        # shares >= 1 distinct word 5-gram with that slice
        "doc_decontaminate": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS ws
                FROM documents
                WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, GREATEST(len(ws) - 5 + 2, 1)),
                           i -> array_to_string(ws[i:i+4], ' '))) AS g
                FROM toks),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
            SELECT doc_id, count(DISTINCT g)::BIGINT AS n_hits
            FROM grams
            WHERE doc_id % 10 <> 0 AND g IN (SELECT g FROM bench)
            GROUP BY doc_id
            ORDER BY doc_id
        """,
        # sequential pattern scrub mirrored stage-by-stage: each pattern is
        # counted on the text as redacted by the previous patterns (RE2 on
        # both sides, so match semantics are identical)
        "doc_pii_scrub": r"""
            WITH s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '[REDACTED]', 'g') AS t1
                FROM documents),
            s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(t1,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
                       regexp_replace(t1,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '[REDACTED]', 'g') AS t2
                FROM s1),
            s3 AS (
                SELECT doc_id, n_email, n_ip,
                       len(regexp_extract_all(t2, '\bspark\b'))::BIGINT AS n_blocked,
                       regexp_replace(t2, '\bspark\b', '[REDACTED]', 'g') AS t3
                FROM s2)
            SELECT doc_id, n_email, n_ip, n_blocked, md5(t3) AS scrub_md5
            FROM s3
            ORDER BY doc_id
        """,
        # Gopher-style repetition signals; all ratios are exact integer
        # divisions so double results match the Ray kernels bit-for-bit
        "doc_repetition": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS ws
                FROM documents
                WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            words AS (SELECT doc_id, unnest(ws) AS w FROM toks),
            wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
            wagg AS (
                SELECT doc_id, sum(c)::BIGINT AS n, max(c) AS mx, count(*) AS d
                FROM wc GROUP BY doc_id),
            bis AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                           i -> ws[i] || ' ' || ws[i+1])) AS b
                FROM toks),
            bc AS (SELECT doc_id, b, count(*) AS c FROM bis GROUP BY doc_id, b),
            bagg AS (
                SELECT doc_id, sum(c) AS nb,
                       sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
                FROM bc GROUP BY doc_id)
            SELECT w.doc_id, w.n AS n_words,
                   w.d / w.n::DOUBLE AS uniq_frac,
                   w.mx / w.n::DOUBLE AS top_word_frac,
                   coalesce(b.dup / b.nb::DOUBLE, 0.0) AS dup_bigram_frac
            FROM wagg w LEFT JOIN bagg b USING (doc_id)
            ORDER BY w.doc_id
        """,
        # per-language cap = minority count; keep the cap rows with the
        # smallest stable hash (first 8 bytes of md5 of the stringified id
        # — functions/hashing.stable_hash_u64), ties broken by the key
        # string exactly like stages/sample._kernel
        "curate_corpus": r"""
            WITH q AS (
                SELECT doc_id, lang, source, text
                FROM documents
                WHERE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                          / length(text) >= 0.8175
                  AND len(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) >= 5
                  AND lang IN ('en', 'de', 'fr')),
            d AS (
                SELECT *, min(doc_id) OVER (PARTITION BY sha256(text))
                          AS keeper
                FROM q),
            k AS (SELECT doc_id, lang, source, text FROM d
                  WHERE doc_id = keeper),
            ev AS (
                SELECT DISTINCT array_to_string(a[i + 1 : i + 5], ' ') AS g
                FROM (SELECT string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                      FROM documents WHERE doc_id % 10 = 0),
                     unnest(range(0, GREATEST(len(a) - 4, 0))) AS t(i)
                WHERE len(a) >= 5),
            kg AS (
                SELECT k.doc_id,
                       array_to_string(a[i + 1 : i + 5], ' ') AS g
                FROM (SELECT doc_id,
                             string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                      FROM k) k,
                     unnest(range(0, GREATEST(len(a) - 4, 0))) AS t(i)
                WHERE len(a) >= 5),
            hits AS (SELECT DISTINCT kg.doc_id
                     FROM kg JOIN ev ON kg.g = ev.g)
            SELECT doc_id, lang, source FROM k
            WHERE doc_id % 10 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM hits)
            ORDER BY doc_id
        """,
        "source_mixture_sample": r"""
            WITH cnt AS (SELECT source, count(*) AS c
                         FROM documents GROUP BY 1),
            tot AS (SELECT sum(c) AS t, sum(power(c, 0.5)) AS z FROM cnt),
            tgt AS (
                SELECT source,
                       LEAST(c, CAST(floor(floor(0.5 * t) * power(c, 0.5) / z)
                                     AS BIGINT)) AS cap
                FROM cnt, tot),
            ranked AS (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT,
                                    doc_id::VARCHAR) AS rn
                FROM documents)
            SELECT r.doc_id, r.source
            FROM ranked r JOIN tgt USING (source)
            WHERE r.rn <= tgt.cap
            ORDER BY source, doc_id
        """,
        "lang_balance_sample": r"""
            WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
            cap AS (SELECT min(c) AS m FROM cnt),
            ranked AS (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT,
                                    doc_id::VARCHAR) AS rn
                FROM documents)
            SELECT doc_id, lang
            FROM ranked, cap
            WHERE rn <= m
            ORDER BY lang, doc_id
        """,
        # two-pass Misra-Gries heavy hitters re-count candidates exactly,
        # so the output equals the plain GROUP-BY answer for the threshold
        "word_heavy_hitters": r"""
            WITH toks AS (
                SELECT t.w AS token
                FROM documents, unnest(regexp_split_to_array(text, '\s+')) AS t(w)
                WHERE t.w <> ''),
            n AS (SELECT count(*) AS total FROM toks)
            SELECT token, count(*)::BIGINT AS n
            FROM toks, n
            GROUP BY token, n.total
            HAVING count(*) >= ceil(0.005 * n.total)
            ORDER BY n DESC, token
        """,
        # histogram-sketch quantiles: the SQL recomputes the identical
        # IEEE expressions (same bin width, same clamp), and bin counts are
        # integers, so equality is exact — no rounding needed
        "price_quantiles_hist": """
            WITH mm AS (
                SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
                       count(l_extendedprice) AS n
                FROM lineitem),
            bins AS (
                SELECT LEAST(GREATEST(
                         floor((l_extendedprice - mm.lo)
                               / ((mm.hi - mm.lo) / 4096.0)), 0), 4095)::BIGINT AS b
                FROM lineitem, mm
                WHERE l_extendedprice IS NOT NULL),
            cum AS (
                SELECT b, sum(c) OVER (ORDER BY b) AS cum
                FROM (SELECT b, count(*) AS c FROM bins GROUP BY b)),
            pick AS (
                SELECT t.q,
                       (SELECT min(b) FROM cum
                        WHERE cum >= ceil(t.q * mm.n)) AS b
                FROM (VALUES (0.25),(0.5),(0.75),(0.9),(0.99)) AS t(q), mm)
            SELECT
              max(CASE WHEN q = 0.25 THEN mm.lo + (b + 1) * ((mm.hi - mm.lo) / 4096.0) END) AS q25,
              max(CASE WHEN q = 0.5  THEN mm.lo + (b + 1) * ((mm.hi - mm.lo) / 4096.0) END) AS q50,
              max(CASE WHEN q = 0.75 THEN mm.lo + (b + 1) * ((mm.hi - mm.lo) / 4096.0) END) AS q75,
              max(CASE WHEN q = 0.9  THEN mm.lo + (b + 1) * ((mm.hi - mm.lo) / 4096.0) END) AS q90,
              max(CASE WHEN q = 0.99 THEN mm.lo + (b + 1) * ((mm.hi - mm.lo) / 4096.0) END) AS q99
            FROM pick, mm
        """,
        "lineitem_profile": """
            SELECT col, count(*)::BIGINT AS n,
                   sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
                   min(v) AS min, max(v) AS max
            FROM (
                SELECT 'l_orderkey' AS col, l_orderkey::DOUBLE AS v FROM lineitem
                UNION ALL SELECT 'l_quantity', l_quantity FROM lineitem
                UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
                UNION ALL SELECT 'l_discount', l_discount FROM lineitem
                UNION ALL SELECT 'l_tax', l_tax FROM lineitem
            )
            GROUP BY col ORDER BY col
        """,
        "distinct_counts": """
            SELECT count(DISTINCT user_id) AS n_users,
                   count(DISTINCT event_type) AS n_event_types
            FROM events
        """,
        "events_incremental_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY 1, 2
        """,
        "rolling_active_users": """
            WITH hp AS (
                SELECT DISTINCT date_trunc('hour', ts) AS h, user_id AS u
                FROM events),
            ex AS (
                SELECT h + to_hours(t.k) AS wh, u
                FROM hp, range(0, 3) AS t(k))
            SELECT wh, count(DISTINCT u)::BIGINT AS n_users
            FROM ex GROUP BY 1 ORDER BY 1
        """,
        "signup_purchase_users": """
            WITH s AS (SELECT user_id, count(*)::BIGINT AS n_signup
                       FROM events WHERE event_type = 'signup' GROUP BY 1),
            p AS (SELECT user_id, count(*)::BIGINT AS n_purchase
                  FROM events WHERE event_type = 'purchase' GROUP BY 1)
            SELECT coalesce(s.user_id, p.user_id) AS user_id,
                   coalesce(s.n_signup, 0)::BIGINT AS n_signup,
                   coalesce(p.n_purchase, 0)::BIGINT AS n_purchase
            FROM s FULL OUTER JOIN p ON s.user_id = p.user_id
        """,
        "event_props_stats": """
            WITH x AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events)
            SELECT event_type, count(k)::BIGINT AS n,
                   sum(k)::BIGINT AS sum_k,
                   round_even(sum(k) / count(k), 6) AS avg_k
            FROM x GROUP BY 1 ORDER BY 1
        """,
        "user_event_gaps": """
            SELECT event_id, user_id,
                   coalesce(
                       date_diff('microsecond',
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id),
                           ts),
                       -1)::BIGINT AS gap_us
            FROM events
        """,
        "value_quantiles_cont_by_type": """
            SELECT event_type,
                   round_even(quantile_cont(value, 0.25), 9) AS p25,
                   round_even(quantile_cont(value, 0.5), 9) AS p50,
                   round_even(quantile_cont(value, 0.75), 9) AS p75
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "forecast_revenue": """
            SELECT round_even(sum(l_extendedprice * l_discount), 2)
                       AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "top_supplier_revenue": """
            WITH r AS (
                SELECT l_suppkey,
                       round_even(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-04-01'
                GROUP BY 1)
            SELECT l_suppkey, total_revenue FROM r
            WHERE total_revenue = (SELECT max(total_revenue) FROM r)
            ORDER BY l_suppkey
        """,
        "value_winsorized": """
            WITH q AS (
                SELECT quantile_cont(value, 0.05) AS lo,
                       quantile_cont(value, 0.95) AS hi
                FROM events)
            SELECT event_type, count(*)::BIGINT AS n,
                   count(*) FILTER (
                       WHERE value < (SELECT lo FROM q))::BIGINT
                       AS n_clipped_low,
                   count(*) FILTER (
                       WHERE value > (SELECT hi FROM q))::BIGINT
                       AS n_clipped_high,
                   round_even(
                       sum(greatest((SELECT lo FROM q),
                                    least((SELECT hi FROM q), value)))
                       / count(*), 6) AS avg_winsorized
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "value_outliers": """
            WITH m AS (
                SELECT event_type, count(*)::BIGINT AS n,
                       sum(value) / count(*) AS mu,
                       sqrt(sum(value * value) / count(*)
                            - (sum(value) / count(*))^2) AS sd
                FROM events GROUP BY 1)
            SELECT e.event_type, any_value(m.n) AS n,
                   round_even(any_value(m.mu), 6) AS mean_value,
                   round_even(any_value(m.sd), 6) AS std_value,
                   count(*) FILTER (
                       WHERE abs((e.value - m.mu) / m.sd) > 2)::BIGINT
                       AS n_outliers
            FROM events e JOIN m USING (event_type)
            GROUP BY e.event_type
            ORDER BY e.event_type
        """,
        "lineitem_regression": """
            WITH m AS (
                SELECT l_returnflag,
                       count(*)::BIGINT AS n,
                       sum(l_quantity) AS sx,
                       sum(l_extendedprice) AS sy,
                       sum(l_quantity * l_quantity) AS sxx,
                       sum(l_extendedprice * l_extendedprice) AS syy,
                       sum(l_quantity * l_extendedprice) AS sxy
                FROM lineitem GROUP BY 1),
            d AS (
                SELECT l_returnflag, n,
                       sxy / n - (sx / n) * (sy / n) AS cov,
                       sxx / n - (sx / n) ^ 2 AS var_x,
                       syy / n - (sy / n) ^ 2 AS var_y,
                       sx / n AS mux, sy / n AS muy
                FROM m)
            SELECT l_returnflag, n,
                   round_even(cov / sqrt(var_x * var_y), 6) AS corr_qty_price,
                   round_even(cov, 6) AS covar_pop,
                   round_even(cov / var_x, 6) AS regr_slope,
                   round_even(muy - (cov / var_x) * mux, 6) AS regr_intercept
            FROM d ORDER BY l_returnflag
        """,
        "user_value_rank": """
            SELECT event_id,
                   user_id,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY value DESC, event_id)::BIGINT AS rn,
                   rank() OVER (
                       PARTITION BY user_id
                       ORDER BY value DESC)::BIGINT AS rnk,
                   dense_rank() OVER (
                       PARTITION BY user_id
                       ORDER BY value DESC)::BIGINT AS drnk
            FROM events
            ORDER BY event_id
        """,
        "doc_inverted_index": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL})
            SELECT token AS word, count(*)::BIGINT AS df,
                   string_agg(doc_id::VARCHAR, '|' ORDER BY doc_id)
                       AS postings
            FROM m GROUP BY token ORDER BY word
        """,
        "daily_top_users": """
            WITH c AS (
                SELECT ts::DATE AS day, user_id,
                       count(*)::BIGINT AS n_events
                FROM events GROUP BY 1, 2)
            SELECT strftime(day, '%Y-%m-%d') AS date,
                   row_number() OVER (
                       PARTITION BY day
                       ORDER BY n_events DESC, user_id)::BIGINT AS rank,
                   user_id, n_events
            FROM c
            QUALIFY rank <= 3
            ORDER BY date, rank
        """,
        "customer_pareto": """
            WITH c AS (
                SELECT o_custkey,
                       sum(round_even(o_totalprice * 100, 0)::BIGINT)
                           AS cents
                FROM orders GROUP BY 1),
            r AS (
                SELECT cents,
                       row_number() OVER (
                           ORDER BY cents DESC, o_custkey) AS rn
                FROM c),
            cum AS (
                SELECT rn, sum(cents) OVER (ORDER BY rn) AS cum FROM r),
            t AS (SELECT sum(cents) AS total, count(*) AS n FROM c)
            SELECT (SELECT min(rn) FROM cum, t
                    WHERE 5 * cum >= 4 * t.total)::BIGINT AS n_customers_80,
                   t.n::BIGINT AS n_customers,
                   round_even(t.total / 100.0, 2) AS revenue_total
            FROM t
        """,
        "nation_revenue_share": """
            WITH per AS (
                SELECT n.n_name, sum(o.o_totalprice) AS revenue
                FROM orders o
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation n ON n.n_nationkey = c.c_nationkey
                GROUP BY 1)
            SELECT n_name, round_even(revenue, 2) AS revenue,
                   round_even(revenue / sum(revenue) OVER (), 9) AS share
            FROM per
            ORDER BY n_name
        """,
        "embedding_covariance": """
            WITH e AS (
                SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings)
            SELECT a.i::BIGINT AS i, b.i::BIGINT AS j,
                   round_even(
                       sum(a.x * b.x) / count(*)
                       - (sum(a.x) / count(*)) * (sum(b.x) / count(*)),
                       9) AS cov
            FROM e a JOIN e b USING (vec_id)
            GROUP BY a.i, b.i
            ORDER BY i, j
        """,
        "embedding_norms": """
            SELECT vec_id,
                   sqrt(sum((x::DOUBLE) * (x::DOUBLE))) AS l2_norm,
                   max(abs(x::DOUBLE)) AS max_abs,
                   count(*)::BIGINT AS dim
            FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
            GROUP BY vec_id
            ORDER BY vec_id
        """,
        "lineitem_constraints": """
            WITH t AS (SELECT count(*)::BIGINT AS n FROM lineitem)
            SELECT 'accepted_values(l_returnflag)' AS rule,
                   (SELECT count(*) FROM lineitem
                    WHERE l_returnflag IS NULL
                       OR l_returnflag NOT IN ('A','N','R'))::BIGINT
                       AS violations,
                   n AS n_checked FROM t
            UNION ALL
            SELECT 'in_range(l_discount,0,0.1)',
                   (SELECT count(*) FROM lineitem
                    WHERE l_discount IS NULL
                       OR l_discount < 0 OR l_discount > 0.1)::BIGINT,
                   n FROM t
            UNION ALL
            SELECT 'in_range(l_quantity,1,40)',
                   (SELECT count(*) FROM lineitem
                    WHERE l_quantity IS NULL
                       OR l_quantity < 1 OR l_quantity > 40)::BIGINT,
                   n FROM t
            UNION ALL
            SELECT 'not_null(l_orderkey)',
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IS NULL)::BIGINT,
                   n FROM t
            UNION ALL
            SELECT 'unique(l_orderkey,l_linenumber)',
                   (SELECT count(*) - count(DISTINCT (l_orderkey,
                                                      l_linenumber))
                    FROM lineitem)::BIGINT,
                   n FROM t
            ORDER BY rule
        """,
        "peak_concurrency": """
            WITH flags AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events),
            sids AS (
                SELECT user_id, ts,
                       sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flags),
            sessions AS (
                SELECT user_id, sid, min(ts) AS start_ts, max(ts) AS end_ts
                FROM sids GROUP BY 1, 2),
            pts AS (
                SELECT epoch_us(start_ts) * 2 AS k, 1 AS delta FROM sessions
                UNION ALL
                SELECT epoch_us(end_ts) * 2 + 1, -1 FROM sessions),
            run AS (
                SELECT delta,
                       sum(delta) OVER (ORDER BY k) AS c
                FROM pts)
            SELECT max(c) FILTER (WHERE delta = 1)::BIGINT
                       AS peak_concurrency,
                   count(*) FILTER (WHERE delta = 1)::BIGINT AS n_sessions
            FROM run
        """,
        "cohort_retention": """
            WITH f AS (
                SELECT user_id, min(ts::DATE) AS cohort
                FROM events GROUP BY 1),
            d AS (
                SELECT DISTINCT user_id, ts::DATE AS day FROM events)
            SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
                   (d.day - f.cohort)::BIGINT AS age_days,
                   count(*)::BIGINT AS n_users
            FROM d JOIN f USING (user_id)
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "user_event_paths": """
            SELECT user_id,
                   string_agg(event_type, '->'
                              ORDER BY ts, event_id) AS path,
                   count(*)::BIGINT AS path_len
            FROM events
            GROUP BY user_id
            ORDER BY user_id
        """,
        "event_type_transitions": """
            SELECT prev_type, event_type, count(*)::BIGINT AS n
            FROM (
                SELECT lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_type,
                       event_type
                FROM events)
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
            ORDER BY prev_type, event_type
        """,
        "user_final_state": """
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_type, value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
               AND event_type <> 'click'
            ORDER BY user_id
        """,
        "lineitem_checksum": """
            SELECT count(*)::BIGINT AS n_rows,
                   (sum(
                        ('0x' || substr(md5(
                             l_orderkey::VARCHAR || '|' ||
                             l_linenumber::VARCHAR || '|' ||
                             l_returnflag), 1, 16))::UBIGINT::HUGEINT
                    ) % 18446744073709551616::HUGEINT)::VARCHAR AS checksum
            FROM lineitem
        """,
        "price_quantiles_cont": """
            SELECT quantile_cont(l_extendedprice, 0.25) AS q25,
                   quantile_cont(l_extendedprice, 0.5) AS q50,
                   quantile_cont(l_extendedprice, 0.75) AS q75,
                   quantile_cont(l_extendedprice, 0.9) AS q90
            FROM lineitem
        """,
        "supplier_name_clusters": """
            WITH RECURSIVE pairs AS (
                SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
                FROM supplier a JOIN supplier b
                  ON a.s_suppkey < b.s_suppkey
                WHERE levenshtein(a.s_name, b.s_name) <= 1),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
            r(n, x) AS (
                SELECT DISTINCT a, a FROM edges
                UNION
                SELECT r.n, e.b FROM r JOIN edges e ON e.a = r.x)
            SELECT n AS node, min(x)::BIGINT AS component
            FROM r GROUP BY n ORDER BY node
        """,
        "supplier_name_neardup": """
            SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
                   levenshtein(a.s_name, b.s_name)::BIGINT AS dist
            FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
            WHERE levenshtein(a.s_name, b.s_name) <= 1
            ORDER BY id_a, id_b
        """,
        "user_moving_avg": """
            SELECT event_id, user_id,
                   avg(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN 2 PRECEDING
                                             AND CURRENT ROW) AS moving_avg
            FROM events
            ORDER BY event_id
        """,
        # PSI drift monitor: equal-width bins of the global value range,
        # reference = ts < cutoff, identical bin/ratio/ln arithmetic
        "events_drift_psi": """
            WITH mm AS (SELECT min(value) AS lo, max(value) AS hi
                        FROM events),
            b AS (SELECT LEAST(CAST(floor((value - lo)
                                          / ((hi - lo) / 10.0)) AS BIGINT),
                               9) AS bin,
                         CASE WHEN ts >= TIMESTAMP '2024-01-15'
                              THEN 1 ELSE 0 END AS cur
                  FROM events, mm),
            cc AS (SELECT bin, sum(1 - cur)::DOUBLE AS n_ref,
                          sum(cur)::DOUBLE AS n_cur
                   FROM b GROUP BY 1),
            -- all 10 bins present even when a bin is empty in both slices
            c AS (SELECT i AS bin, coalesce(cc.n_ref, 0) AS n_ref,
                         coalesce(cc.n_cur, 0) AS n_cur
                  FROM range(0, 10) t(i) LEFT JOIN cc ON cc.bin = t.i),
            t AS (SELECT sum(n_ref) AS sr, sum(n_cur) AS sc FROM c),
            -- Laplace smoothing (+0.5 per bin), matching the Ray side
            p AS (SELECT bin, (n_ref + 0.5) / (sr + 5.0) AS p_ref,
                         (n_cur + 0.5) / (sc + 5.0) AS p_cur
                  FROM c, t),
            pt AS (SELECT bin, p_ref, p_cur,
                          (p_cur - p_ref) * ln(p_cur / p_ref) AS psi_term
                   FROM p),
            tot AS (SELECT sum(psi_term) AS s FROM pt)
            SELECT bin, round_even(p_ref, 6) AS p_ref,
                   round_even(p_cur, 6) AS p_cur,
                   round_even(psi_term, 6) AS psi_term,
                   round_even(s, 6) AS psi_total
            FROM pt, tot ORDER BY bin
        """,
        # market-basket pair mining: distinct part pairs per order basket,
        # support-count threshold
        "part_copurchase": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
                   count(*)::BIGINT AS n_orders
            FROM b a JOIN b c
              ON a.l_orderkey = c.l_orderkey
             AND a.l_partkey < c.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 3
            ORDER BY part_a, part_b
        """,
        # time-grid densification with forward-fill (as-of inner semantics,
        # ties at one ts resolve to the highest event_id)
        "user_value_resampled": """
            WITH mm AS (SELECT date_trunc('hour', min(ts)) AS lo,
                               max(ts) AS hi FROM events),
            grid AS (SELECT unnest(generate_series(lo, hi,
                                   INTERVAL 6 HOUR)) AS grid_ts FROM mm),
            users AS (SELECT DISTINCT user_id FROM events),
            g AS (SELECT user_id, grid_ts FROM users CROSS JOIN grid),
            j AS (SELECT g.user_id, g.grid_ts, e.value,
                         row_number() OVER (
                             PARTITION BY g.user_id, g.grid_ts
                             ORDER BY e.ts DESC, e.event_id DESC) AS rn
                  FROM g JOIN events e
                    ON e.user_id = g.user_id AND e.ts <= g.grid_ts)
            SELECT user_id, grid_ts, value FROM j WHERE rn = 1
            ORDER BY user_id, grid_ts
        """,
        # quantity-weighted exact median (lower-median convention)
        "price_weighted_median": """
            WITH g AS (SELECT l_extendedprice AS s,
                              sum(l_quantity)::DOUBLE AS w
                       FROM lineitem GROUP BY 1),
            t AS (SELECT sum(w) AS tw FROM g),
            c AS (SELECT s, sum(w) OVER (ORDER BY s) AS cum FROM g)
            SELECT round_even(min(s), 2) AS weighted_median,
                   (SELECT tw FROM t)::BIGINT AS total_weight
            FROM c, t WHERE cum >= tw / 2.0
        """,
        # shuffle-key skew diagnostics: sum-decomposable statistics only
        "events_key_skew": """
            WITH c AS (SELECT user_id, count(*)::DOUBLE AS n
                       FROM events GROUP BY 1),
            t AS (SELECT count(*) AS keys, sum(n) AS rows_, max(n) AS mx,
                         sum(n * n) AS sq, sum(n * ln(n)) AS nlogn
                  FROM c)
            SELECT keys::BIGINT AS n_keys, rows_::BIGINT AS n_rows,
                   round_even(mx / rows_, 6) AS top_share,
                   round_even(sq / (rows_ * rows_), 6) AS hhi,
                   round_even(ln(rows_) - nlogn / rows_, 6) AS entropy
            FROM t
        """,
        # chi-square independence: contingency grid with zero cells kept
        "events_type_dow_chi2": """
            WITH o AS (SELECT event_type, isodow(ts) AS dow,
                              count(*)::DOUBLE AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, sum(n) AS rn FROM o GROUP BY 1),
            c AS (SELECT dow, sum(n) AS cn FROM o GROUP BY 1),
            t AS (SELECT sum(n) AS tot FROM o),
            grid AS (SELECT r.event_type, c.dow, r.rn, c.cn
                     FROM r CROSS JOIN c),
            cells AS (
                SELECT g.event_type, g.dow, coalesce(o.n, 0) AS n,
                       g.rn * g.cn / tot AS e
                FROM grid g
                LEFT JOIN o ON o.event_type = g.event_type
                           AND o.dow = g.dow, t),
            s AS (SELECT sum((n - e) * (n - e) / e) AS chi2 FROM cells),
            dims AS (SELECT (SELECT count(*) FROM r) AS nr,
                            (SELECT count(*) FROM c) AS nc)
            SELECT round_even(s.chi2, 6) AS chi2,
                   ((nr - 1) * (nc - 1))::BIGINT AS dof,
                   (SELECT tot FROM t)::BIGINT AS n
            FROM s, dims
        """,
        # exact two-sample KS over the distinct-value cumulative fractions
        "events_value_ks": """
            WITH t AS (
                SELECT value AS s,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                           AS a,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                           AS b
                FROM events
                WHERE event_type IN ('purchase', 'click')),
            g AS (SELECT s, sum(a)::DOUBLE AS na, sum(b)::DOUBLE AS nb
                  FROM t GROUP BY 1),
            tot AS (SELECT sum(na) AS sa, sum(nb) AS sb FROM g),
            c AS (SELECT s, sum(na) OVER (ORDER BY s) AS ca,
                         sum(nb) OVER (ORDER BY s) AS cb
                  FROM g)
            SELECT sa::BIGINT AS n_a, sb::BIGINT AS n_b,
                   round_even(max(abs(ca / sa - cb / sb)), 6) AS ks_d
            FROM c, tot GROUP BY sa, sb
        """,
        # stream-stream windowed join: (error, click) pairs within ±5 min
        # per user, inclusive band edges
        "error_click_correlation": """
            WITH e AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'error'),
            c AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'click'),
            p AS (SELECT e.user_id, count(*) AS n_pairs
                  FROM e JOIN c ON c.user_id = e.user_id
                               AND c.ts BETWEEN e.ts - INTERVAL 5 MINUTE
                                            AND e.ts + INTERVAL 5 MINUTE
                  GROUP BY 1),
            ec AS (SELECT user_id, count(*) AS n_errors FROM e GROUP BY 1),
            cc AS (SELECT user_id, count(*) AS n_clicks FROM c GROUP BY 1)
            SELECT ec.user_id, ec.n_errors::BIGINT AS n_errors,
                   coalesce(cc.n_clicks, 0)::BIGINT AS n_clicks,
                   coalesce(p.n_pairs, 0)::BIGINT AS n_pairs
            FROM ec LEFT JOIN cc USING (user_id)
                    LEFT JOIN p USING (user_id)
            ORDER BY user_id
        """,
        # streaming watermark accounting: running event-time max over the
        # arrival order (event_id), late = below watermark - 10 min
        "events_late_arrivals": """
            WITH w AS (
                SELECT event_type, ts,
                       max(ts) OVER (ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS wm
                FROM events),
            f AS (
                SELECT event_type,
                       CASE WHEN wm IS NOT NULL
                                 AND ts < wm - INTERVAL 10 MINUTE
                            THEN 1 ELSE 0 END AS late,
                       CASE WHEN wm IS NOT NULL
                                 AND ts < wm - INTERVAL 10 MINUTE
                            THEN (date_diff('microsecond', ts, wm)
                                  - 600000000) // 1000000
                            ELSE 0 END AS lateness_s
                FROM w)
            SELECT event_type,
                   sum(late)::BIGINT AS n_late,
                   count(*)::BIGINT AS n_total,
                   max(lateness_s)::BIGINT AS max_lateness_s
            FROM f GROUP BY 1 ORDER BY 1
        """,
        # E-S weighted sample pushed into the join: u from the md5 key hash
        # (weighted_hash_top_n parity), score u^(1/revenue), top-n
        "sample_join_weighted": r"""
            WITH j AS (
                SELECT o.o_custkey, l.l_orderkey, l.l_linenumber,
                       l.l_extendedprice * (1 - l.l_discount) AS revenue
                FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
            sc AS (
                SELECT *,
                       power(
                           ((('0x' || substr(md5(
                               l_orderkey::VARCHAR || chr(31)
                               || l_linenumber::VARCHAR), 1, 16))::UBIGINT
                             ::DOUBLE) + 0.5)
                           / 18446744073709551616.0,
                           1.0 / revenue) AS s
                FROM j WHERE revenue > 0)
            SELECT o_custkey, l_orderkey, l_linenumber,
                   round_even(revenue, 2) AS revenue
            FROM (SELECT * FROM sc
                  ORDER BY s DESC, l_orderkey, l_linenumber LIMIT 25)
            ORDER BY l_orderkey, l_linenumber
        """,
        "events_score_auc": """
            WITH t AS (
                SELECT value AS s,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                           AS y
                FROM events),
            g AS (SELECT s, sum(y)::DOUBLE AS np,
                         (count(*) - sum(y))::DOUBLE AS nn
                  FROM t GROUP BY 1),
            o AS (SELECT s, np, nn,
                         coalesce(sum(nn) OVER (ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS cneg
                  FROM g),
            tot AS (SELECT sum(np) AS p, sum(nn) AS n FROM g)
            SELECT p::BIGINT AS n_pos, n::BIGINT AS n_neg,
                   round_even(sum(np * (cneg + 0.5 * nn)) / (p * n), 6)
                       AS auc
            FROM o CROSS JOIN tot GROUP BY p, n
        """,
        "user_range_window": """
            SELECT event_id, user_id,
                   round_even(sum(value) OVER w, 4) AS range_sum,
                   count(*) OVER w AS n_in_range
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                   AND CURRENT ROW)
            ORDER BY event_id
        """,
        "events_global_rank": """
            SELECT event_id,
                   row_number() OVER (ORDER BY ts, event_id)::BIGINT AS rn,
                   rank() OVER (ORDER BY ts)::BIGINT AS rnk,
                   dense_rank() OVER (ORDER BY ts)::BIGINT AS drnk,
                   percent_rank() OVER (ORDER BY ts) AS pr,
                   cume_dist() OVER (ORDER BY ts) AS cd,
                   ntile(7) OVER (ORDER BY ts, event_id)::BIGINT AS tile
            FROM events
            ORDER BY event_id
        """,
        "quantity_quantiles": """
            SELECT CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS q25,
                   CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS q50,
                   CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE) AS q75,
                   CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) AS q90
            FROM lineitem
        """,
        "doc_quality": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS BIGINT) AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / length(text) AS alpha_ratio,
                   length(regexp_replace(text, '[A-Za-z0-9_\\s]', '', 'g'))
                       / length(text) AS punct_ratio
            FROM documents
        """,
        "doc_mentions": f"""
            SELECT doc_id, token AS mention, count(*) AS n
            FROM ({_TOKENS})
            WHERE token IN {_DOC_VOCAB_SQL}
            GROUP BY 1, 2
        """,
        "cooccur_edges": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL})
            SELECT a.token AS subj, b.token AS obj, count(*) AS n_docs
            FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2
        """,
        "kg_negative_samples": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            e AS (
                SELECT a.token AS subj, b.token AS obj
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2
                HAVING count(*) >= 325),
            ents AS (
                SELECT entity,
                       row_number() OVER (ORDER BY entity) - 1 AS idx
                FROM (SELECT subj AS entity FROM e
                      UNION SELECT obj FROM e)),
            n AS (SELECT count(*)::UBIGINT AS c FROM ents),
            cand AS (
                SELECT e.subj, t.j::BIGINT AS slot,
                       CAST(('0x' || substr(md5(
                           e.subj || '|cooccurs_with|' || e.obj
                                  || '|' || t.j::VARCHAR), 1, 16))::UBIGINT
                            % n.c AS BIGINT) AS idx
                FROM e, range(3) t(j), n),
            neg AS (
                SELECT c.subj, en.entity AS neg_obj, c.slot
                FROM cand c JOIN ents en USING (idx))
            SELECT subj, 'cooccurs_with' AS pred, neg_obj, slot
            FROM neg
            WHERE neg_obj <> subj
              AND NOT EXISTS (
                  SELECT 1 FROM e
                  WHERE (e.subj = neg.subj AND e.obj = neg.neg_obj)
                     OR (e.subj = neg.neg_obj AND e.obj = neg.subj))
            ORDER BY subj, neg_obj, slot
        """,
        "kg_bfs_levels": f"""
            WITH RECURSIVE m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            e AS (
                SELECT a.token AS s, b.token AS o
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            bidir AS (SELECT s, o FROM e UNION ALL SELECT o, s FROM e),
            bfs(node, dist) AS (
                SELECT 'batch', 0
                UNION
                SELECT bd.o, bfs.dist + 1
                FROM bfs JOIN bidir bd ON bd.s = bfs.node
                WHERE bfs.dist < 32
            )
            SELECT node, min(dist)::BIGINT AS dist
            FROM bfs GROUP BY 1 ORDER BY 1
        """,
        "kg_triangles": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            edges AS (
                SELECT a.token AS s, b.token AS o
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            tri AS (
                SELECT e1.s AS a, e1.o AS b, e2.o AS c
                FROM edges e1
                JOIN edges e2 ON e2.s = e1.o
                JOIN edges e3 ON e3.s = e1.s AND e3.o = e2.o),
            corners AS (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
            SELECT node, count(*)::BIGINT AS n_triangles
            FROM corners GROUP BY 1 ORDER BY 1
        """,
        "kg_clustering_coeff": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            edges AS (
                SELECT a.token AS s, b.token AS o
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            bidir AS (
                SELECT s AS node, o AS nbr FROM edges
                UNION ALL SELECT o, s FROM edges),
            deg AS (SELECT node, count(*)::BIGINT AS degree
                    FROM bidir GROUP BY 1),
            tri AS (
                SELECT e1.s AS a, e1.o AS b, e2.o AS c
                FROM edges e1
                JOIN edges e2 ON e2.s = e1.o
                JOIN edges e3 ON e3.s = e1.s AND e3.o = e2.o),
            corners AS (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri),
            tcnt AS (SELECT node, count(*)::BIGINT AS n_triangles
                     FROM corners GROUP BY 1)
            SELECT d.node, d.degree,
                   COALESCE(t.n_triangles, 0)::BIGINT AS n_triangles,
                   CASE WHEN d.degree >= 2
                        THEN round_even(2.0 * COALESCE(t.n_triangles, 0)
                                        / (d.degree * (d.degree - 1)), 6)
                        ELSE 0.0 END AS clustering
            FROM deg d LEFT JOIN tcnt t USING (node)
            ORDER BY d.node
        """,
        "kg_two_hop_paths": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            edges AS (
                SELECT a.token AS s, b.token AS o
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            bidir AS (
                SELECT s AS endpoint, o AS mid FROM edges
                UNION ALL SELECT o, s FROM edges)
            SELECT x.endpoint AS src, y.endpoint AS dst,
                   count(*) AS n_paths
            FROM bidir x JOIN bidir y
              ON x.mid = y.mid AND x.endpoint < y.endpoint
            GROUP BY 1, 2
        """,
        "er_blocking_pairs": r"""
            WITH arr AS (
                SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+') AS a
                FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
            tb AS (
                SELECT DISTINCT doc_id,
                       array_to_string(a[i + 1 : i + 3], ' ') AS key
                FROM arr, unnest(range(0, GREATEST(len(a) - 2, 0))) AS t(i)
                WHERE len(a) >= 3),
            sizes AS (SELECT key, count(*) AS c FROM tb GROUP BY 1),
            kept AS (
                SELECT tb.doc_id, tb.key
                FROM tb JOIN sizes USING (key)
                WHERE c BETWEEN 2 AND 10)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS cbs
            FROM kept a JOIN kept b
              ON a.key = b.key AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "dedup_keep_best": r"""
            WITH RECURSIVE words AS (
                SELECT doc_id, w, i
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w,
                             generate_subscripts(
                                 string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'), 1) AS i
                      FROM documents)
                WHERE w <> ''),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM words a
                JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS m
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2),
            prs AS (
                SELECT id_a, id_b FROM inter
                JOIN cnt ca ON ca.doc_id = id_a
                JOIN cnt cb ON cb.doc_id = id_b
                WHERE m::DOUBLE / (ca.n + cb.n - m) >= 0.5),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM prs
                UNION SELECT id_b, id_a FROM prs),
            r(n, x) AS (
                SELECT DISTINCT a, a FROM edges
                UNION
                SELECT r.n, e.b FROM r JOIN edges e ON e.a = r.x),
            comp AS (SELECT n AS node, min(x) AS component FROM r GROUP BY n),
            q AS (
                SELECT doc_id AS node,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                           / length(text) AS alpha_ratio
                FROM documents),
            ranked AS (
                SELECT comp.component, comp.node, q.alpha_ratio,
                       row_number() OVER (
                           PARTITION BY comp.component
                           ORDER BY q.alpha_ratio DESC, comp.node) AS rn,
                       count(*) OVER (PARTITION BY comp.component)
                           AS n_members
                FROM comp JOIN q USING (node))
            SELECT component, node AS kept_doc,
                   alpha_ratio AS best_alpha,
                   n_members::BIGINT AS n_members
            FROM ranked WHERE rn = 1 ORDER BY component
        """,
        "er_entity_clusters": f"""
            WITH RECURSIVE {_ER_CTES}
            SELECT n AS node, min(x) AS component
            FROM r GROUP BY n ORDER BY node
        """,
        "er_golden_records": f"""
            WITH RECURSIVE {_ER_CTES},
            labels AS (SELECT n AS node, min(x) AS component
                       FROM r GROUP BY n),
            memb AS (
                SELECT l.component, d.lang, d.source, d.n_chars
                FROM labels l JOIN documents d ON d.doc_id = l.node),
            lw AS (
                SELECT component, lang FROM (
                    SELECT component, lang, count(*) AS c
                    FROM memb GROUP BY 1, 2)
                QUALIFY row_number() OVER (
                    PARTITION BY component ORDER BY c DESC, lang ASC) = 1),
            sw AS (
                SELECT component, source FROM (
                    SELECT component, source, count(*) AS c
                    FROM memb GROUP BY 1, 2)
                QUALIFY row_number() OVER (
                    PARTITION BY component ORDER BY c DESC, source ASC) = 1),
            agg AS (
                SELECT component, count(*)::BIGINT AS n_members,
                       max(n_chars)::BIGINT AS max_chars
                FROM memb GROUP BY 1)
            SELECT component, n_members, lw.lang AS lang,
                   sw.source AS source, max_chars
            FROM agg JOIN lw USING (component) JOIN sw USING (component)
            ORDER BY component
        """,
        "kg_graph_nodes": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, token
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL}),
            edges AS (
                SELECT a.token AS s, b.token AS o, count(*) AS w
                FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
            bidir AS (
                SELECT s AS entity, o AS nbr, w FROM edges
                UNION ALL SELECT o, s, w FROM edges)
            SELECT entity,
                   count(DISTINCT nbr)::BIGINT AS degree,
                   sum(w)::BIGINT AS support
            FROM bidir GROUP BY entity ORDER BY entity
        """,
        "triples_canonical": f"""
            WITH m AS (
                SELECT DISTINCT doc_id, upper(token) AS term
                FROM ({_TOKENS})
                WHERE token IN {_DOC_VOCAB_SQL})
            SELECT DISTINCT a.term AS subj,
                   'cooccurs_with' AS pred,
                   b.term AS obj
            FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.term < b.term
        """,
        "knn_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding
                FROM embeddings WHERE vec_id < 10),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id),
            ranked AS (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS rnk
                FROM sims)
            SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
                   round(sim, 6) AS cosine
            FROM ranked WHERE rnk <= 5
        """,
        "knn_join_split": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM (SELECT * FROM embeddings WHERE vec_id < 100) q
                CROSS JOIN (SELECT * FROM embeddings WHERE vec_id >= 100) e),
            ranked AS (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS rnk
                FROM sims)
            SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
                   round(sim, 6) AS cosine
            FROM ranked WHERE rnk <= 5
        """,
        "knn_self_join": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM embeddings q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.vec_id),
            ranked AS (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS rnk
                FROM sims)
            SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
                   round(sim, 6) AS cosine
            FROM ranked WHERE rnk <= 5
        """,
        # knn_ivf_exact probes every IVF bucket (n_probe == n_centroids), so
        # the exact brute-force ranking is its oracle.
        "knn_ivf_exact": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding
                FROM embeddings WHERE vec_id < 10),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id),
            ranked AS (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS rnk
                FROM sims)
            SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
                   round(sim, 6) AS cosine
            FROM ranked WHERE rnk <= 5
        """,
        # dedup_jaccard is the EXACT prefix-filtered AllPairs similarity
        # self-join, so plain SQL word-3-gram Jaccard is its ground truth
        # (dedup_minhash stays rows-only: LSH chain pairing may miss a pair).
        "doc_containment": r"""
            WITH words AS (
                SELECT doc_id, w, i
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w,
                             generate_subscripts(
                                 string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'), 1) AS i
                      FROM documents)
                WHERE w <> ''),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM words a
                JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_sub, y.doc_id AS id_super,
                       count(*) AS m
                FROM sh x JOIN sh y
                  ON x.s = y.s AND x.doc_id <> y.doc_id
                GROUP BY 1, 2)
            SELECT id_sub, id_super,
                   round_even(m::DOUBLE / ca.n, 6) AS containment
            FROM inter JOIN cnt ca ON ca.doc_id = id_sub
            WHERE m::DOUBLE / ca.n >= 0.6
            ORDER BY id_sub, id_super
        """,
        "top_similar_docs": r"""
            WITH words AS (
                SELECT doc_id, w, i
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w,
                             generate_subscripts(
                                 string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'), 1) AS i
                      FROM documents)
                WHERE w <> ''),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM words a
                JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS m
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round_even(m::DOUBLE / (ca.n + cb.n - m), 6) AS jaccard
            FROM inter
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b
            WHERE m::DOUBLE / (ca.n + cb.n - m) >= 0.2
            ORDER BY m::DOUBLE / (ca.n + cb.n - m) DESC, id_a, id_b
            LIMIT 20
        """,
        "dedup_jaccard": r"""
            WITH words AS (
                SELECT doc_id, w, i
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w,
                             generate_subscripts(
                                 string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'), 1) AS i
                      FROM documents)
                WHERE w <> ''),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM words a
                JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS m
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   -- round_even matches numpy's half-even .round(6); plain
                   -- round splits on exact dyadic halves (e.g. odd/2^7)
                   round_even(m::DOUBLE / (ca.n + cb.n - m), 6) AS jaccard
            FROM inter
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b
            WHERE m::DOUBLE / (ca.n + cb.n - m) >= 0.5
        """,
        # dedup_components: the dedup_jaccard pair SQL + a recursive
        # transitive closure — ground truth for the large-star/small-star
        # connected-components labels (component = min reachable doc_id)
        "dedup_components": r"""
            WITH RECURSIVE words AS (
                SELECT doc_id, w, i
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS w,
                             generate_subscripts(
                                 string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+'), 1) AS i
                      FROM documents)
                WHERE w <> ''),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM words a
                JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS m
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN cnt ca ON ca.doc_id = id_a
                JOIN cnt cb ON cb.doc_id = id_b
                WHERE m::DOUBLE / (ca.n + cb.n - m) >= 0.5),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
            r(n, x) AS (
                SELECT DISTINCT a, a FROM edges
                UNION
                SELECT r.n, e.b FROM r JOIN edges e ON e.a = r.x)
            SELECT n AS node, min(x) AS component
            FROM r GROUP BY n ORDER BY node
        """,
        # embedding_neardup's verify step computes EXACT cosine on every
        # LSH candidate, so output ⊆ {exact pairs ≥ t}; on this corpus the
        # exact set is attained (LSH recall certified by planted-dup tests),
        # making plain SQL cosine its oracle.
        "embedding_neardup": """
            WITH sims AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) AS c
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(c, 6) AS cosine
            FROM sims WHERE c >= 0.9
        """,
        "multimodal_features": """
            -- rebuild the md5-byte fake decode: payload = utf8(text),
            -- feature[i] = digest_byte[i]/256 (exact in float32), dim=8 →
            -- feat_mean = sum(first 8 bytes) / 2048
            WITH h AS (
                SELECT doc_id::VARCHAR AS media_id, md5(text) AS hx
                FROM documents),
            b AS (
                SELECT media_id,
                       (strpos('0123456789abcdef',
                               substring(hx, i * 2 + 1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef',
                                 substring(hx, i * 2 + 2, 1)) - 1) AS byte
                FROM h, unnest(range(0, 8)) AS t(i))
            SELECT media_id, sum(byte) / 2048.0 AS feat_mean
            FROM b GROUP BY 1
        """,
        # knn_ivf_probed: the approximate IVF with the deterministic Lloyd
        # quantizer — probe sets, list assignments and within-list cosine
        # ranking all recomputed independently in SQL.
        "knn_ivf_probed": O.ivf_probed_sql(),
        # sign-LSH banded ANN: planes, bands, candidate rule and ranking
        # all regenerated in SQL (deterministic Rademacher planes)
        "knn_lsh": O.lsh_topk_sql(),
        # persisted per-band LSH index: same rule, so same oracle
        "knn_lsh_store": O.lsh_topk_sql(),
        # the persisted-IVF path returns exactly the in-memory probed
        # results (same quantizer, probes, tie-breaks) — same oracle
        "knn_ivf_store": O.ivf_probed_sql(),
        # knn_ivf: the SAMPLED-quantizer IVF — the deterministic hash
        # subsample (splitmix64(vec_id) % 3 == 0) trains the Lloyd chain,
        # search covers the full corpus; the whole chain replays in SQL
        "knn_ivf": O.ivf_probed_sql(
            sample_pred=f"(({O.splitmix64_sql('vec_id::UBIGINT')}) % 3) = 0"
        ),
        # directed-edge reciprocity over the modular-key digraph
        "kg_reciprocity": """
            WITH e AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            r AS (SELECT count(*)::BIGINT AS n
                  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
            t AS (SELECT count(*)::BIGINT AS n FROM e)
            SELECT t.n AS n_edges, r.n AS n_reciprocal,
                   round_even(r.n / t.n::DOUBLE, 6) AS reciprocity
            FROM r, t
        """,
        # functional-dependency discovery profile over part
        "part_fd_violations": " UNION ALL ".join(
            f"""
            SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
                   count(*)::BIGINT AS n_groups,
                   sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_violating,
                   max(n_rhs)::BIGINT AS max_rhs_variants
            FROM (SELECT l, count(*)::BIGINT AS n_rhs
                  FROM (SELECT DISTINCT {lhs}::VARCHAR AS l,
                               {rhs}::VARCHAR AS r FROM part)
                  GROUP BY l)
            """
            for lhs, rhs in (
                ("p_brand", "p_type"),
                ("p_type", "p_brand"),
                ("p_brand", "p_size"),
                ("p_name", "p_partkey"),
            )
        )
        + " ORDER BY lhs, rhs",
        # sample ACF of the daily value series on the dense day grid
        "events_autocorrelation": """
            WITH dayx AS (
                SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                       sum(value) AS x
                FROM events GROUP BY 1),
            b AS (SELECT min(day) AS lo, max(day) AS hi FROM dayx),
            grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
            s AS (SELECT g.day, coalesce(d.x, 0.0) AS x
                  FROM grid g LEFT JOIN dayx d USING (day)),
            m AS (SELECT avg(x) AS mu,
                         sum((x - (SELECT avg(x) FROM s))
                             * (x - (SELECT avg(x) FROM s))) AS denom
                  FROM s),
            l AS (SELECT unnest(range(1, 8)) AS k)
            SELECT l.k::BIGINT AS lag,
                   round_even(
                       coalesce((SELECT sum((a.x - m.mu) * (bb.x - m.mu))
                                 FROM s a JOIN s bb ON bb.day = a.day + l.k),
                                0.0) / m.denom, 6) AS acf
            FROM l, m ORDER BY lag
        """,
        # top principal component: unrolled normalized power iteration
        "embedding_pca_power": O.pca_power_sql(),
        # Gopher rule-based quality report (empty tokens masked like the
        # Ray side; whitespace-only docs count 0 words and fail)
        "gopher_quality_rules": rf"""
            WITH toks AS (
                SELECT doc_id, t.w AS w
                FROM documents,
                     unnest(regexp_split_to_array(
                         trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '),
                         '\s+')) AS t(w)
                WHERE t.w <> ''),
            f AS (
                SELECT doc_id,
                       count(*)::BIGINT AS n_words,
                       avg(length(w)) AS mean_word_len,
                       avg(CASE WHEN regexp_matches(w, '[A-Za-z]')
                                THEN 1.0 ELSE 0.0 END) AS alpha_frac,
                       sum(CASE WHEN w IN ({", ".join(
                           "'" + s + "'" for s in (
                               "the", "be", "to", "of",
                               "and", "that", "have", "with"))})
                                THEN 1 ELSE 0 END)::BIGINT AS stopword_hits
                FROM toks GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(f.n_words, 0)::BIGINT AS n_words,
                   round_even(coalesce(f.mean_word_len, 0.0), 6)
                       AS mean_word_len,
                   round_even(coalesce(f.alpha_frac, 0.0), 6) AS alpha_frac,
                   coalesce(f.stopword_hits, 0)::BIGINT AS stopword_hits,
                   (CASE WHEN f.n_words BETWEEN 50 AND 100000
                          AND f.mean_word_len BETWEEN 3.0 AND 10.0
                          AND f.alpha_frac >= 0.8
                          AND f.stopword_hits >= 2
                         THEN 1 ELSE 0 END)::BIGINT AS passes
            FROM documents d LEFT JOIN f USING (doc_id)
            ORDER BY d.doc_id
        """,
        # Mann-Whitney rank-sum with midranks and the tie-corrected z
        "events_mannwhitney": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
                FROM events WHERE event_type IN ('click', 'error')),
            g AS (SELECT v, sum(ia)::BIGINT AS na, count(*)::BIGINT AS nt
                  FROM s GROUP BY v),
            o AS (SELECT na, nt,
                         sum(nt) OVER (ORDER BY v) - nt AS cumt
                  FROM g),
            agg AS (SELECT sum(na * (cumt + (nt + 1) / 2.0)) AS ra,
                           sum(nt * nt * nt - nt)::DOUBLE AS tie,
                           sum(na)::BIGINT AS n1,
                           sum(nt - na)::BIGINT AS n2
                    FROM o)
            SELECT n1 AS n_a, n2 AS n_b,
                   round_even(ra - n1 * (n1 + 1) / 2.0, 6) AS u_stat,
                   round_even(
                       (ra - n1 * (n1 + 1) / 2.0 - n1::DOUBLE * n2 / 2.0)
                       / sqrt(n1::DOUBLE * n2 / 12.0
                              * ((n1 + n2 + 1)
                                 - tie / ((n1 + n2)::DOUBLE
                                          * (n1 + n2 - 1)))), 6) AS z
            FROM agg
        """,
        # reciprocal-rank fusion of BM25 and Dirichlet query likelihood
        "doc_fusion_rrf": r"""
            WITH toks AS MATERIALIZED (
                SELECT doc_id, t.w AS token
                FROM documents,
                     unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\s+')) AS t(w)
                WHERE t.w <> ''),
            len AS MATERIALIZED (
                SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1),
            stats AS (SELECT count(*)::DOUBLE AS n_docs,
                             sum(dl) / count(*) AS avgdl,
                             sum(dl) AS t_total FROM len),
            tf AS MATERIALIZED (
                SELECT doc_id, token, count(*)::DOUBLE AS tf
                FROM toks WHERE token IN ('spark', 'join', 'stream')
                GROUP BY 1, 2),
            dft AS (SELECT token, count(*)::DOUBLE AS df,
                           sum(tf) AS ctf FROM tf GROUP BY 1),
            sc AS MATERIALIZED (
                SELECT tf.doc_id,
                       sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * tf * (1.2 + 1.0)
                           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
                           AS score
                FROM tf JOIN dft USING (token) JOIN len USING (doc_id)
                CROSS JOIN stats
                GROUP BY 1),
            hits AS (SELECT DISTINCT doc_id FROM tf),
            terms AS (SELECT unnest(['spark', 'join', 'stream']) AS token),
            ql AS MATERIALIZED (
                SELECT h.doc_id,
                       sum(ln((coalesce(tf.tf, 0.0)
                               + 2000.0 * dft.ctf / stats.t_total)
                              / (len.dl + 2000.0))) AS score
                FROM hits h
                CROSS JOIN terms t
                JOIN dft ON dft.token = t.token
                JOIN len ON len.doc_id = h.doc_id
                CROSS JOIN stats
                LEFT JOIN tf ON tf.doc_id = h.doc_id AND tf.token = t.token
                GROUP BY 1),
            topb AS (SELECT doc_id,
                            row_number() OVER (ORDER BY score DESC, doc_id)
                                AS r
                     FROM sc QUALIFY r <= 20),
            topq AS (SELECT doc_id,
                            row_number() OVER (ORDER BY score DESC, doc_id)
                                AS r
                     FROM ql QUALIFY r <= 20),
            fused AS (
                SELECT doc_id,
                       coalesce(1.0 / (60 + b.r), 0.0)
                       + coalesce(1.0 / (60 + q.r), 0.0) AS rrf,
                       coalesce(b.r, 0)::BIGINT AS bm25_rank,
                       coalesce(q.r, 0)::BIGINT AS ql_rank
                FROM topb b FULL JOIN topq q USING (doc_id))
            SELECT doc_id, round_even(rrf, 6) AS rrf_score,
                   bm25_rank, ql_rank
            FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        # Luby maximal independent set, unrolled hash-derandomized rounds
        "kg_mis": O.mis_sql(),
        # join-consistent hash sampling with exact-integer revenue folds
        "orders_consistent_sample": f"""
            WITH f AS (
                SELECT round_even(l_extendedprice * 100, 0)::BIGINT
                       * (100 - round_even(l_discount * 100, 0)::BIGINT)
                           AS rev_u,
                       (({O.splitmix64_sql('l_orderkey::UBIGINT')}) % 10) = 0
                           AS samp
                FROM lineitem),
            a AS (SELECT count(*)::BIGINT AS n_rows,
                         sum(CASE WHEN samp THEN 1 ELSE 0 END)::BIGINT
                             AS n_sampled,
                         sum(rev_u)::BIGINT AS rev_u,
                         sum(CASE WHEN samp THEN rev_u ELSE 0 END)::BIGINT
                             AS rev_s
                  FROM f)
            SELECT n_rows, n_sampled,
                   round_even(rev_s / 10000.0, 2) AS sample_revenue,
                   round_even(rev_s / 10000.0 * 10, 2) AS est_revenue,
                   round_even(rev_u / 10000.0, 2) AS exact_revenue,
                   round_even(abs(rev_s / 10000.0 * 10 - rev_u / 10000.0)
                              / (rev_u / 10000.0), 6) AS rel_error
            FROM a
        """,
        # inclusion-dependency (foreign-key) audit
        "referential_integrity": " UNION ALL ".join(
            f"""
            SELECT '{child}.{ckey}' AS child, '{parent}.{pkey}' AS parent,
                   (SELECT count(*) FROM {child})::BIGINT AS n_rows,
                   (SELECT count(DISTINCT {ckey}) FROM {child})::BIGINT
                       AS n_keys,
                   (SELECT count(*)
                    FROM (SELECT DISTINCT {ckey} FROM {child})
                    WHERE {ckey} NOT IN (SELECT {pkey} FROM {parent}))::BIGINT
                       AS orphan_keys,
                   (SELECT count(*) FROM {child}
                    WHERE {ckey} NOT IN (SELECT {pkey} FROM {parent}))::BIGINT
                       AS orphan_rows
            """
            for child, ckey, parent, pkey in (
                ("lineitem", "l_orderkey", "orders", "o_orderkey"),
                ("lineitem", "l_partkey", "part", "p_partkey"),
                ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
                ("orders", "o_custkey", "customer", "c_custkey"),
                ("nation", "n_regionkey", "region", "r_regionkey"),
            )
        )
        + " ORDER BY child",
        # l-diversity audit over the k-anonymity quasi-id classes
        "events_l_diversity": """
            WITH cls AS (
                SELECT isodow(ts) AS dow, hour(ts) AS hour,
                       count(DISTINCT event_type)::BIGINT AS l,
                       count(*)::BIGINT AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n)::BIGINT AS n_rows FROM cls)
            SELECT (SELECT count(*) FROM cls)::BIGINT AS n_classes,
                   (SELECT count(*) FROM cls WHERE l < 3)::BIGINT
                       AS n_low_diversity,
                   (SELECT min(l) FROM cls)::BIGINT AS min_l,
                   coalesce((SELECT sum(n) FROM cls WHERE l < 3), 0)::BIGINT
                       AS rows_exposed,
                   round_even(
                       coalesce((SELECT sum(n) FROM cls WHERE l < 3), 0)
                       / t.n_rows::DOUBLE, 6) AS exposed_frac
            FROM t
        """,
        # exact average precision over descending distinct thresholds
        "events_score_pr_auc": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                           AS y
                FROM events),
            g AS (SELECT v, sum(y)::BIGINT AS np,
                         sum(1 - y)::BIGINT AS nn
                  FROM s GROUP BY v),
            t AS (SELECT sum(np)::DOUBLE AS p_tot,
                         sum(nn)::DOUBLE AS n_tot FROM g),
            o AS (SELECT np,
                         sum(np) OVER (ORDER BY v) - np AS cp,
                         sum(nn) OVER (ORDER BY v) - nn AS cn
                  FROM g)
            SELECT t.p_tot::BIGINT AS n_pos, t.n_tot::BIGINT AS n_neg,
                   round_even(
                       sum(np * (t.p_tot - cp)
                           / ((t.p_tot + t.n_tot) - (cp + cn)))
                       / t.p_tot, 6) AS pr_auc
            FROM o, t GROUP BY t.p_tot, t.n_tot
        """,
        # hash-greedy maximal matching, unrolled arg-min rounds
        "kg_maximal_matching": O.matching_sql(),
        # Bag-of-Little-Bootstraps CI: bag hash, resample weights and
        # per-bag percentile bounds replayed in SQL
        "value_mean_blb": O.blb_sql(),
        # Hampel/MAD robust outlier audit (exact interpolated medians)
        "value_mad_outliers": """
            WITH m AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
            d AS (SELECT quantile_cont(abs(value - m.med), 0.5) AS mad,
                         any_value(m.med) AS med
                  FROM events, m),
            c AS (SELECT count(*)::BIGINT AS n,
                         sum(CASE WHEN abs(value - d.med)
                                       > (3.0 * 1.4826) * d.mad
                                  THEN 1 ELSE 0 END)::BIGINT AS n_out
                  FROM events, d)
            SELECT round_even(d.med, 6) AS median,
                   round_even(d.mad, 6) AS mad,
                   c.n_out AS n_outliers,
                   round_even(c.n_out / c.n::DOUBLE, 6) AS outlier_frac
            FROM c, d
        """,
        # per-user time-weighted average value (LEAD holding intervals)
        "user_time_weighted_value": """
            WITH w AS (
                SELECT user_id, value,
                       epoch_us(lead(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id))
                       - epoch_us(ts) AS dur
                FROM events)
            SELECT user_id,
                   round_even(sum(value * dur) / sum(dur), 6) AS twap,
                   sum(dur)::BIGINT AS held_us
            FROM w WHERE dur IS NOT NULL
            GROUP BY user_id ORDER BY user_id
        """,
        # rich-club coefficient: edge density among degree>k nodes
        "kg_rich_club": """
            WITH base AS MATERIALIZED (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            und AS MATERIALIZED (
                SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                FROM base),
            deg AS MATERIALIZED (
                SELECT node, count(*)::BIGINT AS deg
                FROM (SELECT u AS node FROM und
                      UNION ALL SELECT v FROM und)
                GROUP BY 1)
            SELECT k::BIGINT AS k,
                   (SELECT count(*) FROM deg WHERE deg > k)::BIGINT
                       AS n_rich,
                   (SELECT count(*) FROM und
                    WHERE u IN (SELECT node FROM deg WHERE deg > k)
                      AND v IN (SELECT node FROM deg WHERE deg > k))::BIGINT
                       AS e_rich,
                   round_even(
                       CASE WHEN (SELECT count(*) FROM deg WHERE deg > k) > 1
                            THEN 2.0 * (SELECT count(*) FROM und
                                 WHERE u IN (SELECT node FROM deg
                                             WHERE deg > k)
                                   AND v IN (SELECT node FROM deg
                                             WHERE deg > k))
                                 / ((SELECT count(*) FROM deg WHERE deg > k)
                                    * ((SELECT count(*) FROM deg
                                        WHERE deg > k) - 1))
                            ELSE 0.0 END, 6) AS phi
            FROM (SELECT unnest([2, 4, 8]) AS k)
            ORDER BY k
        """,
        # Goh-Barabasi burstiness over pooled per-user inter-event gaps
        "events_burstiness": """
            WITH w AS (
                SELECT event_type,
                       (epoch_us(ts)
                        - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)))
                           ::DOUBLE AS g
                FROM events),
            m AS (SELECT event_type, count(g)::DOUBLE AS n,
                         sum(g) AS sg, sum(g * g) AS sgg
                  FROM w WHERE g IS NOT NULL GROUP BY 1)
            SELECT event_type, n::BIGINT AS n_gaps,
                   round_even(sg / n, 6) AS mean_gap_us,
                   round_even(
                       (sqrt(sgg / n - (sg / n) * (sg / n)) - sg / n)
                       / (sqrt(sgg / n - (sg / n) * (sg / n)) + sg / n),
                       6) AS burstiness
            FROM m ORDER BY event_type
        """,
        # Count-Min inner-product join-size estimate vs the exact answer
        "join_size_countmin": O.join_size_cm_sql(),
        # 4-cycle count via the co-degree formula (halved diagonal pairs)
        "kg_square_count": """
            WITH base AS MATERIALIZED (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            und AS MATERIALIZED (
                SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                FROM base),
            bidir AS MATERIALIZED (
                SELECT u AS mid, v AS endpoint FROM und
                UNION ALL SELECT v, u FROM und),
            wedges AS MATERIALIZED (
                SELECT x.endpoint AS a, y.endpoint AS b,
                       count(*)::BIGINT AS w
                FROM bidir x JOIN bidir y
                  ON x.mid = y.mid AND x.endpoint < y.endpoint
                GROUP BY 1, 2)
            SELECT sum(CASE WHEN w >= 2 THEN 1 ELSE 0 END)::BIGINT
                       AS n_codeg2_pairs,
                   sum(w * (w - 1) // 2)::BIGINT AS n_diag_pairs,
                   (sum(w * (w - 1) // 2) // 2)::BIGINT AS n_squares
            FROM wedges
        """,
        # bounded-radius harmonic centrality, all nodes as BFS seeds
        "kg_harmonic_centrality": """
            WITH RECURSIVE base AS (
                SELECT DISTINCT (l_orderkey % 997) AS src,
                       (l_partkey % 997) AS dst
                FROM lineitem
                WHERE l_quantity = 1
                  AND (l_orderkey % 997) <> (l_partkey % 997)),
            -- DuckDB gives plain UNION anchor/step semantics inside
            -- WITH RECURSIVE even without self-reference: spell the
            -- dedup as DISTINCT over UNION ALL
            nodes AS (SELECT DISTINCT n FROM (
                          SELECT src AS n FROM base
                          UNION ALL SELECT dst FROM base)),
            walk(seed, node, d) AS (
                SELECT n, n, 0 FROM nodes
                UNION
                SELECT w.seed, b.dst, w.d + 1
                FROM walk w JOIN base b ON b.src = w.node
                WHERE w.d < 6),
            dist AS (SELECT seed, node, min(d) AS d
                     FROM walk GROUP BY 1, 2 HAVING min(d) > 0),
            agg AS (SELECT seed,
                           count(*)::BIGINT AS n_reached,
                           sum(1.0 / d) AS harmonic
                    FROM dist GROUP BY seed)
            SELECT n.n::BIGINT AS node,
                   coalesce(a.n_reached, 0)::BIGINT AS n_reached,
                   round_even(coalesce(a.harmonic, 0.0), 6) AS harmonic
            FROM nodes n LEFT JOIN agg a ON a.seed = n.n
            ORDER BY node
        """,
    }
