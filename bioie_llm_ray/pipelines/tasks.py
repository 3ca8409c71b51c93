"""The reference's four benchmark tasks as Ray Data pipelines (SURVEY §3.1).

Each pipeline is: build test split (deterministic, hash-based) → prompt rows
→ scorer actor pool → parse → align → predictions Dataset (+ triples).  The
scorer is pluggable (MockScorer for tests/parity, HFScorer for real models).

Task semantics mirrored from the reference:

- STRING entity (string_processor.py:54-135): test pool = proteins with
  ≥ 10 interactors, shot pool ≤ 30 interactors (M3); gold = interactor list;
  parse M9; align M12 (k=10); triples (query, interacts_with, pred).
- STRING relation (string_processor.py:140-330): positive pairs from the
  adjacency (M4), negatives from Negatome; balanced sample; yes/no (M10);
  triples for 'yes'.
- KEGG entity (kegg_processor.py:73-269): top-100 pathways by dose rank
  (O3), gold = primary gene names (x[0] of each alias list); k=10 alignment.
- INDRA relation_type (indra_processor.py:55-236): per-class sample (G3),
  6-class choice (M10); triples (e1, rel, e2).

Splits are hash-based (functions.hashing) rather than seeded ``random.sample``
— deterministic at any partition count (SURVEY §7.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from ..functions.align import sort_and_pad
from ..functions.hashing import stable_hash_u64
from ..functions.parsing import parse_choice_response, parse_entity_response
from ..functions.prompts import PromptTemplates, get_templates
from ..schemas import INDRA_RELATION_TYPES
from ..stages.scorer import MockScorer

_PAIR_SEP = "\x1f"


@dataclass
class TaskResult:
    """Predictions + triples of one task run (both lazy Datasets)."""

    predictions: ray.data.Dataset  # (src, pred, true)
    triples: ray.data.Dataset  # (subj, pred, obj, src_sha)


def _hash_top_n(keys: list[str], n: int) -> list[str]:
    """Deterministic 'sample' of n keys: the n smallest stable hashes."""
    if len(keys) <= n:
        return sorted(keys)
    h = stable_hash_u64(keys)
    order = np.argsort(h, kind="stable")
    return [keys[int(i)] for i in order[:n]]


# ---------------------------------------------------------------- STRING entity


def string_entity_task(
    adjacency: ray.data.Dataset,
    test_size: int = 100,
    n_shots: int = 2,
    k: int = 10,
    max_shot_list_len: int = 30,
    min_test_list_len: int = 10,
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """Generative PPI task over an adjacency Dataset (src, neighbors)."""
    templates = templates or get_templates("default", "string")

    # split pools with vectorized filters (M3)
    import pyarrow.compute as pc

    def pool_filter(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch["neighbors"])
        return batch.filter(pc.greater_equal(n, min_test_list_len))

    test_pool = adjacency.map_batches(pool_filter, batch_format="pyarrow")
    # the query-key list is small (one row per qualifying entity) — keys only
    # on the driver; hash order replaces the reference's seeded sampling
    pool_keys = [
        r["src"] for r in test_pool.select_columns(["src"]).take_all()
    ]
    picked = _hash_top_n(pool_keys, test_size + n_shots)
    shot_keys = set(picked[:n_shots])  # shots excluded from test (J3 anti-join)
    test_keys = set(picked[n_shots:])

    # shot prefix (A4): fetch only the n_shots rows, build once, broadcast via
    # closure capture (a short string constant)
    shot_prefix = ""
    if n_shots:
        from ..functions.prompts import build_shot_prefix

        shot_rows = test_pool.map_batches(
            lambda b: b.filter(
                pa.array([s in shot_keys for s in b["src"].to_pylist()])
            ),
            batch_format="pyarrow",
        ).take_all()
        shots = [
            {
                "entity": r["src"],
                "answer": sorted(set(r["neighbors"]))[:max_shot_list_len],
            }
            for r in shot_rows
        ]
        shot_prefix = build_shot_prefix(templates, "entity", shots)

    def format_prompts(batch: pa.Table) -> pa.Table:
        mask = pa.array([s in test_keys for s in batch["src"].to_pylist()])
        batch = batch.filter(mask)
        entities = batch["src"].to_pylist()
        texts = [
            shot_prefix + templates.entity_q.format(entity=e) for e in entities
        ]
        answers = [sorted(set(v)) for v in batch["neighbors"].to_pylist()]
        return pa.table(
            {
                "entity": pa.array(entities, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "answer": pa.array(answers, type=pa.list_(pa.string())),
            }
        )

    prompts = adjacency.map_batches(format_prompts, batch_format="pyarrow")

    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse_align(batch: pa.Table) -> pa.Table:
        out = {"src": [], "pred": [], "true": []}
        for entity, resp, gold in zip(
            batch["entity"].to_pylist(),
            batch["response"].to_pylist(),
            batch["answer"].to_pylist(),
        ):
            gold = [g.strip() for g in gold]
            pred = parse_entity_response(resp, gold)
            pred, true = sort_and_pad(pred, gold, max_entity_list_len=k)
            out["src"].extend([entity] * len(pred))
            out["pred"].extend(pred)
            out["true"].extend(true)
        return pa.table(
            {c: pa.array(v, type=pa.string()) for c, v in out.items()}
        )

    predictions = scored.map_batches(parse_align, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.not_equal(batch["pred"], "NONE"))
        return pa.table(
            {
                "subj": keep["src"],
                "pred": pa.array(["interacts_with"] * len(keep), type=pa.string()),
                "obj": keep["pred"],
                "src_sha": pa.array([""] * len(keep), type=pa.string()),
            }
        )

    triples = predictions.map_batches(to_triples, batch_format="pyarrow")
    return TaskResult(predictions=predictions, triples=triples)


# -------------------------------------------------------------- STRING relation


def string_relation_task(
    adjacency: ray.data.Dataset,
    negatome: ray.data.Dataset,
    n_pairs_per_side: int = 100,
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """Yes/no pair-classification with Negatome negatives."""
    templates = templates or get_templates("default", "string")

    # positive pairs by exploding the adjacency list column (M4)
    def explode(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for s, nbrs in zip(
            batch["src"].to_pylist(), batch["neighbors"].to_pylist()
        ):
            for d in nbrs:
                if s < d:  # one direction; the pair is symmetric
                    srcs.append(s)
                    dsts.append(d)
        return pa.table(
            {
                "p1": pa.array(srcs, type=pa.string()),
                "p2": pa.array(dsts, type=pa.string()),
            }
        )

    pos = adjacency.map_batches(explode, batch_format="pyarrow")

    # distributed hash top-n: never materializes the exploded pair set on the
    # driver (~11.9M pairs at real STRING scale, string_processor.py:168);
    # duplicate input pairs collapse to one sampled row
    from ..stages.sample import distributed_hash_top_n

    def sample_side(ds: ray.data.Dataset, label: str) -> pa.Table:
        t = distributed_hash_top_n(ds, ["p1", "p2"], n_pairs_per_side)
        t = t.select(["p1", "p2"])
        return t.append_column(
            "answer", pa.array([label] * len(t), type=pa.string())
        )

    pos_t = sample_side(pos, "yes")
    neg_t = sample_side(negatome, "no")
    pairs = ray.data.from_arrow(
        pa.concat_tables([pos_t, neg_t])
    )

    def format_prompts(batch: pa.Table) -> pa.Table:
        p1 = batch["p1"].to_pylist()
        p2 = batch["p2"].to_pylist()
        texts = [templates.relation_q.format(e1=a, e2=b) for a, b in zip(p1, p2)]
        entities = [f"{a}{_PAIR_SEP}{b}" for a, b in zip(p1, p2)]
        return pa.table(
            {
                "entity": pa.array(entities, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "answer": batch["answer"],
            }
        )

    prompts = pairs.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse(batch: pa.Table) -> pa.Table:
        preds = [
            parse_choice_response(r, ["yes", "no"])
            for r in batch["response"].to_pylist()
        ]
        return pa.table(
            {
                "src": batch["entity"],
                "pred": pa.array(preds, type=pa.string()),
                "true": batch["answer"],
            }
        )

    predictions = scored.map_batches(parse, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.equal(batch["pred"], "yes"))
        pairs_ = [s.split(_PAIR_SEP) for s in keep["src"].to_pylist()]
        return pa.table(
            {
                "subj": pa.array([p[0] for p in pairs_], type=pa.string()),
                "pred": pa.array(["interacts_with"] * len(pairs_), type=pa.string()),
                "obj": pa.array([p[1] for p in pairs_], type=pa.string()),
                "src_sha": pa.array([""] * len(pairs_), type=pa.string()),
            }
        )

    triples = predictions.map_batches(to_triples, batch_format="pyarrow")
    return TaskResult(predictions=predictions, triples=triples)


# ----------------------------------------------------------------- KEGG entity


def kegg_entity_task(
    pathway_genes: ray.data.Dataset,
    ranking: ray.data.Dataset,
    top_n: int = 100,
    k: int = 10,
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """Pathway→genes generative task over the top-N dose-ranked pathways.

    ``pathway_genes``: (pathway, genes:list<string>) with primary gene names;
    ``ranking``: (pathway_id→pathway rank) — tiny, joined via broadcast.
    """
    templates = templates or get_templates("default", "kegg")

    rank_map = {
        r["pathway"]: r["rank"] for r in ranking.take_all()
    }
    top = {p for p, rk in rank_map.items() if rk < top_n}

    def format_prompts(batch: pa.Table) -> pa.Table:
        mask = pa.array([p in top for p in batch["pathway"].to_pylist()])
        batch = batch.filter(mask)
        entities = batch["pathway"].to_pylist()
        texts = [templates.entity_q.format(entity=e) for e in entities]
        answers = [sorted(set(g)) for g in batch["genes"].to_pylist()]
        return pa.table(
            {
                "entity": pa.array(entities, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "answer": pa.array(answers, type=pa.list_(pa.string())),
            }
        )

    prompts = pathway_genes.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse_align(batch: pa.Table) -> pa.Table:
        out = {"src": [], "pred": [], "true": []}
        for entity, resp, gold in zip(
            batch["entity"].to_pylist(),
            batch["response"].to_pylist(),
            batch["answer"].to_pylist(),
        ):
            pred = parse_entity_response(resp, gold)
            pred, true = sort_and_pad(pred, gold, max_entity_list_len=k)
            out["src"].extend([entity] * len(pred))
            out["pred"].extend(pred)
            out["true"].extend(true)
        return pa.table(
            {c: pa.array(v, type=pa.string()) for c, v in out.items()}
        )

    predictions = scored.map_batches(parse_align, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.not_equal(batch["pred"], "NONE"))
        return pa.table(
            {
                "subj": keep["pred"],
                "pred": pa.array(["member_of"] * len(keep), type=pa.string()),
                "obj": keep["src"],
                "src_sha": pa.array([""] * len(keep), type=pa.string()),
            }
        )

    triples = predictions.map_batches(to_triples, batch_format="pyarrow")
    return TaskResult(predictions=predictions, triples=triples)


def kegg_relation_task(
    membership: ray.data.Dataset,
    gene_alias_map: dict[str, list[str]],
    pathway_name_map: dict[str, str],
    n_pairs_per_side: int = 50,
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """Composed KEGG relation task with GENERATED negatives (the latent J4
    flow, kegg_processor.py:140-157: 17,552 pos / 190,148 neg at real scale).

    Positives: every (gene alias, pathway) membership edge — the reference
    adds every alias of every member gene.  Negatives: the gene × pathway
    cross product minus the positive set, built per-batch against the
    broadcast pathway list and anti-joined against the broadcast positive
    key set (``anti_semi_filter``, J4) — the cross product never
    materializes.  Both sides sample via distributed hash top-n.

    ``membership``: Dataset (gene_id, pathway_id); the alias and
    pathway-name maps are KB-sized broadcast sides (J2).
    """
    import pyarrow.compute as pc

    templates = templates or get_templates("default", "kegg")

    def explode_pos(batch: pa.Table) -> pa.Table:
        genes, paths = [], []
        for gid, pid in zip(
            batch["gene_id"].to_pylist(), batch["pathway_id"].to_pylist()
        ):
            pname = pathway_name_map[pid]
            for alias in gene_alias_map[gid]:
                genes.append(alias)
                paths.append(pname)
        return pa.table(
            {
                "gene": pa.array(genes, type=pa.string()),
                "pathway": pa.array(paths, type=pa.string()),
            }
        )

    pos = membership.map_batches(explode_pos, batch_format="pyarrow")
    # positive key set: KB-sized like the alias/name maps themselves
    # (17,552 keys at real KEGG scale) — a legitimate broadcast side
    edges = membership.select_columns(["gene_id", "pathway_id"]).take_all()
    pos_keys = ray.put(
        {
            f"{g}{_PAIR_SEP}{pathway_name_map[e['pathway_id']]}"
            for e in edges
            for g in gene_alias_map[e["gene_id"]]
        }
    )

    # negative generation: distinct member aliases × broadcast pathway list,
    # anti-filtered against the positive key set.  The gene vocabulary is
    # KB-sized (run over the distinct gene_id side, not the corpus).
    from ..stages.dedup import exact_dedup
    from ..stages.join import anti_semi_filter

    pathways = sorted(set(pathway_name_map.values()))
    distinct_genes = exact_dedup(
        membership.select_columns(["gene_id"]), ["gene_id"]
    )

    def cross(batch: pa.Table) -> pa.Table:
        genes, paths = [], []
        seen = set()
        for gid in batch["gene_id"].to_pylist():
            for alias in gene_alias_map[gid]:
                if alias in seen:
                    continue
                seen.add(alias)
                for p in pathways:
                    genes.append(alias)
                    paths.append(p)
        return pa.table(
            {
                "gene": pa.array(genes, type=pa.string()),
                "pathway": pa.array(paths, type=pa.string()),
            }
        )

    neg = anti_semi_filter(
        distinct_genes.map_batches(cross, batch_format="pyarrow"),
        pos_keys,
        keys=["gene", "pathway"],
        anti=True,
    )

    from ..stages.sample import distributed_hash_top_n

    def sample_side(ds: ray.data.Dataset, label: str) -> pa.Table:
        t = distributed_hash_top_n(ds, ["gene", "pathway"], n_pairs_per_side)
        t = t.select(["gene", "pathway"])
        return t.append_column(
            "answer", pa.array([label] * len(t), type=pa.string())
        )

    pairs = ray.data.from_arrow(
        pa.concat_tables([sample_side(pos, "yes"), sample_side(neg, "no")])
    )

    def format_prompts(batch: pa.Table) -> pa.Table:
        g = batch["gene"].to_pylist()
        p = batch["pathway"].to_pylist()
        return pa.table(
            {
                "entity": pa.array(
                    [f"{a}{_PAIR_SEP}{b}" for a, b in zip(g, p)],
                    type=pa.string(),
                ),
                "text": pa.array(
                    [
                        templates.relation_q.format(e1=a, e2=b)
                        for a, b in zip(g, p)
                    ],
                    type=pa.string(),
                ),
                "answer": batch["answer"],
            }
        )

    prompts = pairs.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse(batch: pa.Table) -> pa.Table:
        preds = [
            parse_choice_response(r, ["yes", "no"])
            for r in batch["response"].to_pylist()
        ]
        return pa.table(
            {
                "src": batch["entity"],
                "pred": pa.array(preds, type=pa.string()),
                "true": batch["answer"],
            }
        )

    predictions = scored.map_batches(parse, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["pred"], "yes"))
        parts = [s.split(_PAIR_SEP) for s in keep["src"].to_pylist()]
        return pa.table(
            {
                "subj": pa.array([p[0] for p in parts], type=pa.string()),
                "pred": pa.array(["member_of"] * len(parts), type=pa.string()),
                "obj": pa.array([p[1] for p in parts], type=pa.string()),
                "src_sha": pa.array([""] * len(parts), type=pa.string()),
            }
        )

    return TaskResult(
        predictions=predictions,
        triples=predictions.map_batches(to_triples, batch_format="pyarrow"),
    )


# ------------------------------------------------------------------ INDRA task


def indra_relation_type_task(
    statements: ray.data.Dataset,
    per_class: int = 10,
    num_classes: int = 6,
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """6-class relation typing with per-class balanced sampling (G3)."""
    templates = templates or get_templates("default", "indra")
    choices = list(INDRA_RELATION_TYPES[:num_classes])
    choices_str = ", ".join(choices)

    # distributed per-class hash top-n: the old groupby("rel_type").map_groups
    # put an entire class in one group (one task holds every statement of a
    # 6-way class split — unbounded at corpus scale); the streaming partial
    # top-n keeps ≤ per_class rows per class per block instead
    from ..stages.sample import distributed_hash_top_n

    sampled = ray.data.from_arrow(
        distributed_hash_top_n(
            statements, ["id"], per_class, group_col="rel_type"
        )
    )

    def format_prompts(batch: pa.Table) -> pa.Table:
        texts, entities = [], []
        for sid, text, e1, e2 in zip(
            batch["id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["entity_1"].to_pylist(),
            batch["entity_2"].to_pylist(),
        ):
            texts.append(
                templates.relation_type_q.format(
                    text=text, e1=e1["name"], e2=e2["name"], choices=choices_str
                )
            )
            entities.append(
                _PAIR_SEP.join(
                    [
                        sid,
                        e1["name"],
                        str(e1["span_start"]),
                        str(e1["span_end"]),
                        e2["name"],
                        str(e2["span_start"]),
                        str(e2["span_end"]),
                    ]
                )
            )
        return pa.table(
            {
                "entity": pa.array(entities, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "answer": batch["rel_type"],
            }
        )

    prompts = sampled.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse(batch: pa.Table) -> pa.Table:
        preds = [
            parse_choice_response(r, choices)
            for r in batch["response"].to_pylist()
        ]
        trues = [t.lower() for t in batch["answer"].to_pylist()]
        return pa.table(
            {
                "src": batch["entity"],
                "pred": pa.array(preds, type=pa.string()),
                "true": pa.array(trues, type=pa.string()),
            }
        )

    predictions = scored.map_batches(parse, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.not_equal(batch["pred"], "none"))
        parts = [s.split(_PAIR_SEP) for s in keep["src"].to_pylist()]
        return pa.table(
            {
                "subj": pa.array([p[1] for p in parts], type=pa.string()),
                "pred": keep["pred"],
                "obj": pa.array([p[4] for p in parts], type=pa.string()),
                "src_sha": pa.array([p[0] for p in parts], type=pa.string()),
            }
        )

    triples = predictions.map_batches(to_triples, batch_format="pyarrow")
    return TaskResult(predictions=predictions, triples=triples)


# ------------------------------------------------- containment (kbase-style)


def containment_task(
    statements: ray.data.Dataset,
    choices: list[str],
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    question_template: str = "What kind of event does {entity} describe? {choices}",
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """Containment-parse classification (the reference's kbase variant, M11).

    Input rows: (id, entity, gold) — the scorer answers free-form text and
    the parser scans for choice-substring containment after removing the
    entity name (base_processor.py:1309-1332).
    """
    from ..functions.parsing import parse_containment_response

    choices_str = ", ".join(choices)

    def format_prompts(batch: pa.Table) -> pa.Table:
        ents = batch["entity"].to_pylist()
        return pa.table(
            {
                "entity": batch["entity"],
                "text": pa.array(
                    [
                        question_template.format(entity=e, choices=choices_str)
                        for e in ents
                    ],
                    type=pa.string(),
                ),
                "answer": batch["answer"],
            }
        )

    prompts = statements.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse(batch: pa.Table) -> pa.Table:
        preds = [
            parse_containment_response(resp, ent, choices)
            for resp, ent in zip(
                batch["response"].to_pylist(), batch["entity"].to_pylist()
            )
        ]
        return pa.table(
            {
                "src": batch["entity"],
                "pred": pa.array(preds, type=pa.string()),
                "true": batch["answer"],
            }
        )

    predictions = scored.map_batches(parse, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.not_equal(batch["pred"], "None"))
        return pa.table(
            {
                "subj": keep["src"],
                "pred": pa.array(["has_type"] * len(keep), type=pa.string()),
                "obj": keep["pred"],
                "src_sha": pa.array([""] * len(keep), type=pa.string()),
            }
        )

    return TaskResult(
        predictions=predictions,
        triples=predictions.map_batches(to_triples, batch_format="pyarrow"),
    )


# --------------------------------------------- kbase entity_type (run_model)


def entity_type_task(
    statements: ray.data.Dataset,
    choices: list[str],
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> TaskResult:
    """kbase ``entity_type`` task (run_model.py:549, dispatch 563-565).

    Input rows: (entity, text, answer).  The prompt is the family's
    ``entity_type_q`` ({entity}, {text}, {choices}); the response is parsed
    by substring containment (M11, base_processor.py:1309-1332).
    """
    from ..functions.parsing import parse_containment_response

    templates = templates or get_templates("default", "string")
    choices_str = ", ".join(choices)

    def format_prompts(batch: pa.Table) -> pa.Table:
        ents = batch["entity"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "entity": batch["entity"],
                "text": pa.array(
                    [
                        templates.entity_type_q.format(
                            entity=e, text=t, choices=choices_str
                        )
                        for e, t in zip(ents, texts)
                    ],
                    type=pa.string(),
                ),
                "answer": batch["answer"],
            }
        )

    prompts = statements.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse(batch: pa.Table) -> pa.Table:
        preds = [
            parse_containment_response(resp, ent, choices)
            for resp, ent in zip(
                batch["response"].to_pylist(), batch["entity"].to_pylist()
            )
        ]
        return pa.table(
            {
                "src": batch["entity"],
                "pred": pa.array(preds, type=pa.string()),
                "true": batch["answer"],
            }
        )

    predictions = scored.map_batches(parse, batch_format="pyarrow")

    def to_triples(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.not_equal(batch["pred"], "None"))
        return pa.table(
            {
                "subj": keep["src"],
                "pred": pa.array(["has_type"] * len(keep), type=pa.string()),
                "obj": keep["pred"],
                "src_sha": pa.array([""] * len(keep), type=pa.string()),
            }
        )

    return TaskResult(
        predictions=predictions,
        triples=predictions.map_batches(to_triples, batch_format="pyarrow"),
    )


def entity_and_entity_type_task(
    docs: ray.data.Dataset,
    choices: list[str],
    scorer_cls=MockScorer,
    scorer_kwargs: dict | None = None,
    templates: PromptTemplates | None = None,
    concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """kbase ``entity_and_entity_type`` open extraction (run_model.py:549,
    737-739).

    Input rows: (doc_id, text, answer: list<string> of 'Name (type)').
    Output rows: (src, pred_entity, pred_type, hit) — one per extracted
    pair, ``hit`` true when the pair appears in the gold list.  The
    reference does not align/score this task; it dumps raw JSON
    (run_model.py:752-762) — see ``state.legacy.write_raw_results_json``.
    """
    from ..functions.parsing import parse_entity_type_pairs

    templates = templates or get_templates("default", "string")
    choices_str = ", ".join(choices)

    import pyarrow.compute as _pc

    def format_prompts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": _pc.cast(batch["doc_id"], pa.string()),
                "text": pa.array(
                    [
                        templates.entity_and_entity_type_q.format(
                            text=t, choices=choices_str
                        )
                        for t in batch["text"].to_pylist()
                    ],
                    type=pa.string(),
                ),
                "answer": batch["answer"],
            }
        )

    prompts = docs.map_batches(format_prompts, batch_format="pyarrow")
    scored = prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def parse(batch: pa.Table) -> pa.Table:
        srcs, ents, typs, hits = [], [], [], []
        for src, resp, gold in zip(
            batch["entity"].to_pylist(),
            batch["response"].to_pylist(),
            batch["answer"].to_pylist(),
        ):
            gold_set = set(gold or [])
            for name, typ in parse_entity_type_pairs(resp):
                srcs.append(src)
                ents.append(name)
                typs.append(typ)
                hits.append(f"{name} ({typ})" in gold_set)
        return pa.table(
            {
                "src": pa.array(srcs, type=pa.string()),
                "pred_entity": pa.array(ents, type=pa.string()),
                "pred_type": pa.array(typs, type=pa.string()),
                "hit": pa.array(hits, type=pa.bool_()),
            }
        )

    return scored.map_batches(parse, batch_format="pyarrow")
