"""Evaluation jobs: triple P/R vs gold, consensus analytics (SURVEY §3.3).

``triple_prf`` is the engine's parity gate: exact-match precision/recall of
emitted (subj, pred, obj) triples against a gold set (BASELINE target
P/R ≥ 0.95).  The gold side is broadcast (small relative to the corpus);
matching is a semi-join inside ``map_batches`` — no shuffle.

Consensus jobs mirror the reference's offline evaluator scripts:
- ``unanimous_consensus`` (G7, binary_task_evaluator.py:72-82): keys where
  every model predicted the same label.
- ``full_match_counts`` lives in functions.metrics (G5).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.metrics import from_label_counts  # noqa: F401  (re-export)

TripleKey = tuple[str, str, str]


def _triple_keys(batch: pa.Table) -> list[TripleKey]:
    return list(
        zip(
            batch["subj"].to_pylist(),
            batch["pred"].to_pylist(),
            batch["obj"].to_pylist(),
        )
    )


def triple_prf(
    triples: ray.data.Dataset, gold: set[TripleKey], symmetric_preds: set[str] = frozenset({"interacts_with"})
) -> dict[str, float]:
    """Exact-match P/R/F1 of distinct emitted triples vs a gold triple set.

    Predicates in ``symmetric_preds`` match in either direction (the STRING
    adjacency is symmetric, string_reader.py:112-120).
    """
    gold_norm = set()
    for s, p, o in gold:
        if p in symmetric_preds:
            a, b = sorted((s, o))
            gold_norm.add((a, p, b))
        else:
            gold_norm.add((s, p, o))

    gold_ref = ray.put(gold_norm)

    def tag(batch: pa.Table) -> pa.Table:
        g = ray.get(gold_ref)
        keys = _triple_keys(batch)
        norm_keys = []
        for s, p, o in keys:
            if p in symmetric_preds:
                a, b = sorted((s, o))
                norm_keys.append((a, p, b))
            else:
                norm_keys.append((s, p, o))
        return pa.table(
            {
                "key": pa.array(["\x1f".join(k) for k in norm_keys]),
                "hit": pa.array([k in g for k in norm_keys]),
            }
        )

    tagged = triples.map_batches(tag, batch_format="pyarrow")
    # distinct emitted triples (the pipeline already dedups; be safe)
    distinct = tagged.groupby("key").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    rows = distinct.take_all()
    n_emitted = len(rows)
    n_hit = sum(1 for r in rows if r["hit"])
    precision = n_hit / n_emitted if n_emitted else 0.0
    recall = n_hit / len(gold_norm) if gold_norm else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_emitted": n_emitted,
        "n_gold": len(gold_norm),
        "n_hit": n_hit,
    }


def unanimous_consensus(per_model: dict[str, ray.data.Dataset]) -> ray.data.Dataset:
    """G7: union tagged per-model predictions, keep keys with one distinct pred.

    Input: model name → predictions Dataset (src, pred, true).
    Output: (src, pred, true) rows on which all models agree.
    """
    tagged = []
    for name, ds in per_model.items():
        tagged.append(
            ds.map_batches(
                lambda b, n=name: b.append_column(
                    "model", pa.array([n] * len(b), type=pa.string())
                ),
                batch_format="pyarrow",
            )
        )
    union = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]
    n_models = len(per_model)

    def consensus(group: pa.Table) -> pa.Table:
        preds = set(group["pred"].to_pylist())
        models = set(group["model"].to_pylist())
        if len(preds) == 1 and len(models) == n_models:
            return group.slice(0, 1).drop_columns(["model"])
        return group.slice(0, 0).drop_columns(["model"])

    return union.groupby("src").map_groups(consensus, batch_format="pyarrow")
