"""Classification metrics with sklearn parity (SURVEY §2.6 G4).

The reference scores with ``sklearn.metrics.precision_recall_fscore_support``
and ``accuracy_score`` (/root/reference/src/evaluators/evaluator.py:10-31).
sklearn is not available in this environment, so the exact semantics are
reimplemented with numpy:

- label set = sorted union of true and pred labels (sklearn default),
- per-label P = TP/(TP+FP), R = TP/(TP+FN), F = 2PR/(P+R), 0 where undefined,
- macro = unweighted mean over the label set,
- micro = global TP / global (TP+FP) etc.,
- weighted = support(true count)-weighted mean.

Distributed use: per-label (TP, FP, FN, support) counts are computed as
partial aggregates inside ``map_batches`` and merged with a tiny groupby —
the final division happens once on the driver (``from_label_counts``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa


def label_counts(true: Sequence[str], pred: Sequence[str]) -> dict[str, list[int]]:
    """Per-label [tp, fp, fn, support] counts — the mergeable partial."""
    counts: dict[str, list[int]] = {}
    for t, p in zip(true, pred):
        if t == p:
            counts.setdefault(t, [0, 0, 0, 0])[0] += 1
        else:
            counts.setdefault(p, [0, 0, 0, 0])[1] += 1
            counts.setdefault(t, [0, 0, 0, 0])[2] += 1
        counts.setdefault(t, [0, 0, 0, 0])[3] += 1
    return counts


def merge_label_counts(parts: Sequence[dict[str, list[int]]]) -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for part in parts:
        for label, c in part.items():
            acc = out.setdefault(label, [0, 0, 0, 0])
            for i in range(4):
                acc[i] += c[i]
    return out


def from_label_counts(counts: dict[str, list[int]]) -> dict[str, float]:
    """Final metrics from merged per-label counts (sklearn semantics)."""
    labels = sorted(counts)
    tp = np.array([counts[l][0] for l in labels], dtype=np.float64)
    fp = np.array([counts[l][1] for l in labels], dtype=np.float64)
    fn = np.array([counts[l][2] for l in labels], dtype=np.float64)
    support = np.array([counts[l][3] for l in labels], dtype=np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        r = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        f = np.where(p + r > 0, 2 * p * r / (p + r), 0.0)

    n = support.sum()
    tp_g, fp_g, fn_g = tp.sum(), fp.sum(), fn.sum()
    micro_p = tp_g / (tp_g + fp_g) if tp_g + fp_g > 0 else 0.0
    micro_r = tp_g / (tp_g + fn_g) if tp_g + fn_g > 0 else 0.0
    micro_f = (
        2 * micro_p * micro_r / (micro_p + micro_r) if micro_p + micro_r > 0 else 0.0
    )
    w = support / n if n > 0 else support
    return {
        "accuracy": float(tp_g / n) if n > 0 else 0.0,
        "macro_p": float(p.mean()) if len(labels) else 0.0,
        "macro_r": float(r.mean()) if len(labels) else 0.0,
        "macro_f": float(f.mean()) if len(labels) else 0.0,
        "micro_p": float(micro_p),
        "micro_r": float(micro_r),
        "micro_f": float(micro_f),
        "weighted_p": float((p * w).sum()),
        "weighted_r": float((r * w).sum()),
        "weighted_f": float((f * w).sum()),
    }


def compute_metrics(true: Sequence[str], pred: Sequence[str]) -> dict[str, float]:
    """Single-shot metrics over in-memory lists (evaluator.py:10-31 parity)."""
    return from_label_counts(label_counts(true, pred))


def metrics_from_predictions(ds, true_col: str = "true", pred_col: str = "pred"):
    """Distributed metrics over a predictions Dataset.

    Partial per-label counts per batch (map_batches combiner), merged by a
    small groupby — the shuffle moves one row per (label, batch), not per
    prediction (SURVEY §7.4 "metrics by label").
    """

    def partial(batch: pa.Table) -> pa.Table:
        counts = label_counts(
            batch[true_col].to_pylist(), batch[pred_col].to_pylist()
        )
        labels = list(counts)
        return pa.table(
            {
                "label": pa.array(labels, type=pa.string()),
                "tp": pa.array([counts[l][0] for l in labels], type=pa.int64()),
                "fp": pa.array([counts[l][1] for l in labels], type=pa.int64()),
                "fn": pa.array([counts[l][2] for l in labels], type=pa.int64()),
                "support": pa.array([counts[l][3] for l in labels], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
            Sum("support", alias_name="support"),
        )
        .to_pandas()
    )
    counts = {
        row["label"]: [row["tp"], row["fp"], row["fn"], row["support"]]
        for _, row in merged.iterrows()
    }
    return from_label_counts(counts)


def full_match_counts(ds, k: int = 10):
    """Per-query full/none-match analytics (SURVEY §2.6 G5).

    Reference semantics (generative_task_evaluator.py:88-110): a query is a
    "full match" when all k aligned positions agree, "none match" when zero
    positions agree.  Returns (n_full, n_none, n_queries).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def hits(batch: pa.Table) -> pa.Table:
        eq = pc.cast(pc.equal(batch["pred"], batch["true"]), pa.int64())
        return pa.table({"src": batch["src"], "hit": eq})

    per_src = (
        ds.map_batches(hits, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("hit", alias_name="n_hits"), Count(alias_name="n_rows"))
        .to_pandas()
    )
    n_full = int((per_src["n_hits"] == k).sum())
    n_none = int((per_src["n_hits"] == 0).sum())
    return n_full, n_none, len(per_src)
