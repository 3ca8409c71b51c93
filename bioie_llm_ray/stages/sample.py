"""Distributed deterministic sampling (SURVEY §2.7 O1/O2, reference G3).

The reference samples with driver-resident ``random.seed(42)`` +
``random.sample`` over fully materialized pools (string_processor.py:176-187,
indra_processor.py:92-117).  The engine's replacement is *hash top-n*: the
sample is the n rows whose ``stable_hash(key)`` is smallest — deterministic
at any partition count, no RNG state, and computable as a streaming partial
aggregate:

1. per-batch kernel keeps that batch's n smallest distinct keys (vectorized
   pandas sort + dedup), emitting ≤ n rows per block;
2. a tree-reduce repartition applies the same kernel over the concatenated
   partials;
3. the driver merges the ≤ n×fan-in survivors once.

Nothing ever materializes more than n rows per block on any node, so the
sample of an 11.9M-pair STRING corpus (string_processor.py:168) — or its
100× version — costs one streaming pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import stable_hash_u64

_KEY_SEP = "\x1f"
_H = "__sh"
_K = "__sk"


def _kernel(batch: pa.Table, key_cols: list[str], n: int, group_col: str | None) -> pa.Table:
    """Keep the n smallest-hash distinct keys (per group) in this batch."""
    if len(batch) == 0:
        return batch
    if _K in batch.column_names:
        keys = batch[_K].to_pylist()
        h = batch[_H].to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        cols = [batch[c].to_pylist() for c in key_cols]
        keys = [_KEY_SEP.join(map(str, vals)) for vals in zip(*cols)]
        h = stable_hash_u64(keys)
        batch = batch.append_column(_H, pa.array(h.astype(np.int64)))
        batch = batch.append_column(_K, pa.array(keys, type=pa.string()))
    df = pd.DataFrame({"__k": keys, "__h": h})
    subset = ["__k"]
    sort_cols = ["__h", "__k"]
    if group_col is not None:
        df["__g"] = batch[group_col].to_pylist()
        subset = ["__g", "__k"]
        sort_cols = ["__g", "__h", "__k"]
    df = df.sort_values(sort_cols, kind="mergesort")
    df = df[~df.duplicated(subset=subset)]
    head = df.groupby("__g", sort=False).head(n) if group_col is not None else df.head(n)
    return batch.take(pa.array(np.sort(head.index.to_numpy())))


def distributed_hash_top_n(
    ds: ray.data.Dataset,
    key_cols: list[str] | str,
    n: int,
    group_col: str | None = None,
    fan_in: int = 8,
) -> pa.Table:
    """The n distinct-key rows with smallest stable hash (optionally per group).

    Replaces driver-side ``take_all()`` pools: per-block partial top-n →
    tree reduce → one driver merge of ≤ n×fan_in rows (× n_groups).
    Duplicate keys collapse to their first sorted occurrence, so the output
    has exactly ``min(n, n_distinct_keys)`` rows per group.  Returns a
    small Arrow table with the original columns.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def k1(batch: pa.Table) -> pa.Table:
        return _kernel(batch, key_cols, n, group_col)

    partials = ds.map_batches(k1, batch_format="pyarrow")
    reduced = partials.repartition(fan_in).map_batches(k1, batch_format="pyarrow")
    merged = _as_table(reduced)
    final = _kernel(merged, key_cols, n, group_col)
    return final.drop_columns([c for c in (_H, _K) if c in final.column_names])


def weighted_hash_top_n(
    ds: ray.data.Dataset,
    key_cols: list[str] | str,
    weight_col: str,
    n: int,
    fan_in: int = 8,
) -> pa.Table:
    """Deterministic weighted sample without replacement (streaming A-ES).

    Efraimidis–Spirakis reservoir sampling keeps the n rows with largest
    ``u^(1/w)``, u ~ Uniform(0,1); substituting the stable key hash for u
    makes the sample deterministic and partition-invariant while keeping
    the weighted inclusion law (cf. streaming weighted sampling over joins,
    EDBT'23 — the score is a per-row functional, so it distributes as a
    partial top-n exactly like the uniform sampler above).  Zero/negative
    weights are excluded.  Returns a small Arrow table of the sampled rows.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    _S = "__ws"

    def score(batch: pa.Table) -> pa.Table:
        if _S in batch.column_names:
            return batch
        cols = [batch[c].to_pylist() for c in key_cols]
        keys = [_KEY_SEP.join(map(str, vals)) for vals in zip(*cols)]
        u = (stable_hash_u64(keys).astype(np.float64) + 0.5) / 2.0**64
        w = np.asarray(
            batch[weight_col].to_numpy(zero_copy_only=False), dtype=np.float64
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
        return batch.append_column(_S, pa.array(s))

    def k1(batch: pa.Table) -> pa.Table:
        batch = score(batch)
        s = batch[_S].to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(s >= 0)
        if len(keep) > n:
            order = keep[np.argsort(-s[keep], kind="stable")][:n]
        else:
            order = keep
        return batch.take(pa.array(np.sort(order)))

    partials = ds.map_batches(k1, batch_format="pyarrow")
    reduced = partials.repartition(fan_in).map_batches(k1, batch_format="pyarrow")
    merged = _as_table(reduced)
    final = k1(merged)
    return final.drop_columns([_S])


def _as_table(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a (small, already-reduced) Dataset as one Arrow table."""
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t is not None and len(t)]
    if not tables:
        # empty: still need the schema for downstream concat
        empty = ray.get(refs[0]) if refs else None
        return empty if empty is not None else pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def distributed_sort_top_k(
    ds: ray.data.Dataset,
    sort_cols: list[str],
    ascending: list[bool],
    k: int,
) -> "pd.DataFrame":
    """Global top-k by arbitrary sort columns: per-block partial top-k +
    one driver merge of ≤ k rows per block.

    The ORDER BY ... LIMIT k primitive without a global sort — right
    whenever k ≪ rows per block.  ``sort_cols``/``ascending`` must make
    the ordering total (include a unique tie-break column) or the result
    is input-partitioning-dependent."""
    import pandas as pd

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            sort_cols, ascending=ascending, kind="stable"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return (
        cand.sort_values(sort_cols, ascending=ascending, kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
