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

from ..functions.arrowio import from_pandas_clean
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
        return from_pandas_clean(df, preserve_index=False)

    cand = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        # an all-filtered input loses its schema through to_pandas; there
        # is nothing to sort — return the (possibly column-less) empty
        return cand.reset_index(drop=True)
    return (
        cand.sort_values(sort_cols, ascending=ascending, kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


def negative_sample_triples(
    triples: ray.data.Dataset,
    pred: str,
    k: int,
    subj_col: str = "subj",
    obj_col: str = "obj",
    n_buckets: int = 16,
    entities: list[str] | None = None,
    symmetric: bool = False,
) -> ray.data.Dataset:
    """Deterministic tail-corruption negatives for KG-embedding training
    (the Bordes et al. NIPS'13 TransE scheme, filtered setting).

    For each positive (s, pred, o) and slot j ∈ [0, k): the candidate tail
    is ``entities[stable_hash(s|pred|o|j) % n_entities]`` — RNG-free, so
    the sample is partition-count invariant and resumable.  Candidates
    that are self-loops (neg == s) or that collide with a TRUE positive
    (s, neg) — either orientation when ``symmetric`` marks the KG
    undirected — are dropped; the collision filter is a distributed anti join
    (``shuffle_semi_join(anti=True)``), never a driver set, because at KG
    scale the positive set is itself a fact table.

    ``entities`` is the ENTITY VOCABULARY (sorted); like every broadcast
    side in this repo it is bounded by the vocab, not the corpus — pass it
    precomputed, or it is derived here via a distributed distinct over
    both endpoint columns with only the distinct entities reaching the
    driver.  Output: (subj, pred, neg_obj, slot) with slot the corruption
    index, so callers can trace sampling lineage.
    """
    from .join import shuffle_semi_join
    from .rollup import grouped_agg

    if entities is None:

        def endpoints(batch: pa.Table) -> pa.Table:
            ents = pa.concat_arrays(
                [
                    batch[subj_col].combine_chunks().cast(pa.string()),
                    batch[obj_col].combine_chunks().cast(pa.string()),
                ]
            )
            return pa.table({"entity": ents.unique()})

        ent_tbl = grouped_agg(
            triples.map_batches(endpoints, batch_format="pyarrow"),
            keys=["entity"],
            aggs={"n": ("entity", "count")},
            n_buckets=max(4, n_buckets // 4),
            partial=True,
        ).to_pandas()
        entities = sorted(ent_tbl["entity"])
    if len(entities) == 0:
        # No entity vocabulary (every edge filtered out upstream): the
        # modulo below would divide by zero — return a schemaed empty.
        return ray.data.from_arrow(
            pa.table(
                {
                    "subj": pa.array([], type=pa.string()),
                    "pred": pa.array([], type=pa.string()),
                    "neg_obj": pa.array([], type=pa.string()),
                    "slot": pa.array([], type=pa.int64()),
                }
            )
        )
    ents_arr = np.array(entities, dtype=object)
    ents_ref = ray.put(ents_arr)

    def corrupt(batch: pa.Table) -> pa.Table:
        ents = ray.get(ents_ref)
        n_ents = np.uint64(len(ents))
        subs = batch[subj_col].to_pylist()
        objs = batch[obj_col].to_pylist()
        keys = [
            f"{s}|{pred}|{o}|{j}"
            for s, o in zip(subs, objs)
            for j in range(k)
        ]
        idx = (stable_hash_u64(keys) % n_ents).astype(np.int64)
        neg = ents[idx]
        out_s = np.repeat(np.array(subs, dtype=object), k)
        slots = np.tile(np.arange(k, dtype=np.int64), len(subs))
        keep = neg != out_s  # self-loop corruption is never a usable negative
        return pa.table(
            {
                "subj": pa.array(out_s[keep], type=pa.string()),
                "pred": pa.array([pred] * int(keep.sum()), type=pa.string()),
                "neg_obj": pa.array(neg[keep], type=pa.string()),
                "slot": pa.array(slots[keep], type=pa.int64()),
            }
        )

    cand = triples.map_batches(corrupt, batch_format="pyarrow")

    def pos_key_rows(batch: pa.Table) -> pa.Table:
        s = batch[subj_col].combine_chunks().cast(pa.string())
        o = batch[obj_col].combine_chunks().cast(pa.string())
        if symmetric:  # undirected KG: (o, s) is equally a true edge
            return pa.table(
                {
                    "subj": pa.concat_arrays([s, o]),
                    "neg_obj": pa.concat_arrays([o, s]),
                }
            )
        return pa.table({"subj": s, "neg_obj": o})

    pos_keys = triples.map_batches(pos_key_rows, batch_format="pyarrow")
    return shuffle_semi_join(
        cand,
        pos_keys,
        keys=["subj", "neg_obj"],
        anti=True,
        n_buckets=n_buckets,
        left_schema={
            "subj": pa.string(),
            "pred": pa.string(),
            "neg_obj": pa.string(),
            "slot": pa.int64(),
        },
    )
