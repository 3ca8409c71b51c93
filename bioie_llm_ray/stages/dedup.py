"""Exact dedup / canonicalization shuffles with hot-key salting (SURVEY §2.8 E3).

The reference dedups triples via Python ``set`` inserts in driver memory
(string_processor.py:173, G8).  At scale that is a shuffle keyed by the
triple — and two things matter:

1. **Never one Python call per distinct key.**  ``groupby(key).map_groups``
   invokes the UDF once per group; at 10^9 distinct triples that is 10^9
   Python calls.  All dedups here group by ``stable_hash(key) % n_buckets``
   instead and run ONE vectorized Arrow ``group_by`` per bucket — per-key
   work stays in C.
2. **Hot keys (TP53-style hubs) skew the shuffle.**  ``salted_dedup`` runs a
   two-phase combine: phase 1 spreads duplicates of a key over
   ``n_salt`` sub-buckets (each keeps one row), phase 2 dedups the ≤n_salt
   survivors per key.  Because phase 1 already buckets by (key, salt), no
   single reducer sees a hub's full duplicate stream.

``batch_local_dedup`` is the shuffle-free combiner: duplicates co-occurring
in a batch collapse before anything moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_bucket

_KEY_SEP = "\x1f"
_KEY_COL = "__dk"
_BUCKET_COL = "__dbucket"


def _add_key_column(batch: pa.Table, key_cols: list[str], out: str) -> pa.Table:
    if len(key_cols) == 1:
        col = batch[key_cols[0]]
        if pa.types.is_string(col.type):
            # single string key: zero-copy reuse, no per-row join loop
            return batch.append_column(out, col)
        if pa.types.is_integer(col.type):
            import pyarrow.compute as pc

            return batch.append_column(out, pc.cast(col, pa.string()))
    cols = [batch[c].to_pylist() for c in key_cols]
    keys = (
        [_KEY_SEP.join(map(str, vals)) for vals in zip(*cols)] if cols else []
    )
    return batch.append_column(out, pa.array(keys, type=pa.string()))


def _add_key_and_bucket(
    batch: pa.Table, key_cols: list[str], n_buckets: int, salt_col: str | None = None, n_salt: int = 0
) -> pa.Table:
    batch = _add_key_column(batch, key_cols, _KEY_COL)
    keys = batch[_KEY_COL].to_pylist()
    if salt_col is not None:
        # fold a salt into the key so phase-1 groups are (key, salt)
        salt = hash_bucket(batch[salt_col].to_pylist(), n_salt)
        keys = [f"{k}{_KEY_SEP}{s}" for k, s in zip(keys, salt)]
        batch = batch.set_column(
            batch.column_names.index(_KEY_COL),
            _KEY_COL,
            pa.array(keys, type=pa.string()),
        )
    return batch.append_column(
        _BUCKET_COL, pa.array(hash_bucket(keys, n_buckets))
    )


def _first_per_key_in_bucket(group: pa.Table) -> pa.Table:
    """One vectorized dedup per bucket: keep the first row of each key."""
    import pyarrow.compute as pc

    # group_by preserves no row payload — use first-occurrence indices instead
    keys = group[_KEY_COL]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    # dictionary-encode → codes; first occurrence of each code wins
    codes_np = pc.dictionary_encode(keys).indices.to_numpy(
        zero_copy_only=False
    )
    _, first_idx = np.unique(codes_np, return_index=True)
    return group.take(pa.array(np.sort(first_idx)))


def exact_dedup(ds, key_cols: list[str], n_buckets: int = 64):
    """Keep one row per distinct key tuple.

    Shuffle keyed by ``hash(key) % n_buckets`` (bounded reducer count); the
    per-bucket dedup is one numpy/Arrow pass, not one call per key.
    """
    keyed = ds.map_batches(
        lambda b: _add_key_and_bucket(b, key_cols, n_buckets),
        batch_format="pyarrow",
    )
    out = keyed.groupby(_BUCKET_COL).map_groups(
        _first_per_key_in_bucket, batch_format="pyarrow"
    )
    return out.drop_columns([_KEY_COL, _BUCKET_COL])


def salted_dedup(
    ds,
    key_cols: list[str],
    salt_col: str,
    n_salt: int = 16,
    n_buckets: int = 64,
):
    """Two-phase exact dedup for skewed keys.

    ``salt_col`` is any column whose value varies across duplicates of the
    same key (e.g. the source-document sha) — its hash spreads a hot key over
    ``n_salt`` phase-1 reducers before the unsalted phase-2 dedup.
    """
    phase1 = ds.map_batches(
        lambda b: _add_key_and_bucket(
            b, key_cols, n_buckets, salt_col=salt_col, n_salt=n_salt
        ),
        batch_format="pyarrow",
    )
    phase1 = phase1.groupby(_BUCKET_COL).map_groups(
        _first_per_key_in_bucket, batch_format="pyarrow"
    ).drop_columns([_KEY_COL, _BUCKET_COL])
    # phase 2: ≤ n_salt rows per key remain — plain bucketed dedup
    return exact_dedup(phase1, key_cols, n_buckets=n_buckets)


def batch_local_dedup(ds, key_cols: list[str]):
    """Combiner-style pre-dedup inside each batch (no shuffle).

    Run before a global dedup to shrink the shuffle: duplicates that co-occur
    in a batch collapse early — the same partial-aggregation idea as
    pre-summing before a groupby.
    """

    def local(batch: pa.Table) -> pa.Table:
        batch = _add_key_column(batch, key_cols, _KEY_COL)
        out = _first_per_key_in_bucket(batch)
        return out.drop_columns([_KEY_COL])

    return ds.map_batches(local, batch_format="pyarrow")


def argmax_dedup(
    ds,
    key_cols: list[str],
    order_col: str | list[str],
    n_buckets: int = 64,
    descending: bool = True,
):
    """Keep the row with the max (default) / min ``order_col`` per key —
    last-writer-wins semantics (snapshot of a versioned table, CDC compaction,
    "latest commit per file path").

    Same shuffle shape as ``exact_dedup`` (hash(key) % n_buckets, one
    vectorized pass per bucket, never one Python call per key); the
    per-bucket kernel sorts (key, order desc) and keeps each key's first
    row.  ``order_col`` may be a list (lexicographic, e.g. ``(ts,
    event_id)``); ties on the full order break by first-seen after a
    stable sort — make the order unique for fully deterministic output.
    """
    import pyarrow.compute as pc

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    keyed = ds.map_batches(
        lambda b: _add_key_and_bucket(b, key_cols, n_buckets),
        batch_format="pyarrow",
    )

    def best_per_key(group: pa.Table) -> pa.Table:
        direction = "descending" if descending else "ascending"
        order = pc.sort_indices(
            group,
            sort_keys=[(_KEY_COL, "ascending")]
            + [(c, direction) for c in order_cols],
        )
        return _first_per_key_in_bucket(group.take(order))

    out = keyed.groupby(_BUCKET_COL).map_groups(
        best_per_key, batch_format="pyarrow"
    )
    return out.drop_columns([_KEY_COL, _BUCKET_COL])


def cdc_apply(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str,
    delete_ops: set[str],
    n_buckets: int = 64,
):
    """Apply a change-data-capture log: last-writer-wins per key with
    tombstones — the MERGE/compaction primitive of log-structured tables
    (Hudi/Delta-style upsert streams, Kafka compacted topics).

    Each key's surviving state is its row with the lexicographically
    greatest ``order_cols``; if that row's ``op_col`` is a delete marker the
    key is dropped entirely.  One ``argmax_dedup`` exchange (hash(key) %
    n_buckets, vectorized per-bucket sort) followed by a streaming
    vectorized tombstone filter — deletes must be resolved AFTER the
    arg-max, never by pre-filtering (a delete followed by a re-insert must
    resurrect the key, and an insert followed by a delete must not).
    """
    import pyarrow.compute as pc

    latest = argmax_dedup(ds, key_cols, order_cols, n_buckets=n_buckets)

    def drop_tombstones(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.is_in(batch[op_col], value_set=pa.array(sorted(delete_ops)))
        )
        return batch.filter(keep)

    return latest.map_batches(drop_tombstones, batch_format="pyarrow")
