"""Global ordered scan (distributed prefix sum) and sequence packing.

Ray Data has no window/scan operator; this module supplies the classic
two-phase range-bucketed scan every engine grows eventually:

1. split the (integer, unique) order key's domain into ``n_buckets``
   contiguous ranges — range bucketing, NOT hash bucketing, so bucket b
   holds exactly the rows ordered before bucket b+1;
2. one streaming pass folds per-batch per-bucket partial sums; only
   ``n_buckets`` int64s reach the driver, which takes their exclusive
   prefix — the global offset of each bucket;
3. one exchange keyed on the bucket, then a single vectorized pass per
   bucket: sort by the order key, local inclusive cumsum, add the
   broadcast bucket offset.

Total cost: one extra streaming pass over the value column + one
bounded-key exchange — at 100 TB nothing but the B partial sums ever
reaches the driver.  The order key must be unique per row (ties would
make the inclusive prefix order-dependent); document ids are.

``pack_sequences`` composes the scan into GPT-style sequence packing:
documents concatenated in id order and chunked into fixed ``block_size``
token blocks, each doc mapped to its global token span and the block
range it lands in.  This is the "concat-and-chunk" layout LLM training
dataloaders consume; computing it distributedly is exactly the prefix-sum
problem above.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_BUCKET = "__scan_bucket"


def ordered_prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_buckets: int = 64,
    order_min: int | None = None,
    order_max: int | None = None,
) -> ray.data.Dataset:
    """Inclusive prefix sum of ``value_col`` in ``order_col`` order.

    Equivalent SQL: ``sum(value) OVER (ORDER BY order_col ROWS UNBOUNDED
    PRECEDING)``.  ``order_col`` must be integer and unique per row.
    Pass ``order_min``/``order_max`` when statically known to skip the
    domain-probe pass.
    """
    if order_min is None or order_max is None:
        from ray.data.aggregate import Max, Min

        mm = ds.aggregate(Min(order_col), Max(order_col))
        order_min = int(mm[f"min({order_col})"])
        order_max = int(mm[f"max({order_col})"])
    width = max(1, -(-(order_max - order_min + 1) // n_buckets))

    def bucket_of(col: pa.ChunkedArray) -> np.ndarray:
        o = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return (o - order_min) // width

    # phase 1: per-batch per-bucket partial sums (≤ n_buckets rows per batch)
    def partials(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[order_col])
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.zeros(n_buckets, dtype=np.int64)
        np.add.at(sums, b, v)
        nz = np.flatnonzero(sums)
        return pa.table(
            {
                "b": pa.array(nz, type=pa.int64()),
                "s": pa.array(sums[nz], type=pa.int64()),
            }
        )

    totals = np.zeros(n_buckets, dtype=np.int64)
    for row in ds.map_batches(partials, batch_format="pyarrow").take_all():
        totals[row["b"]] += row["s"]
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    off_ref = ray.put(offsets)

    # phase 2: bucket-keyed exchange, one vectorized cumsum per bucket
    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _BUCKET, pa.array(bucket_of(batch[order_col]), type=pa.int64())
        )

    def scan_bucket(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        b = int(group[_BUCKET][0].as_py())
        o = group[order_col].to_numpy(zero_copy_only=False)
        order = np.argsort(o, kind="stable")
        g = group.take(pa.array(order)).drop_columns([_BUCKET])
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        run = np.cumsum(v) + off[b]
        return g.append_column(out_col, pa.array(run, type=pa.int64()))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(scan_bucket, batch_format="pyarrow")
    )


def pack_sequences(
    ds: ray.data.Dataset,
    block_size: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing: docs concatenated in ``order_col``
    order, split into fixed ``block_size`` token blocks.

    Adds per doc: ``token_start`` (global offset of its first token),
    ``block_first``/``block_last`` (the block range the doc's tokens land
    in — a doc may straddle blocks, which is the layout's point: zero
    padding waste).  Input must already carry ``token_col``.
    """
    scanned = ordered_prefix_sum(
        ds, order_col, token_col, out_col="__cum", n_buckets=n_buckets
    )

    def spans(batch: pa.Table) -> pa.Table:
        cum = batch["__cum"].to_numpy(zero_copy_only=False)
        n = batch[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
        start = cum - n
        batch = batch.drop_columns(["__cum"])
        batch = batch.append_column(
            "token_start", pa.array(start, type=pa.int64())
        )
        batch = batch.append_column(
            "block_first", pa.array(start // block_size, type=pa.int64())
        )
        # empty docs occupy no tokens: block_last = block_first by convention
        last = np.where(n > 0, (start + n - 1) // block_size, start // block_size)
        return batch.append_column(
            "block_last", pa.array(last, type=pa.int64())
        )

    return scanned.map_batches(spans, batch_format="pyarrow")
