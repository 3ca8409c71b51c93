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
        # strip any pandas schema-metadata blob (zero-copy) before the
        # exchange: hash(schema) raises on it, defeating Ray's block-schema
        # dedup and warning from every shuffle worker (functions/arrowio.py)
        return batch.replace_schema_metadata(None).append_column(
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


def global_order_ranks(
    ds: ray.data.Dataset,
    order_col: str,
    tiebreak: list[str] | None = None,
    n_buckets: int = 64,
    sample_per_block: int = 32,
    ntile: int | None = None,
    out_prefix: str = "",
) -> ray.data.Dataset:
    """Global ``row_number`` / ``rank`` / ``dense_rank`` / ``percent_rank``
    / ``cume_dist`` (and optionally ``ntile``) over an arbitrary ORDER BY —
    the TeraSort-style sampled-splitter range partition, generalized to
    ranking with ties.

    ``ordered_prefix_sum`` needs an integer, unique order key; this operator
    takes any comparable ``order_col`` (int, float, string, timestamp), with
    ties, plus ``tiebreak`` columns that make (order_col, *tiebreak) unique so
    ``row_number`` is deterministic (SQL ``row_number() OVER (ORDER BY
    order_col, *tiebreak)``; ``rank``/``dense_rank`` use ``order_col`` alone,
    exactly like SQL).

    Plan — nothing bigger than ``n_buckets`` scalars ever reaches the driver:

    1. **sample pass**: up to ``sample_per_block`` evenly spaced order-key
       values per block; the driver sorts the sample and takes ``n_buckets-1``
       quantile splitters.  Bucketing is ``searchsorted(splitters, key,
       side='right')`` — all EQUAL keys land in one bucket, which is what
       makes per-bucket rank/dense_rank exact.
    2. **one range exchange**: ``groupby(bucket)``, one vectorized pandas pass
       per bucket (sort, positional row number, first-occurrence rank,
       cumsum-of-changes dense rank) — local ranks only.
    3. the ranked dataset is **materialized once** (it is the operator's
       output size — the barrier every distributed sort pays), then a
       combiner pass folds per-bucket (rows, distinct-keys) maxima —
       ``n_buckets`` pairs — whose exclusive prefixes are the global offsets.
    4. a final streaming ``map_batches`` adds the offsets (and computes
       ``ntile`` from the global row number + total count: SQL semantics,
       first ``N % n`` tiles get the extra row).

    Skew: a constant order key degenerates to one bucket — inherent to
    ranking (every row ties); any non-degenerate distribution is spread by
    the sampled quantiles regardless of shape.
    """
    tiebreak = list(tiebreak or [])
    sort_cols = [order_col] + tiebreak
    rn_col = out_prefix + "row_number"
    rk_col = out_prefix + "rank"
    dr_col = out_prefix + "dense_rank"

    # --- 1. sampled splitters --------------------------------------------
    def sample(batch: pa.Table) -> pa.Table:
        m = len(batch)
        k = min(sample_per_block, m)
        idx = np.linspace(0, m - 1, k).astype(np.int64) if k else []
        return pa.table({"v": batch[order_col].take(pa.array(idx))})

    sampled = sorted(
        r["v"] for r in ds.map_batches(sample, batch_format="pyarrow").take_all()
    )
    if not sampled:
        raise ValueError("global_order_ranks: empty input dataset")
    pos = [
        (i + 1) * len(sampled) // n_buckets for i in range(n_buckets - 1)
    ]
    splitters = np.array([sampled[min(p, len(sampled) - 1)] for p in pos])

    def bucket_of(col: pa.ChunkedArray) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False)
        # take_all returns Python scalars (e.g. Timestamp for timestamp
        # columns) while batches yield numpy dtypes — coerce the tiny
        # splitter array, never the data column
        sp = splitters if splitters.dtype == v.dtype else splitters.astype(v.dtype)
        return np.searchsorted(sp, v, side="right").astype(np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        # strip any pandas schema-metadata blob (zero-copy) before the
        # exchange: hash(schema) raises on it, defeating Ray's block-schema
        # dedup and warning from every shuffle worker (functions/arrowio.py)
        return batch.replace_schema_metadata(None).append_column(
            _BUCKET, pa.array(bucket_of(batch[order_col]), type=pa.int64())
        )

    # --- 2. per-bucket local ranks (one vectorized pass per range) -------
    cume_col = out_prefix + "__cume_pos"

    def local_ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        m = len(g)
        pos = np.arange(1, m + 1, dtype=np.int64)
        keys = g[order_col].to_numpy()
        is_new = np.ones(m, dtype=bool)
        if m > 1:
            is_new[1:] = keys[1:] != keys[:-1]
        g[rn_col] = pos
        g[rk_col] = np.maximum.accumulate(np.where(is_new, pos, 0))
        g[dr_col] = np.cumsum(is_new)
        # last peer position per key (for cume_dist): next group start − 1
        starts = np.flatnonzero(is_new)
        last = np.append(starts[1:], m)  # 1-based position of each key's
        g[cume_col] = last[np.cumsum(is_new) - 1]  # last peer
        return g

    ranked = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(local_ranks, batch_format="pandas")
        .materialize()
    )

    # --- 3. per-bucket (rows, distincts) maxima -> global offsets --------
    def stat_partial(batch: pa.Table) -> pa.Table:
        b = batch[_BUCKET].to_numpy(zero_copy_only=False)
        rows = np.zeros(n_buckets, dtype=np.int64)
        dist = np.zeros(n_buckets, dtype=np.int64)
        np.maximum.at(rows, b, batch[rn_col].to_numpy(zero_copy_only=False))
        np.maximum.at(dist, b, batch[dr_col].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(rows)
        return pa.table(
            {
                "b": pa.array(nz, type=pa.int64()),
                "rows": pa.array(rows[nz], type=pa.int64()),
                "dist": pa.array(dist[nz], type=pa.int64()),
            }
        )

    rows = np.zeros(n_buckets, dtype=np.int64)
    dist = np.zeros(n_buckets, dtype=np.int64)
    for r in ranked.map_batches(stat_partial, batch_format="pyarrow").take_all():
        rows[r["b"]] = max(rows[r["b"]], r["rows"])
        dist[r["b"]] = max(dist[r["b"]], r["dist"])
    total = int(rows.sum())
    row_off = np.concatenate([[0], np.cumsum(rows)[:-1]])
    dist_off = np.concatenate([[0], np.cumsum(dist)[:-1]])
    offs_ref = ray.put((row_off, dist_off, total))

    # --- 4. streaming offset add (+ SQL-semantics ntile) -----------------
    def add_offsets(batch: pa.Table) -> pa.Table:
        r_off, d_off, n_total = ray.get(offs_ref)
        b = batch[_BUCKET].to_numpy(zero_copy_only=False)
        rn = batch[rn_col].to_numpy(zero_copy_only=False) + r_off[b]
        rk = batch[rk_col].to_numpy(zero_copy_only=False) + r_off[b]
        dr = batch[dr_col].to_numpy(zero_copy_only=False) + d_off[b]
        cume = batch[cume_col].to_numpy(zero_copy_only=False) + r_off[b]
        batch = batch.drop_columns([_BUCKET, rn_col, rk_col, dr_col, cume_col])
        batch = batch.append_column(rn_col, pa.array(rn, type=pa.int64()))
        batch = batch.append_column(rk_col, pa.array(rk, type=pa.int64()))
        batch = batch.append_column(dr_col, pa.array(dr, type=pa.int64()))
        # SQL percent_rank = (rank−1)/(N−1); cume_dist = last-peer-pos / N
        pr = (rk - 1) / (n_total - 1) if n_total > 1 else rk * 0.0
        batch = batch.append_column(
            out_prefix + "percent_rank", pa.array(pr, type=pa.float64())
        )
        batch = batch.append_column(
            out_prefix + "cume_dist",
            pa.array(cume / n_total, type=pa.float64()),
        )
        if ntile is not None:
            q, rem = divmod(n_total, ntile)
            cut = rem * (q + 1)
            small = np.maximum(q, 1)  # q==0: first branch covers every row
            tile = np.where(
                rn <= cut,
                (rn - 1) // (q + 1) + 1,
                rem + (rn - 1 - cut) // small + 1,
            )
            batch = batch.append_column(
                out_prefix + "ntile", pa.array(tile, type=pa.int64())
            )
        return batch

    return ranked.map_batches(add_offsets, batch_format="pyarrow")


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


def ordered_count_scan(
    g: ray.data.Dataset,
    s_col: str,
    count_cols: list[str],
    n_buckets: int = 32,
    sample_n: int = 2048,
):
    """Range-bucketed ordered-scan scaffolding over a DISTINCT-KEY count
    table (s, c1, c2, ...): sampled splitters on the float key, bucket
    tags, per-bucket totals of every count column folded to B int64s on
    the driver, and each column's EXCLUSIVE prefix (the cumulative count
    entering each bucket).  The caller finishes with one vectorized pass
    per bucket (groupby on the returned tag column) seeded by the offsets
    — this is the shared machinery of the exact AUC and two-sample-KS
    pipelines, factored so the two stay in sync.

    Returns ``(tagged, offsets, totals)``: the MATERIALIZED tagged table
    (the input is consumed twice — sampling and scanning — and is
    distinct-key-bounded, so materializing is bounded), ``offsets[col]``
    a length-B exclusive-prefix array, ``totals[col]`` the grand total.
    The bucket tag column is ``"__b"``.
    """
    g = g.materialize()  # consumed by the sampler AND the scan passes
    samp = np.array(
        [r[s_col] for r in g.limit(sample_n).take_all()], dtype=np.float64
    )
    splitters = (
        np.unique(np.quantile(samp, np.linspace(0, 1, n_buckets)[1:]))
        if len(samp)
        else np.array([], dtype=np.float64)
    )
    spl_ref = ray.put(splitters)
    nb = len(splitters) + 1

    def tag(batch: pa.Table) -> pa.Table:
        spl = ray.get(spl_ref)
        b = np.searchsorted(
            spl, batch[s_col].to_numpy(zero_copy_only=False), side="right"
        )
        return batch.replace_schema_metadata(None).append_column(
            "__b", pa.array(b.astype(np.int64))
        )

    tagged = g.map_batches(tag, batch_format="pyarrow").materialize()

    def btot(batch: pa.Table) -> pa.Table:
        bk = batch["__b"].to_numpy(zero_copy_only=False)
        cols = {"b": pa.array(np.arange(nb, dtype=np.int64))}
        for c in count_cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            tot = np.zeros(nb, dtype=np.int64)
            np.add.at(tot, bk, v)
            cols[c] = pa.array(tot, type=pa.int64())
        return pa.table(cols)

    totals = {c: np.zeros(nb, dtype=np.int64) for c in count_cols}
    for r in tagged.map_batches(btot, batch_format="pyarrow").take_all():
        for c in count_cols:
            totals[c][r["b"]] += r[c]
    offsets = {
        c: np.concatenate([[0], np.cumsum(totals[c])[:-1]])
        for c in count_cols
    }
    grand = {c: int(totals[c].sum()) for c in count_cols}
    return tagged, offsets, grand
