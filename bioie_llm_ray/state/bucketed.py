"""Hash-bucketed Parquet layout: pay the shuffle once, reuse it forever.

At 100 TB the dominant cost of a join/dedup/groupby is the all-to-all
exchange.  If a table is WRITTEN partitioned by ``hash(key) % B`` (one
directory per bucket), every later key-aligned operation can stream
bucket-by-bucket with ZERO shuffle:

- ``write_bucketed``: one streaming pass adds the bucket id and writes
  ``bucket=<i>/`` directories (Ray Data partitioned write).  Layout and
  key/B are recorded in ``_BUCKETS.json`` so readers validate alignment.
- ``read_bucketed``: the whole table (or one bucket) back as a Dataset.
- ``colocated_join``: joins two tables bucketed by the SAME (key, B) by
  reading aligned bucket pairs and joining each with the Arrow hash-join
  kernel inside plain Ray tasks — a join whose network cost is a read,
  not an exchange.  This is the engine's answer to "is there a groupby /
  repartition here that becomes an all-to-all at scale": for any stable
  join key, bucket the table once at ingest.

The bucket function is ``hash_bucket``/``bucket_ids_for_column`` — the
same stable hash the online ``shuffle_join`` uses, so a bucketed table can
also join against a streaming (unbucketed) side by bucketing only the
streaming side.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray

from ..functions.hashing import bucket_ids_for_column
from .fs import isdir, join, listdir, ray_fs, resolve

_META = "_BUCKETS.json"


def write_bucketed(
    ds: ray.data.Dataset,
    path: str,
    key: str,
    n_buckets: int = 32,
    filesystem=None,
) -> dict:
    """Write ``ds`` hash-partitioned by ``key`` into ``bucket=<i>/`` dirs."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(bucket_ids_for_column(batch[key], n_buckets))
        )

    fs, root = resolve(path, filesystem)
    fs.makedirs(root, exist_ok=True)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        root, partition_cols=["bucket"], filesystem=ray_fs(fs)
    )
    meta = {"key": key, "n_buckets": n_buckets}
    with fs.open(join(root, _META), "w") as f:
        json.dump(meta, f)
    return meta


def bucketed_meta(path: str, filesystem=None) -> dict:
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        return json.load(f)


def _bucket_dir(path: str, i: int) -> str:
    return join(path, f"bucket={i}")


def read_bucketed(
    path: str, bucket: int | None = None, filesystem=None
) -> ray.data.Dataset:
    """Read the table (or a single bucket) back; bucket column dropped."""
    fs, root = resolve(path, filesystem)
    meta = bucketed_meta(root, fs)
    if bucket is None:
        dirs = [
            _bucket_dir(root, i)
            for i in range(meta["n_buckets"])
            if isdir(fs, _bucket_dir(root, i))
        ]
    else:
        dirs = [_bucket_dir(root, bucket)]
    files = [
        join(d, f)
        for d in dirs
        for f in listdir(fs, d)
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files, filesystem=ray_fs(fs))


def colocated_join(
    left_path: str,
    right_path: str,
    join_type: str = "inner",
    keys: list[str] | str | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Shuffle-free join of two tables bucketed by the same (key, B).

    One Ray task per bucket reads the aligned pair of directories and joins
    them with the Arrow hash-join kernel; results stream back as a Dataset.
    Raises if the layouts disagree (different key or bucket count) — a
    misaligned co-located join would be silently wrong.
    """
    fs, left_root = resolve(left_path, filesystem)
    right_root = resolve(right_path, filesystem)[1]
    lm, rm = bucketed_meta(left_root, fs), bucketed_meta(right_root, fs)
    if (lm["key"], lm["n_buckets"]) != (rm["key"], rm["n_buckets"]):
        raise ValueError(
            f"bucket layouts disagree: left {lm} vs right {rm}; re-bucket "
            "one side (write_bucketed) before a colocated_join"
        )
    keys = keys or [lm["key"]]
    keys = [keys] if isinstance(keys, str) else list(keys)

    import pyarrow.parquet as pq

    l_dirs = {
        i
        for i in range(lm["n_buckets"])
        if isdir(fs, _bucket_dir(left_root, i))
    }
    r_dirs = {
        i
        for i in range(rm["n_buckets"])
        if isdir(fs, _bucket_dir(right_root, i))
    }
    if join_type == "inner":
        buckets = sorted(l_dirs & r_dirs)
    else:  # left outer: every left bucket participates
        buckets = sorted(l_dirs)
    if not buckets:
        return ray.data.from_items([])
    # right-side schema for empty-partner buckets (left outer joins)
    r_schema = None
    if r_dirs:
        some = _bucket_dir(right_root, min(r_dirs))
        f = next(p for p in listdir(fs, some) if p.endswith(".parquet"))
        with fs.open(join(some, f), "rb") as fh:
            r_schema = pq.read_schema(fh)
    elif join_type != "inner":
        raise ValueError(
            "left-outer colocated_join needs at least one right-side bucket "
            "to establish the joined schema; the right table is empty"
        )

    wfs = None if ray_fs(fs) is None else fs

    @ray.remote
    def join_bucket(i: int) -> pa.Table:
        import pyarrow.parquet as _pq

        lt = _pq.read_table(_bucket_dir(left_root, i), filesystem=wfs)
        if "bucket" in lt.column_names:
            lt = lt.drop_columns(["bucket"])
        if i in r_dirs:
            rt = _pq.read_table(_bucket_dir(right_root, i), filesystem=wfs)
            if "bucket" in rt.column_names:
                rt = rt.drop_columns(["bucket"])
        elif r_schema is not None:
            rt = r_schema.empty_table()
            if "bucket" in rt.column_names:
                rt = rt.drop_columns(["bucket"])
        else:
            return lt
        return lt.join(rt, keys=keys, join_type=join_type)

    # per-bucket join tasks; results stay in the object store (no driver
    # materialization) and feed Ray Data as block refs
    refs = [join_bucket.remote(i) for i in buckets]
    return ray.data.from_arrow_refs(refs)


def merge_upsert(
    base_path: str,
    changes: ray.data.Dataset,
    out_path: str,
    seq_cols: list[str] | str,
    delete_col: str = "deleted",
    filesystem=None,
) -> dict:
    """CDC MERGE: apply an upsert/delete changeset to a bucketed table.

    The Hudi/Delta ``MERGE INTO`` primitive, expressed shuffle-free over the
    bucketed layout: the delta is first WRITTEN bucketed by the base table's
    own (key, B) — a streaming partitioned write, never an all-to-all
    exchange — then one Ray task per bucket unions the aligned (base, delta)
    directory pair, keeps the highest-``seq_cols`` version per key, and drops
    keys whose winning version has ``delete_col`` true.  The output is a NEW
    bucketed table with the same layout (versioned storage: the base snapshot
    is left untouched, so a bad changeset is a cheap rollback), immediately
    usable by ``colocated_join`` / further ``merge_upsert`` rounds.

    Semantics (matching a SQL ``row_number() OVER (PARTITION BY key ORDER BY
    seq DESC) = 1`` compaction): the winner per key is the row with the
    lexicographically largest ``seq_cols``; ties break toward the DELTA side
    (a change beats an equal-sequence snapshot row).  Because "max over a
    union" is associative, merging a compacted prefix with the remaining
    changes gives byte-identical state to compacting the full log — the
    property the oracle checks.

    Both sides must share the key/seq/payload schema; a missing
    ``delete_col`` on either side is treated as all-false.  The per-bucket
    kernel is Arrow-native (sort_indices + boundary mask), and the output is
    cast back to the base schema so int64 keys stay int64 (the asof-join
    dtype lesson).
    """
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    fs, base_root = resolve(base_path, filesystem)
    out_root = resolve(out_path, filesystem)[1]
    meta = bucketed_meta(base_root, fs)
    key, n_buckets = meta["key"], meta["n_buckets"]
    seq_cols = [seq_cols] if isinstance(seq_cols, str) else list(seq_cols)

    # 1) one streaming partitioned write of the delta (no exchange)
    delta_root = out_root.rstrip("/") + ".delta"
    write_bucketed(
        changes, delta_root, key=key, n_buckets=n_buckets, filesystem=fs
    )

    fs.makedirs(out_root, exist_ok=True)
    b_dirs = {
        i for i in range(n_buckets) if isdir(fs, _bucket_dir(base_root, i))
    }
    d_dirs = {
        i for i in range(n_buckets) if isdir(fs, _bucket_dir(delta_root, i))
    }
    some = _bucket_dir(base_root, min(b_dirs)) if b_dirs else None
    if some is None:  # empty base: delta defines the schema
        some = _bucket_dir(delta_root, min(d_dirs))
    f = next(p for p in listdir(fs, some) if p.endswith(".parquet"))
    with fs.open(join(some, f), "rb") as fh:
        base_schema = pq.read_schema(fh)
    keep_names = [n for n in base_schema.names if n != "bucket"]

    wfs = None if ray_fs(fs) is None else fs

    @ray.remote
    def merge_bucket(i: int) -> int:
        import os as _os

        import pyarrow.parquet as _pq

        parts = []
        for src, path in ((0, base_root), (1, delta_root)):
            d = _bucket_dir(path, i)
            exists = isdir(fs, d) if wfs is not None else _os.path.isdir(d)
            if not exists:
                continue
            t = _pq.read_table(d, filesystem=wfs)
            if "bucket" in t.column_names:
                t = t.drop_columns(["bucket"])
            if delete_col not in t.column_names:
                t = t.append_column(
                    delete_col, pa.array([False] * len(t), type=pa.bool_())
                )
            t = t.select([n for n in keep_names if n in t.column_names]
                         + ([delete_col] if delete_col not in keep_names else []))
            t = t.append_column("__src", pa.array([src] * len(t), pa.int8()))
            parts.append(t)
        tbl = pa.concat_tables(parts, promote_options="permissive")
        order = (
            [(key, "ascending")]
            + [(c, "ascending") for c in seq_cols]
            + [("__src", "ascending")]
        )
        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=order))
        k = tbl[key].to_numpy(zero_copy_only=False)
        is_last = np.concatenate([k[1:] != k[:-1], [True]])
        winners = tbl.filter(pa.array(is_last))
        alive = winners.filter(
            pc.invert(pc.fill_null(winners[delete_col], False))
        )
        out = alive.select(keep_names)
        # schema fidelity: the merged table must read back as the base wrote
        out = out.cast(pa.schema([base_schema.field(n) for n in keep_names]))
        od = _bucket_dir(out_root, i)
        if wfs is not None:
            wfs.makedirs(od, exist_ok=True)
            with wfs.open(join(od, "part-0.parquet"), "wb") as fh:
                _pq.write_table(out, fh)
        else:
            _os.makedirs(od, exist_ok=True)
            _pq.write_table(out, join(od, "part-0.parquet"))
        return len(out)

    ray.get([merge_bucket.remote(i) for i in sorted(b_dirs | d_dirs)])
    out_meta = {"key": key, "n_buckets": n_buckets}
    with fs.open(join(out_root, _META), "w") as f:
        json.dump(out_meta, f)
    return out_meta


def rebucket_double(path: str, out_path: str, filesystem=None) -> dict:
    """Double a bucketed layout's bucket count WITHOUT a shuffle.

    Because the bucket id is ``hash % B``, growing to ``2B`` moves a row
    from bucket ``b`` only to ``b`` or ``b + B`` (``h % 2B ≡ b (mod B)``)
    — so each old bucket splits LOCALLY into exactly two new directories.
    The rewrite is one streaming pass: every task reads blocks of one old
    bucket and its partitioned write touches two output dirs; no
    cross-bucket byte ever moves.  This is how a bucketed store tracks
    data growth (resize at powers of two) while keeping every existing
    reader/join contract — the new layout validates against ``2B`` like
    any directly-written store."""
    fs, root = resolve(path, filesystem)
    out_root = resolve(out_path, filesystem)[1]
    meta = bucketed_meta(root, fs)
    key, nb2 = meta["key"], meta["n_buckets"] * 2

    def split(batch: pa.Table) -> pa.Table:
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column(
            "bucket", pa.array(bucket_ids_for_column(batch[key], nb2))
        )

    fs.makedirs(out_root, exist_ok=True)
    read_bucketed(root, filesystem=fs).map_batches(
        split, batch_format="pyarrow"
    ).write_parquet(
        out_root, partition_cols=["bucket"], filesystem=ray_fs(fs)
    )
    out_meta = {"key": key, "n_buckets": nb2}
    with fs.open(join(out_root, _META), "w") as f:
        json.dump(out_meta, f)
    return out_meta
