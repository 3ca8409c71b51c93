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
import os

import pyarrow as pa
import ray

from ..functions.hashing import bucket_ids_for_column

_META = "_BUCKETS.json"


def write_bucketed(
    ds: ray.data.Dataset,
    path: str,
    key: str,
    n_buckets: int = 32,
) -> dict:
    """Write ``ds`` hash-partitioned by ``key`` into ``bucket=<i>/`` dirs."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(bucket_ids_for_column(batch[key], n_buckets))
        )

    os.makedirs(path, exist_ok=True)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )
    meta = {"key": key, "n_buckets": n_buckets}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)
    return meta


def bucketed_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        return json.load(f)


def _bucket_dir(path: str, i: int) -> str:
    return os.path.join(path, f"bucket={i}")


def read_bucketed(path: str, bucket: int | None = None) -> ray.data.Dataset:
    """Read the table (or a single bucket) back; bucket column dropped."""
    meta = bucketed_meta(path)
    if bucket is None:
        dirs = [
            _bucket_dir(path, i)
            for i in range(meta["n_buckets"])
            if os.path.isdir(_bucket_dir(path, i))
        ]
    else:
        dirs = [_bucket_dir(path, bucket)]
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)


def colocated_join(
    left_path: str,
    right_path: str,
    join_type: str = "inner",
    keys: list[str] | str | None = None,
) -> ray.data.Dataset:
    """Shuffle-free join of two tables bucketed by the same (key, B).

    One Ray task per bucket reads the aligned pair of directories and joins
    them with the Arrow hash-join kernel; results stream back as a Dataset.
    Raises if the layouts disagree (different key or bucket count) — a
    misaligned co-located join would be silently wrong.
    """
    lm, rm = bucketed_meta(left_path), bucketed_meta(right_path)
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
        if os.path.isdir(_bucket_dir(left_path, i))
    }
    r_dirs = {
        i
        for i in range(rm["n_buckets"])
        if os.path.isdir(_bucket_dir(right_path, i))
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
        some = _bucket_dir(right_path, min(r_dirs))
        f = next(p for p in sorted(os.listdir(some)) if p.endswith(".parquet"))
        r_schema = pq.read_schema(os.path.join(some, f))
    elif join_type != "inner":
        raise ValueError(
            "left-outer colocated_join needs at least one right-side bucket "
            "to establish the joined schema; the right table is empty"
        )

    @ray.remote
    def join_bucket(i: int) -> pa.Table:
        import pyarrow.parquet as _pq

        lt = _pq.read_table(_bucket_dir(left_path, i))
        if "bucket" in lt.column_names:
            lt = lt.drop_columns(["bucket"])
        if i in r_dirs:
            rt = _pq.read_table(_bucket_dir(right_path, i))
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
