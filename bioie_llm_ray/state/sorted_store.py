"""Range-sorted Parquet layout with zone-map file pruning.

The complement of ``bucketed.py``: hash bucketing serves equality keys
(joins, dedup); SORTING serves range predicates.  A table written sorted on
a column lands each file with a narrow [min, max] span on that column, so a
range scan can skip every file whose span misses the predicate — reading
becomes O(selectivity), not O(table).  At 100 TB this is the difference
between scanning a day and scanning three years.

- ``write_sorted``: one ``Dataset.sort`` (the single paid exchange) →
  ``n_files`` Parquet files; per-file [min, max] of the sort column is
  recorded in ``_ZONES.json`` (the zone map).  Parquet footers carry the
  same stats — the sidecar just avoids touching ``n_files`` footers on
  every read at scale.
- ``read_range``: prunes the zone map, reads only overlapping files, and
  applies the residual row filter in the scan task (files straddling the
  bounds contain out-of-range rows).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .fs import join, listdir, ray_fs, resolve

_META = "_ZONES.json"


def write_sorted(
    ds: ray.data.Dataset,
    path: str,
    col: str,
    n_files: int = 16,
    filesystem=None,
) -> dict:
    """Sort by ``col`` and write ``n_files`` zone-mapped Parquet files."""
    fs, root = resolve(path, filesystem)
    fs.makedirs(root, exist_ok=True)
    ds.sort(col).repartition(n_files).write_parquet(
        root, filesystem=ray_fs(fs)
    )
    zones = []
    for f in listdir(fs, root):
        if not f.endswith(".parquet"):
            continue
        with fs.open(join(root, f), "rb") as fh:
            md = pq.read_metadata(fh)
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            mins.append(stats.min)
            maxs.append(stats.max)
        if mins:
            zones.append({"file": f, "min": min(mins), "max": max(maxs)})
    meta = {"col": col, "zones": zones}
    with fs.open(join(root, _META), "w") as f:
        json.dump(meta, f, default=str)
    return meta


def read_range(path: str, lo, hi, filesystem=None) -> "ray.data.Dataset":
    """Dataset of rows with ``lo <= col <= hi`` — zone-pruned file list +
    residual in-scan filter.  Returns an empty-but-schema'd Dataset when
    no file overlaps."""
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        meta = json.load(f)
    col = meta["col"]
    keep = [
        join(root, z["file"])
        for z in meta["zones"]
        if not (_lt(hi, z["min"]) or _lt(z["max"], lo))
    ]
    if not keep:
        with fs.open(join(root, meta["zones"][0]["file"]), "rb") as fh:
            schema = pq.read_schema(fh)
        return ray.data.from_arrow(schema.empty_table())

    ds = ray.data.read_parquet(keep, filesystem=ray_fs(fs))

    def residual(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = batch[col]
        return batch.filter(
            pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        )

    return ds.map_batches(residual, batch_format="pyarrow")


def pruned_fraction(path: str, lo, hi, filesystem=None) -> float:
    """Fraction of files SKIPPED for this range — the observability hook
    tests assert on (pruning must actually prune)."""
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        meta = json.load(f)
    zones = meta["zones"]
    kept = sum(
        1 for z in zones if not (_lt(hi, z["min"]) or _lt(z["max"], lo))
    )
    return 1.0 - kept / len(zones) if zones else 0.0


def _lt(a, b) -> bool:
    """Compare possibly-JSON-stringified zone bounds against live values."""
    if isinstance(a, str) or isinstance(b, str):
        return str(a) < str(b)
    return a < b
