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
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

_META = "_ZONES.json"


def write_sorted(
    ds: ray.data.Dataset,
    path: str,
    col: str,
    n_files: int = 16,
) -> dict:
    """Sort by ``col`` and write ``n_files`` zone-mapped Parquet files."""
    os.makedirs(path, exist_ok=True)
    ds.sort(col).repartition(n_files).write_parquet(path)
    zones = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        fp = os.path.join(path, f)
        md = pq.read_metadata(fp)
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            mins.append(stats.min)
            maxs.append(stats.max)
        if mins:
            zones.append({"file": f, "min": min(mins), "max": max(maxs)})
    meta = {"col": col, "zones": zones}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, default=str)
    return meta


def read_range(path: str, lo, hi) -> "ray.data.Dataset":
    """Dataset of rows with ``lo <= col <= hi`` — zone-pruned file list +
    residual in-scan filter.  Returns an empty-but-schema'd Dataset when
    no file overlaps."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    col = meta["col"]
    keep = [
        os.path.join(path, z["file"])
        for z in meta["zones"]
        if not (_lt(hi, z["min"]) or _lt(z["max"], lo))
    ]
    if not keep:
        any_file = os.path.join(path, meta["zones"][0]["file"])
        schema = pq.read_schema(any_file)
        return ray.data.from_arrow(schema.empty_table())

    ds = ray.data.read_parquet(keep)

    def residual(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = batch[col]
        return batch.filter(
            pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        )

    return ds.map_batches(residual, batch_format="pyarrow")


def pruned_fraction(path: str, lo, hi) -> float:
    """Fraction of files SKIPPED for this range — the observability hook
    tests assert on (pruning must actually prune)."""
    with open(os.path.join(path, _META)) as f:
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
