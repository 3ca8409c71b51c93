"""Z-order (Morton-curve) clustered Parquet layout for 2-D box pruning.

``sorted_store`` prunes ONE dimension; a query that filters two columns
(user AND time, region AND price) gets no help on the second from a linear
sort — every file spans the full second-column domain.  Interleaving the
bits of both columns (the Morton curve, the layout behind Delta/Iceberg
``OPTIMIZE ZORDER BY``) keeps files *locally rectangular*: each file's
[min, max] span is narrow on BOTH columns, so a 2-D box query prunes on
both, turning the scan O(box) instead of O(selectivity of one dimension).

- ``write_zordered``: per-column [min, max] fold (one streaming pass) →
  per-row 32-bit z-value from two 16-bit uniformly scaled coordinates
  (vectorized magic-mask interleave) → ONE paid sort on z →
  ``n_files`` files + ``_ZONES2D.json`` with per-file min/max of BOTH
  columns.  Uniform scaling is right for roughly uniform domains; for
  heavy skew substitute the quantile map from ``sketch.approx_quantiles_hist``
  (the z-math is identical — only the coordinate transform changes).
- ``read_box``: prune files whose span misses either side of the box,
  residual-filter in-scan.  Exact regardless of pruning (the zone map can
  only over-approximate file spans).
- ``pruned_fraction``: observability hook the tests assert on.

Timestamps: cast to int64 (epoch units) before writing; the store is
integer-typed by contract (z-interleave needs a total order with uniform
scaling, and JSON zone bounds stay lossless).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .fs import join, listdir, ray_fs, resolve

_META = "_ZONES2D.json"
_Z = "__z"


def _spread16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits (uint32 in, uint32 out)."""
    x = v.astype(np.uint32) & np.uint32(0xFFFF)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def morton32(x16: np.ndarray, y16: np.ndarray) -> np.ndarray:
    """32-bit Morton code from two 16-bit coordinate arrays."""
    return (_spread16(x16) << np.uint32(1)) | _spread16(y16)


def _scale16(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Uniform [lo, hi] → [0, 65535] bucket per value (int64-safe)."""
    if hi <= lo:
        return np.zeros(len(v), dtype=np.uint32)
    f = (v.astype(np.float64) - lo) / (hi - lo)
    return np.clip((f * 65535.0).astype(np.int64), 0, 65535).astype(np.uint32)


def write_zordered(
    ds: ray.data.Dataset,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    filesystem=None,
) -> dict:
    """Cluster by the Morton curve of (x_col, y_col); write zone maps."""
    fs, root = resolve(path, filesystem)
    fs.makedirs(root, exist_ok=True)
    # Idempotent on retry: a crashed run may have left data files but no
    # _META marker; the zone-map sweep below reads EVERY *.parquet in the
    # dir, so stale files from a partial write would double-count rows.
    for stale in listdir(fs, root):
        if stale.endswith(".parquet") or stale == _META:
            fs.rm(join(root, stale))

    # pass 1: global [min, max] per dimension — one streaming fold,
    # two scalars per block reach the driver
    def minmax(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "xlo": [pc.min(batch[x_col]).as_py()],
                "xhi": [pc.max(batch[x_col]).as_py()],
                "ylo": [pc.min(batch[y_col]).as_py()],
                "yhi": [pc.max(batch[y_col]).as_py()],
            }
        )

    parts = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    xlo, xhi = float(parts["xlo"].min()), float(parts["xhi"].max())
    ylo, yhi = float(parts["ylo"].min()), float(parts["yhi"].max())

    def add_z(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        z = morton32(_scale16(x, xlo, xhi), _scale16(y, ylo, yhi))
        return batch.append_column(_Z, pa.array(z.astype(np.int64)))

    (
        ds.map_batches(add_z, batch_format="pyarrow")
        .sort(_Z)
        .repartition(n_files)
        .map_batches(
            lambda b: b.drop_columns([_Z]), batch_format="pyarrow"
        )
        .write_parquet(root, filesystem=ray_fs(fs))
    )

    zones = []
    for f in listdir(fs, root):
        if not f.endswith(".parquet"):
            continue
        with fs.open(join(root, f), "rb") as fh:
            md = pq.read_metadata(fh)
        xi = md.schema.names.index(x_col)
        yi = md.schema.names.index(y_col)
        spans = {"file": f}
        for key, idx in (("x", xi), ("y", yi)):
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                spans[f"{key}min"], spans[f"{key}max"] = min(mins), max(maxs)
        zones.append(spans)
    meta = {"x_col": x_col, "y_col": y_col, "zones": zones}
    with fs.open(join(root, _META), "w") as f:
        json.dump(meta, f, default=str)
    return meta


def _overlaps(z: dict, key: str, lo, hi) -> bool:
    return not (hi < z[f"{key}min"] or z[f"{key}max"] < lo)


def read_box(
    path: str, x_range: tuple, y_range: tuple, filesystem=None
) -> ray.data.Dataset:
    """Rows inside the box [x_range] × [y_range]; zone-pruned + residual."""
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        meta = json.load(f)
    xc, yc = meta["x_col"], meta["y_col"]
    keep = [
        join(root, z["file"])
        for z in meta["zones"]
        if _overlaps(z, "x", *x_range) and _overlaps(z, "y", *y_range)
    ]
    if not keep:
        with fs.open(join(root, meta["zones"][0]["file"]), "rb") as fh:
            return ray.data.from_arrow(pq.read_schema(fh).empty_table())

    def residual(batch: pa.Table) -> pa.Table:
        x, y = batch[xc], batch[yc]
        m = pc.and_(
            pc.and_(
                pc.greater_equal(x, x_range[0]), pc.less_equal(x, x_range[1])
            ),
            pc.and_(
                pc.greater_equal(y, y_range[0]), pc.less_equal(y, y_range[1])
            ),
        )
        return batch.filter(m)

    return ray.data.read_parquet(keep, filesystem=ray_fs(fs)).map_batches(
        residual, batch_format="pyarrow"
    )


def pruned_fraction(
    path: str, x_range: tuple, y_range: tuple, filesystem=None
) -> float:
    """Fraction of files skipped for this box query."""
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        meta = json.load(f)
    zones = meta["zones"]
    kept = sum(
        1
        for z in zones
        if _overlaps(z, "x", *x_range) and _overlaps(z, "y", *y_range)
    )
    return 1.0 - kept / len(zones) if zones else 0.0
