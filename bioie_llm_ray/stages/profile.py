"""Table profiling: per-column exact statistics in one streaming pass.

The scan-side companion to the sketches in ``stages/sketch.py``: each batch
emits one tiny partial row per column (count / nulls / min / max via Arrow
kernels), the driver folds partials — O(n_cols × n_batches) driver work,
zero shuffle, zero materialization.  Every reported field is
order-independent (no floating sums), so the output is a pure function of
the table contents — safe for hash-equality oracles and for drift checks
between pipeline runs.

At 100 TB this is the "look before you shuffle" tool: column ranges feed
filter pushdown decisions, null counts catch schema rot at the read, and
the per-partition variant (run it per input shard) localizes bad data to a
file.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

# min/max travel through the fold in per-kind slots so an int column is
# never coerced by a float neighbor (pa.array over mixed mins would upcast)
_KINDS = ("v_int", "v_float", "v_str")


def _slot(v):
    if v is None:
        return None, None
    if isinstance(v, bool):
        return "v_str", str(v)
    if isinstance(v, int):
        return "v_int", v
    if isinstance(v, float):
        return "v_float", v
    if isinstance(v, (datetime.datetime, datetime.date)):
        # ISO renders compare lexically in the fold
        return "v_str", v.isoformat()
    return "v_str", str(v)


def profile_columns(
    ds: ray.data.Dataset, columns: list[str]
) -> pa.Table:
    """One row per column: (column, n, n_null, min, max).

    min/max are rendered as strings in the final table (mixed column types
    in one output); integers keep exact digits, floats keep full repr
    precision, timestamps render ISO.
    """

    def partial(batch: pa.Table) -> pa.Table:
        rows = {
            "column": [],
            "n": [],
            "n_null": [],
            "v_int_min": [],
            "v_int_max": [],
            "v_float_min": [],
            "v_float_max": [],
            "v_str_min": [],
            "v_str_max": [],
        }
        for c in columns:
            col = batch[c]
            mm = pc.min_max(col)
            kind_lo, lo = _slot(mm["min"].as_py())
            kind_hi, hi = _slot(mm["max"].as_py())
            rows["column"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            for k in _KINDS:
                rows[f"{k}_min"].append(lo if k == kind_lo else None)
                rows[f"{k}_max"].append(hi if k == kind_hi else None)
        return pa.table(
            {
                "column": pa.array(rows["column"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "n_null": pa.array(rows["n_null"], type=pa.int64()),
                "v_int_min": pa.array(rows["v_int_min"], type=pa.int64()),
                "v_int_max": pa.array(rows["v_int_max"], type=pa.int64()),
                "v_float_min": pa.array(rows["v_float_min"], type=pa.float64()),
                "v_float_max": pa.array(rows["v_float_max"], type=pa.float64()),
                "v_str_min": pa.array(rows["v_str_min"], type=pa.string()),
                "v_str_max": pa.array(rows["v_str_max"], type=pa.string()),
            }
        )

    def pick(row, side):
        for k in _KINDS:
            v = row[f"{k}_{side}"]
            if v is not None:
                return v
        return None

    acc: dict[str, list] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        c = row["column"]
        lo, hi = pick(row, "min"), pick(row, "max")
        if c not in acc:
            acc[c] = [row["n"], row["n_null"], lo, hi]
        else:
            a = acc[c]
            a[0] += row["n"]
            a[1] += row["n_null"]
            if lo is not None and (a[2] is None or lo < a[2]):
                a[2] = lo
            if hi is not None and (a[3] is None or hi > a[3]):
                a[3] = hi

    def render(v) -> str | None:
        if v is None:
            return None
        if isinstance(v, float):
            return repr(v)
        return str(v)

    cols = [c for c in columns if c in acc]
    return pa.table(
        {
            "column": pa.array(cols, type=pa.string()),
            "n": pa.array([acc[c][0] for c in cols], type=pa.int64()),
            "n_null": pa.array([acc[c][1] for c in cols], type=pa.int64()),
            "min": pa.array([render(acc[c][2]) for c in cols], type=pa.string()),
            "max": pa.array([render(acc[c][3]) for c in cols], type=pa.string()),
        }
    )


def table_checksum(
    ds: ray.data.Dataset, cols: list[str]
) -> dict[str, object]:
    """Order-independent distributed table checksum: ``sum mod 2^64`` of a
    64-bit stable hash (md5 first 8 bytes) of each row's canonical
    ``'|'``-joined rendering of ``cols``.

    The migration/backfill verification primitive: two tables are compared
    WITHOUT shuffling or co-locating either — each side streams once, every
    batch folds to one ``(count, sum)`` pair, and the fold is commutative
    and mergeable, so the result is a pure function of the table's multiset
    of rows (duplicate rows count — unlike a set-based check).  Columns
    must render identically across engines: int64 / string / date columns
    do (decimal and ISO renderings are canonical); float columns are
    rejected — their text rendering is engine-specific, which would turn a
    representation difference into a false alarm.

    Returns ``{"n_rows": int, "checksum": str}`` (checksum as the decimal
    string of the mod-2^64 sum — exactly what the DuckDB oracle's
    HUGEINT-sum rendering produces).
    """
    from ..functions.hashing import stable_hash_u64

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            arr = batch[c]
            if pa.types.is_floating(arr.type):
                raise TypeError(
                    f"table_checksum: float column {c!r} has no canonical "
                    "cross-engine rendering; checksum an int/string/date "
                    "projection instead"
                )
            parts.append(pc.cast(arr, pa.string()))
        joined = parts[0]
        for p in parts[1:]:
            joined = pc.binary_join_element_wise(joined, p, "|")
        h = stable_hash_u64(joined.to_pylist())
        s = int(np.add.reduce(h, dtype=np.uint64))  # wraps mod 2^64 in C
        return pa.table(
            {
                "n": pa.array([len(batch)], type=pa.int64()),
                "s": pa.array([s], type=pa.uint64()),
            }
        )

    n_rows, total = 0, 0
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n_rows += int(row["n"])
        total = (total + int(row["s"])) % (1 << 64)
    return {"n_rows": n_rows, "checksum": str(total)}
