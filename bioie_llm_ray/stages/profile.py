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


def validate_constraints(
    ds: ray.data.Dataset, constraints: list[dict], n_buckets: int = 32
):
    """Deequ-style distributed data-quality validation: evaluate declared
    constraints in one streaming pass and report violation counts.

    Supported constraint dicts:

    - ``{"kind": "not_null", "col": c}``
    - ``{"kind": "in_range", "col": c, "lo": x, "hi": y}`` — closed
      interval; nulls count as violations
    - ``{"kind": "accepted_values", "col": c, "values": [...]}``
    - ``{"kind": "unique", "cols": [...]}`` — violations = rows − distinct
      key tuples

    Row-local constraints fold per-batch vectorized Arrow counts (zero
    shuffle, one tiny partial row per batch); each ``unique`` constraint
    additionally costs one combiner + bucketed dedup count — the only
    exchange, keyed by the candidate key's hash.  Returns a pandas frame
    ``(rule, violations, n_checked)`` — the "fail the pipeline before the
    expensive stages" gate of a 100 TB ingest.
    """
    import pandas as pd

    row_cs, uniq_cs = [], []
    for c in constraints:
        (uniq_cs if c["kind"] == "unique" else row_cs).append(c)

    def rule_name(c: dict) -> str:
        if c["kind"] == "not_null":
            return f"not_null({c['col']})"
        if c["kind"] == "in_range":
            return f"in_range({c['col']},{c['lo']},{c['hi']})"
        if c["kind"] == "accepted_values":
            return f"accepted_values({c['col']})"
        return f"unique({','.join(c['cols'])})"

    def partial(batch: pa.Table) -> pa.Table:
        viols = []
        for c in row_cs:
            col = batch[c["col"]]
            if c["kind"] == "not_null":
                bad = col.null_count
            elif c["kind"] == "in_range":
                ok = pc.and_(
                    pc.greater_equal(col, c["lo"]), pc.less_equal(col, c["hi"])
                )
                good = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                bad = len(col) - int(good)  # nulls fall out of `ok`
            else:  # accepted_values
                ok = pc.is_in(col, value_set=pa.array(c["values"]))
                good = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                bad = len(col) - int(good)
            viols.append(bad)
        return pa.table(
            {
                "i": pa.array(range(len(row_cs)), type=pa.int64()),
                "v": pa.array(viols, type=pa.int64()),
                "n": pa.array([len(batch)] * len(row_cs), type=pa.int64()),
            }
        )

    totals = [0] * len(row_cs)
    n_rows = 0
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        totals[int(row["i"])] += int(row["v"])
        if int(row["i"]) == 0:
            n_rows += int(row["n"])
    if not row_cs:
        n_rows = ds.count()

    rows = [
        {"rule": rule_name(c), "violations": totals[i], "n_checked": n_rows}
        for i, c in enumerate(row_cs)
    ]
    if uniq_cs:
        from ..stages.dedup import batch_local_dedup, exact_dedup

        for c in uniq_cs:
            cols = c["cols"]

            # canonicalize the key to one string column with an explicit
            # null sentinel — dirty data has null keys, and the dedup
            # hash has no null rendering of its own
            def to_key(batch: pa.Table, cols=cols) -> pa.Table:
                parts = [
                    pc.fill_null(pc.cast(batch[k], pa.string()), "\x00null")
                    for k in cols
                ]
                key = parts[0]
                for p in parts[1:]:
                    key = pc.binary_join_element_wise(key, p, "\x1f")
                return pa.table({"__uk": key})

            keyed = ds.select_columns(cols).map_batches(
                to_key, batch_format="pyarrow"
            )
            distinct = exact_dedup(
                batch_local_dedup(keyed, ["__uk"]),
                ["__uk"],
                n_buckets=n_buckets,
            ).count()
            rows.append(
                {
                    "rule": rule_name(c),
                    "violations": n_rows - int(distinct),
                    "n_checked": n_rows,
                }
            )
    out = pd.DataFrame(rows, columns=["rule", "violations", "n_checked"])
    return out.sort_values("rule").reset_index(drop=True)
