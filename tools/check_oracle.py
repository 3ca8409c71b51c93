"""Local mimic of the driver's correctness gate.

Runs each queries()[name](sf_dir) and the matching oracle_sql()[name] in
DuckDB over the same parquet dir; compares row count, column names, and
order-insensitive values (sorted by all columns, float-rounded).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(9)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import time

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_ray = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: query raised {type(e).__name__}: {e}")
            continue
        t_ray = time.perf_counter() - t_ray
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows (rows-only check)"
                  f"  [ray {t_ray:.1f}s]")
            continue
        t_sql = time.perf_counter()
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: oracle raised {type(e).__name__}: {e}")
            continue
        t_sql = time.perf_counter() - t_sql
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(
                f"[ OK ] {name}: {len(got)} rows"
                f"  [ray {t_ray:.1f}s sql {t_sql:.1f}s]"
            )
        else:
            failures.append(name)
            print(
                f"[FAIL] {name}: rows {len(got)} vs {len(want)}, "
                f"cols {list(got.columns)} vs {list(want.columns)}"
            )
            if ok_rows and ok_cols:
                print("   value diff:", msg)
                diff_mask = ~(got.eq(want) | (got.isna() & want.isna()))
                rows_bad = diff_mask.any(axis=1)
                print("   got :", got[rows_bad].head(3).to_dict("records"))
                print("   want:", want[rows_bad].head(3).to_dict("records"))
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
