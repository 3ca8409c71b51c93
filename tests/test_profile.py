"""profile_columns: exact per-column stats, null handling, multi-batch fold."""

import pyarrow as pa
import ray

from bioie_llm_ray.stages.profile import profile_columns


def test_profile_counts_nulls_min_max():
    t = pa.table(
        {
            "a": pa.array([3, None, 1, 7, None], type=pa.int64()),
            "b": pa.array([0.5, 2.25, None, -1.0, 9.0], type=pa.float64()),
        }
    )
    # two single-row-group blocks exercise the driver fold across batches
    ds = ray.data.from_arrow([t.slice(0, 2), t.slice(2)])
    out = {
        r["column"]: r
        for r in profile_columns(ds, ["a", "b"]).to_pylist()
    }
    assert out["a"]["n"] == 5 and out["a"]["n_null"] == 2
    assert out["a"]["min"] == "1" and out["a"]["max"] == "7"
    assert out["b"]["n"] == 5 and out["b"]["n_null"] == 1
    assert float(out["b"]["min"]) == -1.0 and float(out["b"]["max"]) == 9.0


def test_profile_all_null_column():
    t = pa.table({"a": pa.array([None, None], type=pa.int64())})
    out = profile_columns(ray.data.from_arrow(t), ["a"]).to_pylist()[0]
    assert out["n"] == 2 and out["n_null"] == 2
    assert out["min"] is None and out["max"] is None


class TestTableChecksum:
    def test_partition_invariant_and_sensitive(self):
        import hashlib

        import pandas as pd

        from bioie_llm_ray.stages.profile import table_checksum

        df = pd.DataFrame(
            {"k": [1, 2, 3, 4, 5], "s": ["a", "b", "c", "d", "e"]}
        )
        a = table_checksum(ray.data.from_pandas(df).repartition(1), ["k", "s"])
        b = table_checksum(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=3)
            ).repartition(4),
            ["k", "s"],
        )
        assert a == b  # order- and partition-independent
        # matches a serial computation
        total = sum(
            int.from_bytes(
                hashlib.md5(f"{k}|{s}".encode()).digest()[:8], "big"
            )
            for k, s in zip(df["k"], df["s"])
        ) % (1 << 64)
        assert a == {"n_rows": 5, "checksum": str(total)}
        # one changed row changes the checksum
        df2 = df.copy()
        df2.loc[2, "s"] = "X"
        c = table_checksum(ray.data.from_pandas(df2), ["k", "s"])
        assert c["checksum"] != a["checksum"]

    def test_duplicate_rows_counted(self):
        import pandas as pd

        from bioie_llm_ray.stages.profile import table_checksum

        one = pd.DataFrame({"k": [7], "s": ["x"]})
        two = pd.DataFrame({"k": [7, 7], "s": ["x", "x"]})
        a = table_checksum(ray.data.from_pandas(one), ["k", "s"])
        b = table_checksum(ray.data.from_pandas(two), ["k", "s"])
        assert b["n_rows"] == 2 and b["checksum"] != a["checksum"]

    def test_float_column_rejected(self):
        import pandas as pd
        import pytest

        from bioie_llm_ray.stages.profile import table_checksum

        df = pd.DataFrame({"x": [1.5, 2.5]})
        with pytest.raises(Exception):
            table_checksum(ray.data.from_pandas(df), ["x"])


class TestValidateConstraints:
    def test_all_kinds_with_planted_violations(self):
        import pandas as pd

        from bioie_llm_ray.stages.profile import validate_constraints

        df = pd.DataFrame(
            {
                "id": pd.array([1, 2, 2, None, 5], dtype="Int64"),
                "q": [5.0, 100.0, -1.0, 7.0, 8.0],
                "flag": ["A", "B", "Z", "A", "A"],
            }
        )
        out = validate_constraints(
            ray.data.from_pandas(df).repartition(3),
            [
                {"kind": "not_null", "col": "id"},
                {"kind": "in_range", "col": "q", "lo": 0, "hi": 50},
                {"kind": "accepted_values", "col": "flag",
                 "values": ["A", "B"]},
                {"kind": "unique", "cols": ["id"]},
            ],
        )
        got = dict(zip(out["rule"], out["violations"]))
        assert got["not_null(id)"] == 1
        assert got["in_range(q,0,50)"] == 2      # 100 high, -1 low
        assert got["accepted_values(flag)"] == 1  # Z
        # ids: 1,2,2,None,5 -> 4 distinct tuples (None is a value) -> 1 dup
        assert got["unique(id)"] == 1
        assert (out["n_checked"] == 5).all()

    def test_clean_table_reports_zero(self):
        import pandas as pd

        from bioie_llm_ray.stages.profile import validate_constraints

        df = pd.DataFrame({"k": [1, 2, 3], "v": [0.1, 0.2, 0.3]})
        out = validate_constraints(
            ray.data.from_pandas(df),
            [
                {"kind": "not_null", "col": "k"},
                {"kind": "in_range", "col": "v", "lo": 0, "hi": 1},
                {"kind": "unique", "cols": ["k"]},
            ],
        )
        assert (out["violations"] == 0).all()
