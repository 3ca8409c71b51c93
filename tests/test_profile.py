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
