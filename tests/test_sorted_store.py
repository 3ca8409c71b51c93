"""Zone-mapped sorted store: pruning actually prunes, results stay exact."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from bioie_llm_ray.state import sorted_store


class TestSortedStore:
    def test_int_range_prunes_and_matches(self, tmp_path):
        n = 20_000
        rng = np.random.RandomState(7)
        vals = rng.permutation(n).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"k": vals, "v": np.ones(n, dtype=np.int64)})
        )
        store = str(tmp_path / "store")
        meta = sorted_store.write_sorted(ds, store, col="k", n_files=10)
        assert len(meta["zones"]) == 10

        lo, hi = 5_000, 6_000
        out = sorted_store.read_range(store, lo, hi).to_pandas()
        assert sorted(out["k"]) == list(range(lo, hi + 1))
        # a 5% window over 10 sorted files must skip most of them
        assert sorted_store.pruned_fraction(store, lo, hi) >= 0.7

    def test_empty_overlap_returns_schema(self, tmp_path):
        ds = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [1, 1, 1]}))
        store = str(tmp_path / "s2")
        sorted_store.write_sorted(ds, store, col="k", n_files=2)
        out = sorted_store.read_range(store, 100, 200)
        assert out.count() == 0
        assert set(out.schema().names) == {"k", "v"}

    def test_timestamp_range(self, tmp_path):
        ts = pd.date_range("2024-01-01", periods=1000, freq="h")
        ds = ray.data.from_arrow(
            pa.table({"ts": pa.array(ts), "v": list(range(1000))})
        )
        store = str(tmp_path / "s3")
        sorted_store.write_sorted(ds, store, col="ts", n_files=8)
        lo = pd.Timestamp("2024-01-05")
        hi = pd.Timestamp("2024-01-06")
        out = sorted_store.read_range(store, lo, hi).to_pandas()
        expected = pd.DataFrame({"ts": ts, "v": range(1000)})
        expected = expected[(expected["ts"] >= lo) & (expected["ts"] <= hi)]
        assert len(out) == len(expected)
        assert sorted_store.pruned_fraction(store, lo, hi) >= 0.5
