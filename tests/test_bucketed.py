"""Hash-bucketed Parquet layout + shuffle-free co-located joins."""

import numpy as np
import pandas as pd
import pytest
import ray

from bioie_llm_ray.state import bucketed


def _tables():
    rng = np.random.RandomState(21)
    left = pd.DataFrame(
        {"k": rng.randint(0, 200, 3000), "v": rng.randn(3000).round(6)}
    )
    right = pd.DataFrame({"k": np.arange(0, 300, 2), "w": np.arange(150)})
    return left, right


class TestBucketedLayout:
    def test_roundtrip_preserves_rows(self, tmp_path):
        left, _ = _tables()
        meta = bucketed.write_bucketed(
            ray.data.from_pandas(left), str(tmp_path / "l"), key="k", n_buckets=8
        )
        assert meta == {"key": "k", "n_buckets": 8}
        back = bucketed.read_bucketed(str(tmp_path / "l")).to_pandas()
        got = back[["k", "v"]].sort_values(["k", "v"]).reset_index(drop=True)
        want = left.sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False
        )

    def test_single_bucket_read_is_key_aligned(self, tmp_path):
        left, _ = _tables()
        bucketed.write_bucketed(
            ray.data.from_pandas(left), str(tmp_path / "l"), key="k", n_buckets=8
        )
        from bioie_llm_ray.functions.hashing import hash_bucket_ints

        b0 = bucketed.read_bucketed(str(tmp_path / "l"), bucket=0).to_pandas()
        assert (hash_bucket_ints(b0["k"].to_numpy(), 8) == 0).all()

    def test_colocated_inner_join_matches_pandas(self, tmp_path):
        left, right = _tables()
        bucketed.write_bucketed(
            ray.data.from_pandas(left), str(tmp_path / "l"), key="k", n_buckets=8
        )
        bucketed.write_bucketed(
            ray.data.from_pandas(right), str(tmp_path / "r"), key="k", n_buckets=8
        )
        got = (
            bucketed.colocated_join(str(tmp_path / "l"), str(tmp_path / "r"))
            .to_pandas()[["k", "v", "w"]]
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k")
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_colocated_left_outer_join(self, tmp_path):
        left, right = _tables()
        bucketed.write_bucketed(
            ray.data.from_pandas(left), str(tmp_path / "l"), key="k", n_buckets=8
        )
        bucketed.write_bucketed(
            ray.data.from_pandas(right), str(tmp_path / "r"), key="k", n_buckets=8
        )
        got = bucketed.colocated_join(
            str(tmp_path / "l"), str(tmp_path / "r"), join_type="left outer"
        ).to_pandas()
        want = left.merge(right, on="k", how="left")
        assert len(got) == len(want)
        assert int(got["w"].isna().sum()) == int(want["w"].isna().sum())

    def test_misaligned_layouts_refuse(self, tmp_path):
        left, right = _tables()
        bucketed.write_bucketed(
            ray.data.from_pandas(left), str(tmp_path / "l"), key="k", n_buckets=8
        )
        bucketed.write_bucketed(
            ray.data.from_pandas(right), str(tmp_path / "r16"), key="k", n_buckets=16
        )
        with pytest.raises(ValueError, match="layouts disagree"):
            bucketed.colocated_join(str(tmp_path / "l"), str(tmp_path / "r16"))


class TestMergeUpsert:
    """CDC MERGE semantics: latest-seq wins, deltas beat ties, tombstones."""

    def _base(self, tmp_path, rows):
        df = pd.DataFrame(rows)
        bucketed.write_bucketed(
            ray.data.from_pandas(df), str(tmp_path / "base"), key="k", n_buckets=4
        )
        return str(tmp_path / "base")

    def _merge(self, tmp_path, base, delta_rows):
        out = str(tmp_path / "out")
        bucketed.merge_upsert(
            base,
            ray.data.from_pandas(pd.DataFrame(delta_rows)),
            out,
            seq_cols="seq",
            delete_col="deleted",
        )
        return (
            bucketed.read_bucketed(out)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    def test_upsert_insert_delete(self, tmp_path):
        base = self._base(
            tmp_path,
            {"k": [1, 2, 3], "seq": [10, 10, 10], "v": ["a", "b", "c"],
             "deleted": [False] * 3},
        )
        got = self._merge(
            tmp_path,
            base,
            {"k": [2, 3, 4], "seq": [20, 20, 20], "v": ["B", "x", "d"],
             "deleted": [False, True, False]},
        )
        # k=1 untouched, k=2 updated, k=3 tombstoned, k=4 inserted
        assert got["k"].tolist() == [1, 2, 4]
        assert got["v"].tolist() == ["a", "B", "d"]

    def test_equal_seq_tie_breaks_to_delta(self, tmp_path):
        base = self._base(
            tmp_path,
            {"k": [7], "seq": [5], "v": ["old"], "deleted": [False]},
        )
        got = self._merge(
            tmp_path, base,
            {"k": [7], "seq": [5], "v": ["new"], "deleted": [False]},
        )
        assert got["v"].tolist() == ["new"]

    def test_stale_delta_loses(self, tmp_path):
        base = self._base(
            tmp_path,
            {"k": [7], "seq": [9], "v": ["current"], "deleted": [False]},
        )
        got = self._merge(
            tmp_path, base,
            {"k": [7], "seq": [3], "v": ["late-arriving"], "deleted": [False]},
        )
        assert got["v"].tolist() == ["current"]

    def test_schema_fidelity_int64_survives(self, tmp_path):
        # the asof-join lesson: null-widening/pandas must not leak float64
        base = self._base(
            tmp_path,
            {"k": [1, 2], "seq": [1, 1], "big": [2**55 + 1, 2**55 + 2],
             "deleted": [False, False]},
        )
        got = self._merge(
            tmp_path, base,
            {"k": [9], "seq": [1], "big": [2**55 + 9], "deleted": [False]},
        )
        assert str(got["big"].dtype) == "int64"
        assert got["big"].tolist() == [2**55 + 1, 2**55 + 2, 2**55 + 9]

    def test_merge_result_equals_full_log_compaction(self, tmp_path):
        # associativity: compact(prefix) ⊕ rest == compact(full log)
        rng = np.random.RandomState(7)
        n = 4000
        log = pd.DataFrame(
            {
                "k": rng.randint(0, 300, n),
                "seq": np.arange(n, dtype=np.int64),
                "v": rng.randint(0, 10**6, n).astype(np.int64),
                "deleted": rng.rand(n) < 0.1,
            }
        )
        base = self._base(tmp_path, log.iloc[: n // 2])
        got = self._merge(tmp_path, base, log.iloc[n // 2:])
        want = (
            log.sort_values(["k", "seq"])
            .groupby("k", as_index=False)
            .tail(1)
            .query("~deleted")
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "seq", "v"]], want[["k", "seq", "v"]], check_dtype=False
        )


class TestRebucketDouble:
    def test_split_is_local_and_layout_valid(self, tmp_path):
        """Doubling B: every row of old bucket b lands in {b, b+B}; the
        doubled store equals a directly-written 2B store and co-located
        joins against one."""
        import os

        left, right = _tables()
        bucketed.write_bucketed(
            ray.data.from_pandas(left), str(tmp_path / "l4"), key="k", n_buckets=4
        )
        meta = bucketed.rebucket_double(
            str(tmp_path / "l4"), str(tmp_path / "l8")
        )
        assert meta == {"key": "k", "n_buckets": 8}

        # locality invariant: old bucket b only feeds new buckets b, b+4
        from bioie_llm_ray.functions.hashing import hash_bucket_ints

        for b in range(4):
            rows = bucketed.read_bucketed(
                str(tmp_path / "l4"), bucket=b
            ).to_pandas()
            nb = set(hash_bucket_ints(rows["k"].to_numpy(), 8))
            assert nb <= {b, b + 4}

        # row equality vs a direct 2B write
        direct = str(tmp_path / "d8")
        bucketed.write_bucketed(
            ray.data.from_pandas(left), direct, key="k", n_buckets=8
        )
        a = (
            bucketed.read_bucketed(str(tmp_path / "l8"))
            .to_pandas()[["k", "v"]]
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        bb = (
            bucketed.read_bucketed(direct)
            .to_pandas()[["k", "v"]]
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, bb)

        # the doubled store joins co-located against a direct-8 right side
        bucketed.write_bucketed(
            ray.data.from_pandas(right), str(tmp_path / "r8"), key="k", n_buckets=8
        )
        got = (
            bucketed.colocated_join(
                str(tmp_path / "l8"), str(tmp_path / "r8")
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[["k", "v", "w"]]
        )
        want = (
            left.merge(right, on="k")
            .sort_values(["k", "v"])
            .reset_index(drop=True)[["k", "v", "w"]]
        )
        pd.testing.assert_frame_equal(got, want)
