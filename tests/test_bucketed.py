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
