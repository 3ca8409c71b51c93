"""Size-derived bucket counts (`analytics.n_buckets_for_bytes` / `_nb`).

The invariant: at the benchmark scales the tuned floors win (plans are
byte-for-byte what they were with constants), while at 100× the count grows
linearly with input bytes so a map_groups bucket never outgrows one task's
heap.
"""

import os

from bioie_llm_ray.pipelines.analytics import (
    _BYTES_PER_BUCKET,
    _PARQUET_EXPANSION,
    _nb,
    n_buckets_for_bytes,
)

SF = "/root/testdata/sf0.001"


class TestNBucketsForBytes:
    def test_floor_wins_at_small_scale(self):
        assert n_buckets_for_bytes(10 * 2**20, floor=16) == 16
        assert n_buckets_for_bytes(0, floor=4) == 4

    def test_grows_linearly_with_bytes(self):
        one = n_buckets_for_bytes(2**30, floor=16)
        ten = n_buckets_for_bytes(10 * 2**30, floor=16)
        hundred = n_buckets_for_bytes(100 * 2**30, floor=16)
        assert one < ten < hundred
        # ceil(bytes * expansion / bucket_bytes)
        assert hundred == -(
            -(100 * 2**30 * _PARQUET_EXPANSION) // _BYTES_PER_BUCKET
        )

    def test_capped(self):
        assert n_buckets_for_bytes(10**18, floor=16) == 1 << 16

    def test_nb_uses_file_size_with_floor(self):
        # sf0.001 tables are tiny — every floor should win exactly
        assert _nb(SF, "lineitem", 16) == 16
        assert _nb(SF, "documents", 8) == 8
        # missing file falls back to the floor rather than raising
        assert _nb("/nonexistent", "lineitem", 32) == 32

    def test_nb_grows_with_amplified_input(self, tmp_path):
        # simulate an amplified table by a sparse file of 4 GiB
        p = tmp_path / "lineitem.parquet"
        with open(p, "wb") as f:
            f.seek(4 * 2**30 - 1)
            f.write(b"\0")
        got = _nb(str(tmp_path), "lineitem", 16)
        assert got == -(-(os.path.getsize(p) * _PARQUET_EXPANSION)
                        // _BYTES_PER_BUCKET)
        assert got > 16
