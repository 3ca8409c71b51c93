"""Incremental dedup via the sharded mutable index (state/dedup_index.py)."""

import pandas as pd
import ray

from bioie_llm_ray.state.dedup_index import DedupIndex


def _docs(ids):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(ids), "text": [f"t{i}" for i in ids]})
    )


class TestDedupIndex:
    def test_exactly_once_within_stream(self):
        idx = DedupIndex(n_shards=4)
        ds = _docs([i % 50 for i in range(1000)]).repartition(8)
        out = idx.filter_new(ds, "doc_id").take_all()
        ids = [r["doc_id"] for r in out]
        assert sorted(ids) == sorted(set(ids))  # no key twice
        assert set(ids) == set(range(50))  # every key exactly once
        assert idx.size() == 50

    def test_incremental_across_runs(self):
        """The capability shuffle-dedup cannot give: a second dataset drops
        everything already ingested by the first."""
        idx = DedupIndex(n_shards=4)
        first = idx.filter_new(_docs(range(100)), "doc_id").take_all()
        assert len(first) == 100
        second = idx.filter_new(_docs(range(50, 150)), "doc_id").take_all()
        assert sorted(r["doc_id"] for r in second) == list(range(100, 150))
        assert idx.size() == 150

    def test_snapshot_restore(self):
        idx = DedupIndex(n_shards=3)
        idx.filter_new(_docs(range(40)), "doc_id").take_all()
        snaps = idx.snapshot()
        # a fresh index restored from the snapshot keeps rejecting old keys
        idx2 = DedupIndex(n_shards=3)
        assert idx2.restore(snaps) == 40
        out = idx2.filter_new(_docs(range(30, 60)), "doc_id").take_all()
        assert sorted(r["doc_id"] for r in out) == list(range(40, 60))

    def test_composite_keys(self):
        idx = DedupIndex(n_shards=2)
        ds = ray.data.from_items(
            [
                {"a": "x", "b": 1},
                {"a": "x", "b": 2},
                {"a": "x", "b": 1},  # dup of row 0
            ]
        )
        out = idx.filter_new(ds, ["a", "b"]).take_all()
        assert len(out) == 2
