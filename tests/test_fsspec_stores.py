"""fsspec-friendly store paths: every persisted layout accepts a URI /
filesystem object (``state.fs``), so on a real cluster the stores can live
on shared storage (s3://, hdfs://) instead of the driver's local disk.

Two regimes:
- ``file://`` URIs round-trip END-TO-END through real Ray worker processes
  (same plumbing as any remote FS: url_to_fs, fs.open metadata, fs.ls
  listings, ``filesystem=`` handoff to ray.data / pyarrow).
- ``memory://`` exercises the metadata/listing half driver-side.  fsspec's
  MemoryFileSystem stores bytes in a class-level dict, so it is
  process-local BY CONSTRUCTION — Parquet blocks written by Ray worker
  processes can never reach the driver's memory store.  The stores
  document this; the data path for remote filesystems is covered by the
  file:// runs.
"""

import json

import numpy as np
import pandas as pd
import pytest
import ray

from bioie_llm_ray.state import bucketed, fs as fsmod, sorted_store, zorder_store


def _events(n=2000, seed=7):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "k": rng.randint(0, 100, n),
            "x": rng.uniform(0, 100, n).round(4),
            "y": rng.uniform(0, 100, n).round(4),
            "v": rng.randn(n).round(6),
        }
    )


class TestFileUriRoundtrip:
    """file:// URIs through real Ray workers — the remote-FS code path."""

    def test_bucketed(self, tmp_path):
        df = _events()
        uri = "file://" + str(tmp_path / "b")
        bucketed.write_bucketed(
            ray.data.from_pandas(df), uri, key="k", n_buckets=8
        )
        assert bucketed.bucketed_meta(uri) == {"key": "k", "n_buckets": 8}
        back = bucketed.read_bucketed(uri).to_pandas()
        got = back[["k", "v"]].sort_values(["k", "v"]).reset_index(drop=True)
        want = df[["k", "v"]].sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_bucketed_colocated_join(self, tmp_path):
        df = _events()
        dim = pd.DataFrame({"k": np.arange(100), "name": [f"n{i}" for i in range(100)]})
        lu, ru = (
            "file://" + str(tmp_path / "l"),
            "file://" + str(tmp_path / "r"),
        )
        bucketed.write_bucketed(ray.data.from_pandas(df), lu, key="k", n_buckets=8)
        bucketed.write_bucketed(ray.data.from_pandas(dim), ru, key="k", n_buckets=8)
        got = bucketed.colocated_join(lu, ru).to_pandas()
        want = df.merge(dim, on="k")
        assert len(got) == len(want)
        assert got["name"].notna().all()

    def test_sorted(self, tmp_path):
        df = _events()
        uri = "file://" + str(tmp_path / "s")
        meta = sorted_store.write_sorted(
            ray.data.from_pandas(df), uri, col="x", n_files=8
        )
        assert len(meta["zones"]) == 8
        got = sorted_store.read_range(uri, 20.0, 40.0).to_pandas()
        want = df[(df.x >= 20.0) & (df.x <= 40.0)]
        assert len(got) == len(want)
        assert sorted_store.pruned_fraction(uri, 20.0, 40.0) > 0

    def test_zorder(self, tmp_path):
        df = _events()
        uri = "file://" + str(tmp_path / "z")
        zorder_store.write_zordered(
            ray.data.from_pandas(df), uri, x_col="x", y_col="y", n_files=16
        )
        got = zorder_store.read_box(uri, (10.0, 30.0), (10.0, 30.0)).to_pandas()
        want = df[
            (df.x >= 10.0) & (df.x <= 30.0) & (df.y >= 10.0) & (df.y <= 30.0)
        ]
        assert len(got) == len(want)
        assert zorder_store.pruned_fraction(uri, (10.0, 30.0), (10.0, 30.0)) > 0

    def test_ivf_store(self, sf_dir, tmp_path):
        from bioie_llm_ray.state.ivf_store import build_ivf_store, ivf_store_topk

        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        uri = "file://" + str(tmp_path / "ivf")
        build_ivf_store(ds, uri, n_centroids=8)
        rows = sorted(
            ds.filter(expr="vec_id < 4").take_all(), key=lambda r: r["vec_id"]
        )
        q = np.stack([np.asarray(r["embedding"]) for r in rows])
        out = ivf_store_topk(uri, q, [r["vec_id"] for r in rows], k=3)
        got = out.to_pandas()
        assert set(got["query_id"]) == {0, 1, 2, 3}
        assert (got.groupby("query_id")["rank"].max() == 3).all()

    def test_lsh_store_matches_local_path(self, sf_dir, tmp_path):
        from bioie_llm_ray.state.lsh_store import build_lsh_store, lsh_store_topk

        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        uri = "file://" + str(tmp_path / "lsh_uri")
        local = str(tmp_path / "lsh_local")
        build_lsh_store(ds, uri)
        build_lsh_store(ds, local)
        rows = sorted(
            ds.filter(expr="vec_id < 4").take_all(), key=lambda r: r["vec_id"]
        )
        q = np.stack([np.asarray(r["embedding"]) for r in rows])
        ids = [r["vec_id"] for r in rows]
        a = lsh_store_topk(uri, q, ids, k=3).to_pandas()
        b = lsh_store_topk(local, q, ids, k=3).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestMemoryFsDriverSide:
    """memory:// covers the metadata / listing half (driver-process-local)."""

    def test_resolve_and_meta_roundtrip(self):
        fs, root = fsmod.resolve("memory://stores/b1")
        fs.makedirs(root, exist_ok=True)
        with fs.open(fsmod.join(root, "_BUCKETS.json"), "w") as f:
            json.dump({"key": "k", "n_buckets": 4}, f)
        assert bucketed.bucketed_meta("memory://stores/b1") == {
            "key": "k",
            "n_buckets": 4,
        }

    def test_zone_pruning_through_memory(self):
        fs, root = fsmod.resolve("memory://stores/s1")
        fs.makedirs(root, exist_ok=True)
        zones = [
            {"file": f"part-{i}.parquet", "min": i * 10.0, "max": i * 10.0 + 9.0}
            for i in range(10)
        ]
        with fs.open(fsmod.join(root, "_ZONES.json"), "w") as f:
            json.dump({"col": "x", "zones": zones}, f)
        # range [25, 34] overlaps exactly zones 2 and 3 → 8/10 pruned
        assert sorted_store.pruned_fraction("memory://stores/s1", 25.0, 34.0) == 0.8

    def test_listdir_through_memory(self):
        fs, root = fsmod.resolve("memory://stores/l1")
        fs.makedirs(root, exist_ok=True)
        for name in ("b.parquet", "a.parquet", "_META.json"):
            with fs.open(fsmod.join(root, name), "wb") as f:
                f.write(b"x")
        names = fsmod.listdir(fs, root)
        assert names == ["_META.json", "a.parquet", "b.parquet"]


class TestNonLocalFsMergeUpsert:
    """merge_upsert through a NON-local fsspec filesystem.

    DirFileSystem wraps the local disk but is not a LocalFileSystem
    instance, so ``ray_fs`` returns a pyarrow wrapper and the remote
    ``merge_bucket`` task takes the ``wfs is not None`` branch — the
    S3/HDFS code path — while the bytes still live on real disk that Ray
    worker processes can reach.  Regression: that branch once referenced
    an undefined name (``wisdir``) and raised NameError inside the Ray
    task for every non-local filesystem.
    """

    def test_merge_upsert_over_dirfs(self, tmp_path):
        from fsspec.implementations.dirfs import DirFileSystem
        from fsspec.implementations.local import LocalFileSystem

        dfs = DirFileSystem(str(tmp_path), fs=LocalFileSystem())
        assert fsmod.ray_fs(dfs) is not None  # genuinely the remote-FS path

        base = pd.DataFrame(
            {"k": [1, 2, 3], "seq": [10, 10, 10], "v": ["a", "b", "c"],
             "deleted": [False] * 3}
        )
        delta = pd.DataFrame(
            {"k": [2, 3, 4], "seq": [20, 20, 20], "v": ["B", "x", "d"],
             "deleted": [False, True, False]}
        )
        bucketed.write_bucketed(
            ray.data.from_pandas(base), "base", key="k", n_buckets=4,
            filesystem=dfs,
        )
        bucketed.merge_upsert(
            "base", ray.data.from_pandas(delta), "out",
            seq_cols="seq", delete_col="deleted", filesystem=dfs,
        )
        got = (
            bucketed.read_bucketed("out", filesystem=dfs)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert got["k"].tolist() == [1, 2, 4]
        assert got["v"].tolist() == ["a", "B", "d"]
