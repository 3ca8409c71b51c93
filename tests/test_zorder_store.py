"""Z-order clustered layout (state/zorder_store): 2-D pruning + exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from bioie_llm_ray.state import sorted_store, zorder_store


def _grid_ds(n=10_000, seed=7):
    rng = np.random.RandomState(seed)
    t = pa.table(
        {
            "x": rng.randint(0, 1000, size=n).astype(np.int64),
            "y": rng.randint(0, 1000, size=n).astype(np.int64),
            "v": rng.rand(n),
        }
    )
    return ray.data.from_arrow(t).repartition(8), t


class TestMorton:
    def test_interleave_known_values(self):
        # x=0b11, y=0b01 -> z = x1 y1 x0 y0 = 0b1011
        z = zorder_store.morton32(
            np.array([3], dtype=np.uint32), np.array([1], dtype=np.uint32)
        )
        assert int(z[0]) == 0b1011

    def test_locality_monotone_on_axes(self):
        # fixing one axis, z is strictly increasing in the other
        xs = np.arange(100, dtype=np.uint32)
        z = zorder_store.morton32(xs, np.zeros(100, dtype=np.uint32))
        assert (np.diff(z.astype(np.int64)) > 0).all()


class TestZorderStore:
    @pytest.fixture(scope="class")
    def store(self, tmp_path_factory):
        ds, t = _grid_ds()
        path = str(tmp_path_factory.mktemp("zstore"))
        zorder_store.write_zordered(ds, path, "x", "y", n_files=16)
        return path, t

    def test_box_read_exact(self, store):
        path, t = store
        got = (
            zorder_store.read_box(path, (100, 200), (300, 450))
            .to_pandas()
            .sort_values(["x", "y", "v"])
            .reset_index(drop=True)
        )
        df = t.to_pandas()
        want = (
            df[(df.x.between(100, 200)) & (df.y.between(300, 450))]
            .sort_values(["x", "y", "v"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["x", "y", "v"]], want)

    def test_prunes_both_dimensions(self, store):
        path, _ = store
        # a small box must skip most files
        frac = zorder_store.pruned_fraction(path, (100, 200), (100, 200))
        assert frac >= 0.5
        # a box narrow ONLY in y still prunes (1-D x-sort could not)
        frac_y = zorder_store.pruned_fraction(path, (0, 999), (100, 160))
        assert frac_y > 0.0

    def test_outprunes_linear_sort_on_2d_box(self, store, tmp_path):
        path, t = store
        spath = str(tmp_path / "sorted")
        sorted_store.write_sorted(
            ray.data.from_arrow(t).repartition(8), spath, col="x", n_files=16
        )
        box = ((100, 200), (100, 200))
        z_frac = zorder_store.pruned_fraction(path, *box)
        # the 1-D store prunes on x only
        s_frac = sorted_store.pruned_fraction(spath, 100, 200)
        assert z_frac >= s_frac

    def test_empty_box_keeps_schema(self, store):
        path, _ = store
        out = zorder_store.read_box(path, (5000, 6000), (0, 10))
        assert set(out.schema().names) == {"x", "y", "v"}
        assert out.count() == 0
