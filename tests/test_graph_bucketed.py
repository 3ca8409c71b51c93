"""Bucketed (driver-state-free) iterative graph ops vs the broadcast path.

`bfs_levels` / `sssp_weighted` / `label_propagation` auto-switch to Dataset
frontier state above `max_broadcast_nodes`; forcing the bound to 0 runs the
bucketed path, which must be bit-identical to the broadcast one (integer
distances; integer-valued float votes).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from bioie_llm_ray.stages.graph import (
    bfs_levels,
    hits,
    k_core,
    label_propagation,
    pagerank,
    sssp_weighted,
)


def _edges_ds(rows, cols):
    return ray.data.from_arrow(
        pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})
    )


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values("node", kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def rnd_graph():
    # random sparse digraph with string node ids, deterministic
    rng = np.random.RandomState(11)
    n, m = 120, 480
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    rows = [
        (f"n{a:03d}", f"n{b:03d}", int(w))
        for a, b, w in zip(
            src[keep], dst[keep], rng.randint(1, 9, keep.sum())
        )
    ]
    return rows


class TestBfsBucketed:
    def test_matches_broadcast(self, rnd_graph):
        edges = _edges_ds([(a, b) for a, b, _ in rnd_graph], ["subj", "obj"])
        want = _df(bfs_levels(edges, "n000"))
        got = _df(bfs_levels(edges, "n000", max_broadcast_nodes=0, n_buckets=4))
        pd.testing.assert_frame_equal(got, want)
        assert (want["dist"] >= 0).all() and len(want) > 10

    def test_disconnected_seed_only(self):
        edges = _edges_ds([("a", "b")], ["subj", "obj"])
        got = _df(bfs_levels(edges, "zzz", max_broadcast_nodes=0, n_buckets=4))
        assert got["node"].tolist() == ["zzz"] and got["dist"].tolist() == [0]


class TestSsspBucketed:
    def test_matches_broadcast(self, rnd_graph):
        edges = _edges_ds(rnd_graph, ["subj", "obj", "w"])
        want = _df(sssp_weighted(edges, "n000", weight="w"))
        got = _df(
            sssp_weighted(edges, "n000", weight="w", max_broadcast_nodes=0, n_buckets=4)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_round_bound_is_respected(self):
        # chain a->b->c with a shortcut a->c of cost 10: 1 round gives 10,
        # 2 rounds give 2 on both paths
        rows = [("a", "b", 1), ("b", "c", 1), ("a", "c", 10)]
        edges = _edges_ds(rows, ["subj", "obj", "w"])
        for r, expect in [(1, 10), (2, 2)]:
            got = _df(
                sssp_weighted(
                    edges, "a", weight="w", max_iters=r,
                    max_broadcast_nodes=0, n_buckets=4,
                )
            )
            assert got.set_index("node")["dist"]["c"] == expect


class TestLpaBucketed:
    def test_matches_broadcast(self, rnd_graph):
        # both orientations, integer weights → exact votes
        sym = [(a, b, w) for a, b, w in rnd_graph] + [
            (b, a, w) for a, b, w in rnd_graph
        ]
        edges = _edges_ds(sym, ["subj", "obj", "w"])
        want = (
            label_propagation(edges, weight="w", n_iters=3)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        got = (
            label_propagation(
                edges, weight="w", n_iters=3, max_broadcast_nodes=0,
                n_buckets=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_unweighted_two_cliques(self):
        # two triangles joined by nothing: each collapses to its min label
        tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
        tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
        sym = tri1 + tri2 + [(b, a) for a, b in tri1 + tri2]
        edges = _edges_ds(sym, ["subj", "obj"])
        got = (
            label_propagation(edges, n_iters=4, max_broadcast_nodes=0, n_buckets=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        comm = dict(zip(got["node"], got["community"]))
        assert len({comm["a"], comm["b"], comm["c"]}) == 1
        assert len({comm["x"], comm["y"], comm["z"]}) == 1
        assert comm["a"] != comm["x"]


class TestPagerankBucketed:
    def test_matches_broadcast(self, rnd_graph):
        edges = _edges_ds(rnd_graph, ["subj", "obj", "w"])
        want = _df(pagerank(edges, weight="w", n_iters=5))
        got = _df(
            pagerank(
                edges, weight="w", n_iters=5, max_broadcast_nodes=0,
                n_buckets=4,
            )
        )
        assert got["node"].tolist() == want["node"].tolist()
        # float sums associate differently across the two paths
        np.testing.assert_allclose(
            got["rank"].to_numpy(), want["rank"].to_numpy(), rtol=1e-11
        )
        assert abs(got["rank"].sum() - 1.0) < 1e-9  # mass conserved

    def test_dangling_mass_redistributed(self):
        # b and c are sinks: their mass must recirculate, not vanish
        edges = _edges_ds([("a", "b"), ("a", "c")], ["subj", "obj"])
        got = _df(pagerank(edges, n_iters=8, max_broadcast_nodes=0, n_buckets=4))
        want = _df(pagerank(edges, n_iters=8))
        np.testing.assert_allclose(
            got["rank"].to_numpy(), want["rank"].to_numpy(), rtol=1e-11
        )
        assert abs(got["rank"].sum() - 1.0) < 1e-9


class TestHitsBucketed:
    def test_matches_broadcast(self, rnd_graph):
        edges = _edges_ds(rnd_graph, ["subj", "obj", "w"])
        want = _df(hits(edges, weight="w", n_iters=3))
        got = _df(
            hits(
                edges, weight="w", n_iters=3, max_broadcast_nodes=0,
                n_buckets=4,
            )
        )
        assert got["node"].tolist() == want["node"].tolist()
        for col in ("hub", "authority"):
            np.testing.assert_allclose(
                got[col].to_numpy(), want[col].to_numpy(), rtol=1e-11
            )
        # L2 norms are 1 after the final half-rounds
        assert abs(np.linalg.norm(want["hub"]) - 1.0) < 1e-9
        assert abs(np.linalg.norm(want["authority"]) - 1.0) < 1e-9

    def test_star_hub(self):
        # a -> {b,c,d}: a is the only hub, b/c/d equal authorities
        edges = _edges_ds(
            [("a", "b"), ("a", "c"), ("a", "d")], ["subj", "obj"]
        )
        got = (
            _df(hits(edges, n_iters=2, max_broadcast_nodes=0, n_buckets=4))
            .set_index("node")
        )
        assert got.loc["a", "hub"] == pytest.approx(1.0)
        assert got.loc["a", "authority"] == pytest.approx(0.0)
        for n in "bcd":
            assert got.loc[n, "authority"] == pytest.approx(1 / np.sqrt(3))
            assert got.loc[n, "hub"] == pytest.approx(0.0)


class TestKcoreBucketed:
    def test_matches_broadcast(self, rnd_graph):
        # one orientation (src < dst) per k_core's contract
        rows = sorted({(min(a, b), max(a, b)) for a, b, _ in rnd_graph})
        edges = _edges_ds(rows, ["subj", "obj"])
        want = k_core(edges, k=3, n_rounds=4).to_pandas()
        got = k_core(
            edges, k=3, n_rounds=4, max_broadcast_nodes=0, n_buckets=4
        ).to_pandas()
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0

    def test_full_peel(self):
        # a path graph has no 2-core: everything peels away
        rows = [("a", "b"), ("b", "c"), ("c", "d")]
        edges = _edges_ds(rows, ["subj", "obj"])
        got = k_core(edges, k=2, n_rounds=3, max_broadcast_nodes=0, n_buckets=4)
        assert len(got) == 0


@pytest.mark.slow
class TestMillionNodeStress:
    def test_bfs_1m_node_chain_of_stars(self):
        """≥1M nodes through the bucketed path: 4 hubs in a chain, each
        fanning to 250k leaves → 1,000,004 nodes, 5 BFS levels — no
        O(|V|) driver state at any point.  (4 hubs, not 8: each level is
        two full-edge exchanges, and the 4-CPU CI session pays ~2× per
        extra level for no additional coverage.)"""
        n_hubs, fan = 4, 250_000

        def gen(batch):
            h = int(batch["h"][0])
            leaves = [f"h{h:02d}L{j:06d}" for j in range(fan)]
            out = {
                "subj": [f"h{h:02d}"] * fan,
                "obj": leaves,
            }
            if h + 1 < n_hubs:
                out["subj"].append(f"h{h:02d}")
                out["obj"].append(f"h{h + 1:02d}")
            return pd.DataFrame(out)

        edges = ray.data.from_items(
            [{"h": h} for h in range(n_hubs)]
        ).map_batches(gen, batch_format="pandas", batch_size=1)
        got = bfs_levels(
            edges, "h00", max_broadcast_nodes=0, max_iters=16, n_buckets=8
        )
        total = got.count()
        assert total == n_hubs + n_hubs * fan
        # hub k sits at distance k; its leaves at k+1
        import pyarrow.compute as pc

        need = pa.array(["h00", "h03", "h02L000001"])
        df = got.map_batches(
            lambda b: b.filter(pc.is_in(b["node"], value_set=need)),
            batch_format="pyarrow",
        ).to_pandas()
        d = dict(zip(df["node"], df["dist"]))
        assert d == {"h00": 0, "h03": 3, "h02L000001": 3}


class TestRandomWalksBucketed:
    def test_matches_broadcast(self, rnd_graph):
        from bioie_llm_ray.stages.graph import random_walks

        edges = _edges_ds(
            [(a, b) for a, b, _ in rnd_graph], ["subj", "obj"]
        )
        kw = dict(n_walks=2, walk_len=4)
        a = (
            random_walks(edges, **kw)
            .to_pandas()
            .sort_values(["start", "walk", "step"])
            .reset_index(drop=True)
        )
        b = (
            random_walks(edges, max_broadcast_nodes=0, n_buckets=4, **kw)
            .to_pandas()
            .sort_values(["start", "walk", "step"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_walk_shape_and_adjacency(self):
        from bioie_llm_ray.stages.graph import random_walks

        ds = _edges_ds(
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"),
             ("c", "a")],
            ["subj", "obj"],
        )
        out = random_walks(ds, n_walks=2, walk_len=3).to_pandas()
        # every (start, walk) has steps 0..3 and step 0 is the start
        g = out.groupby(["start", "walk"])
        assert (g["step"].count() == 4).all()
        s0 = out[out["step"] == 0]
        assert (s0["start"] == s0["node"]).all()
        # consecutive steps are graph-adjacent
        edges = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
                 ("a", "c"), ("c", "a")}
        srt = out.sort_values(["start", "walk", "step"])
        for (_, _), grp in srt.groupby(["start", "walk"]):
            ns = list(grp["node"])
            for x, y in zip(ns, ns[1:]):
                assert (x, y) in edges


class TestMinSpanningForest:
    def _kruskal(self, rows):
        # serial reference under the (w, u, v) total order
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for u, v, w in sorted(rows, key=lambda r: (r[2], r[0], r[1])):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
                out.append((u, v, w))
        return sorted(out)

    def test_matches_kruskal(self, rnd_graph):
        from bioie_llm_ray.stages.graph import min_spanning_forest

        # undirected distinct edges: canonicalize (min, max) keep min w
        best = {}
        for a, b, w in rnd_graph:
            key = (min(a, b), max(a, b))
            if key not in best or w < best[key]:
                best[key] = w
        rows = [(a, b, w) for (a, b), w in best.items()]
        edges = _edges_ds(rows, ["subj", "obj", "w"])
        got = sorted(
            (r["subj"], r["obj"], r["w"])
            for r in min_spanning_forest(
                edges, weight="w", n_buckets=4
            ).take_all()
        )
        assert got == self._kruskal(rows)

    def test_forest_on_disconnected(self):
        from bioie_llm_ray.stages.graph import min_spanning_forest

        edges = _edges_ds(
            [("a", "b", 1), ("b", "c", 5), ("a", "c", 2),
             ("x", "y", 7)],
            ["subj", "obj", "w"],
        )
        got = sorted(
            (r["subj"], r["obj"], r["w"])
            for r in min_spanning_forest(edges, weight="w").take_all()
        )
        assert got == [("a", "b", 1), ("a", "c", 2), ("x", "y", 7)]
