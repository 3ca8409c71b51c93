"""connected_components / cluster_dedup vs a serial union-find reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from bioie_llm_ray.stages.graph import cluster_dedup, connected_components


def _uf_reference(edges):
    """Serial union-find: {node: min id of its component}."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_ds(edges):
    return ray.data.from_items(
        [{"id_a": int(a), "id_b": int(b)} for a, b in edges]
    )


def _labels(ds):
    return {r["node"]: r["component"] for r in ds.take_all()}


class TestConnectedComponents:
    def test_chain_cycle_and_singleton_edge(self):
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 20), (5, 5)]
        # 5-5 self loop is dropped; node 5 never appears
        got = _labels(connected_components(_pairs_ds(edges), n_buckets=4))
        want = _uf_reference([(a, b) for a, b in edges if a != b])
        assert got == want

    def test_random_graph_matches_union_find(self):
        rng = np.random.RandomState(7)
        edges = [
            (int(rng.randint(200)), int(rng.randint(200))) for _ in range(300)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _labels(connected_components(_pairs_ds(edges), n_buckets=8))
        assert got == _uf_reference(edges)

    def test_star_collapse_hub(self):
        # one hub component + log-round convergence: 0-1, 1-2, ..., a path
        # of 64 nodes (worst case for label propagation, fine for star ops)
        edges = [(i, i + 1) for i in range(32)]
        got = _labels(connected_components(_pairs_ds(edges), n_buckets=4))
        assert set(got.values()) == {0}
        assert len(got) == 33

    def test_empty_pairs(self):
        ds = ray.data.from_arrow(
            __import__("pyarrow").table(
                {"id_a": [], "id_b": []}
            ).cast(
                __import__("pyarrow").schema(
                    [("id_a", __import__("pyarrow").int64()), ("id_b", __import__("pyarrow").int64())]
                )
            )
        )
        assert connected_components(ds).take_all() == []


class TestClusterDedup:
    def test_keeps_component_minimum(self):
        docs = ray.data.from_items(
            [{"doc_id": i, "text": f"d{i}"} for i in range(8)]
        )
        pairs = _pairs_ds([(1, 2), (2, 5), (6, 7)])
        kept = sorted(
            r["doc_id"] for r in cluster_dedup(docs, pairs).take_all()
        )
        # components {1,2,5} -> keep 1; {6,7} -> keep 6; singletons stay
        assert kept == [0, 1, 3, 4, 6]


class TestStringIds:
    def test_string_node_ids(self):
        # public id_col API: string doc ids are first-class (lexicographic min)
        edges = [("docB", "docA"), ("docB", "docC"), ("docX", "docY")]
        got = _labels(
            connected_components(
                ray.data.from_items(
                    [{"id_a": a, "id_b": b} for a, b in edges]
                ),
                n_buckets=4,
            )
        )
        assert got == {
            "docA": "docA",
            "docB": "docA",
            "docC": "docA",
            "docX": "docX",
            "docY": "docX",
        }


class TestMaterializeGraph:
    def test_edges_nodes_and_manifest(self, tmp_path):
        from bioie_llm_ray.stages.graph import materialize_graph

        triples = ray.data.from_items(
            [
                {"subj": "A", "pred": "r", "obj": "B"},
                {"subj": "A", "pred": "r", "obj": "B"},  # repeat -> support 2
                {"subj": "A", "pred": "r", "obj": "C"},
                {"subj": "B", "pred": "s", "obj": "C"},
            ]
        )
        out = materialize_graph(
            triples, out_root=str(tmp_path / "kg"), lineage={"model_id": "m"}
        )
        edges = {
            (r["subj"], r["pred"], r["obj"]): r["support"]
            for r in out["edges"].take_all()
        }
        assert edges == {("A", "r", "B"): 2, ("A", "r", "C"): 1, ("B", "s", "C"): 1}
        nodes = {
            r["entity"]: (r["degree"], r["support"])
            for r in out["nodes"].take_all()
        }
        # A: nbrs {B, C}, support 2+1; B: nbrs {A, C}, support 2+1;
        # C: nbrs {A, B}, support 1+1
        assert nodes == {"A": (2, 3), "B": (2, 3), "C": (2, 2)}

        import json

        man = json.loads((tmp_path / "kg" / "MANIFEST.json").read_text())
        assert man["n_edges"] == 3 and man["n_nodes"] == 3
        assert man["lineage"] == {"model_id": "m"}
        # the written shards re-read to the same tables
        re_edges = ray.data.read_parquet(str(tmp_path / "kg" / "edges"))
        assert sorted(
            (r["subj"], r["pred"], r["obj"], r["support"])
            for r in re_edges.take_all()
        ) == sorted((s, p, o, w) for (s, p, o), w in edges.items())


class TestPageRank:
    def _np_reference(self, edges, weights, damping=0.85, n_iters=20):
        import numpy as np

        nodes = sorted({str(x) for e in edges for x in e})
        ix = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        W = np.zeros((n, n))
        for (s, d), w in zip(edges, weights):
            W[ix[str(d)], ix[str(s)]] += w
        od = W.sum(axis=0)
        r = np.full(n, 1.0 / n)
        for _ in range(n_iters):
            contrib = W @ np.where(od > 0, r / np.where(od > 0, od, 1), 0.0)
            dangling = r[od == 0].sum()
            r = (1 - damping) / n + damping * (contrib + dangling / n)
        return dict(zip(nodes, r))

    def test_matches_numpy_power_iteration(self):
        from bioie_llm_ray.stages.graph import pagerank

        rng = np.random.RandomState(3)
        edges = [
            (int(rng.randint(30)), int(rng.randint(30))) for _ in range(120)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        weights = [float(rng.randint(1, 5)) for _ in edges]
        ds = ray.data.from_items(
            [
                {"subj": a, "obj": b, "w": w}
                for (a, b), w in zip(edges, weights)
            ]
        )
        got = {
            r["node"]: r["rank"]
            for r in pagerank(ds, weight="w", n_iters=8).take_all()
        }
        want = self._np_reference(edges, weights, n_iters=8)
        assert set(got) == set(want)
        for v in got:
            assert abs(got[v] - want[v]) < 1e-9, v
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_dangling_mass_redistributed(self):
        from bioie_llm_ray.stages.graph import pagerank

        # 1 -> 2, 2 is a sink (dangling): mass must recycle, ranks sum to 1
        ds = ray.data.from_items([{"subj": 1, "obj": 2}])
        got = {r["node"]: r["rank"] for r in pagerank(ds).take_all()}
        want = self._np_reference([(1, 2)], [1.0])
        for v in got:
            assert abs(got[v] - want[v]) < 1e-12
        assert got["2"] > got["1"]


class TestBfsLevels:
    def test_chain_levels_and_unreachable(self):
        import pyarrow as pa
        import ray

        from bioie_llm_ray.stages.graph import bfs_levels

        # a -> b -> c -> d chain plus an isolated x <-> y pair
        edges = pa.table(
            {
                "subj": ["a", "b", "c", "x"],
                "obj": ["b", "c", "d", "y"],
            }
        )

        def both(b):
            return pa.table(
                {
                    "subj": pa.concat_arrays(
                        [b["subj"].combine_chunks(), b["obj"].combine_chunks()]
                    ),
                    "obj": pa.concat_arrays(
                        [b["obj"].combine_chunks(), b["subj"].combine_chunks()]
                    ),
                }
            )

        ds = ray.data.from_arrow(edges).map_batches(
            both, batch_format="pyarrow"
        )
        out = bfs_levels(ds, seed="a").to_pandas()
        got = dict(zip(out["node"], out["dist"]))
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # x, y unreachable

    def test_seed_without_edges(self):
        import pyarrow as pa
        import ray

        from bioie_llm_ray.stages.graph import bfs_levels

        ds = ray.data.from_arrow(
            pa.table({"subj": ["p"], "obj": ["q"]})
        )
        out = bfs_levels(ds, seed="z").to_pandas()
        assert dict(zip(out["node"], out["dist"])) == {"z": 0}


def _lpa_serial(edges, n_iters=4):
    """Serial synchronous weighted LPA with the same deterministic rules."""
    nodes = sorted({n for e in edges for n in e[:2]})
    labels = {v: v for v in nodes}
    for _ in range(n_iters):
        votes = {}
        for s, d, w in edges:
            k = (d, labels[s])
            votes[k] = votes.get(k, 0.0) + w
        best = {}
        for (node, label), w in votes.items():
            cur = best.get(node)
            if cur is None or (-w, label) < (-cur[0], cur[1]):
                best[node] = (w, label)
        labels = {v: best[v][1] if v in best else l for v, l in labels.items()}
    return labels


def _edges_ds(edges):
    rows = [{"subj": s, "obj": d, "w": float(w)} for s, d, w in edges]
    return ray.data.from_items(rows).repartition(3)


class TestLabelPropagation:
    # two triangles bridged by one weak edge (both orientations listed)
    TRI = [
        ("a", "b", 5), ("b", "c", 5), ("a", "c", 5),
        ("x", "y", 5), ("y", "z", 5), ("x", "z", 5),
        ("c", "x", 1),
    ]

    @staticmethod
    def _undirected(weighted):
        return [(s, d, w) for s, d, w in weighted] + [
            (d, s, w) for s, d, w in weighted
        ]

    def test_two_clusters_resolved(self):
        from bioie_llm_ray.stages.graph import label_propagation

        edges = self._undirected(self.TRI)
        out = label_propagation(
            _edges_ds(edges), weight="w", n_iters=4
        ).to_pandas()
        comm = dict(zip(out["node"], out["community"]))
        assert comm["a"] == comm["b"] == comm["c"]
        assert comm["x"] == comm["y"] == comm["z"]
        assert comm["a"] != comm["x"]

    def test_matches_serial_reference(self):
        from bioie_llm_ray.stages.graph import label_propagation

        edges = self._undirected(self.TRI) + self._undirected(
            [("p", "q", 2), ("q", "r", 3)]
        )
        out = label_propagation(
            _edges_ds(edges), weight="w", n_iters=4
        ).to_pandas()
        want = _lpa_serial(edges, n_iters=4)
        got = dict(zip(out["node"], out["community"]))
        assert got == want

    def test_tie_breaks_to_smallest_label(self):
        from bioie_llm_ray.stages.graph import label_propagation

        # node m receives equal-weight votes from 'a' and 'b' -> 'a' wins
        edges = [("a", "m", 1.0), ("b", "m", 1.0)]
        out = label_propagation(
            _edges_ds(edges), weight="w", n_iters=1
        ).to_pandas()
        comm = dict(zip(out["node"], out["community"]))
        assert comm["m"] == "a"

    def test_unweighted_defaults_to_one(self):
        from bioie_llm_ray.stages.graph import label_propagation

        edges = self._undirected(self.TRI)
        ds = ray.data.from_items(
            [{"subj": s, "obj": d} for s, d, _ in edges]
        ).repartition(2)
        out = label_propagation(ds, n_iters=4).to_pandas()
        want = _lpa_serial([(s, d, 1.0) for s, d, _ in edges], n_iters=4)
        assert dict(zip(out["node"], out["community"])) == want

    def test_empty_graph(self):
        from bioie_llm_ray.stages.graph import label_propagation

        ds = ray.data.from_items([{"subj": "a", "obj": "b"}]).filter(
            lambda r: False
        )
        out = label_propagation(ds, n_iters=2)
        # Dataset keeps the declared schema; to_pandas() of an empty
        # dataset drops columns (Ray quirk), so assert on the schema
        assert out.schema().names == ["node", "community"]
        assert out.count() == 0


class TestKCore:
    def test_hand_built_peeling(self):
        """A triangle (core-3 fails, core-2 survives) plus a pendant chain
        that peels away round by round."""
        from bioie_llm_ray.stages.graph import k_core

        # triangle a-b-c; chain c-d, d-e (d,e peel at k=2)
        edges = pd.DataFrame(
            {
                "subj": ["a", "a", "b", "c", "d"],
                "obj": ["b", "c", "c", "d", "e"],
            }
        )
        ds = ray.data.from_pandas(edges)
        out = k_core(ds, k=2, n_rounds=4).to_pandas()
        assert list(out["entity"]) == ["a", "b", "c"]
        assert list(out["deg"]) == [2, 2, 2]
        # k=3: even the triangle dies (degree 2 < 3)
        out3 = k_core(ds, k=3, n_rounds=4).to_pandas()
        assert len(out3) == 0


class TestSSSPWeighted:
    def test_weighted_path_beats_hop_path(self):
        """Direct edge a→d costs 10; the 3-hop detour a→b→c→d costs 3 —
        weighted SSSP must take the detour where BFS would not."""
        from bioie_llm_ray.stages.graph import sssp_weighted

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "subj": ["a", "a", "b", "c"],
                    "obj": ["d", "b", "c", "d"],
                    "w": pa.array([10, 1, 1, 1], type=pa.int64()),
                }
            )
        )
        out = (
            sssp_weighted(edges, seed="a")
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        assert out == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_round_bound_truncates_exactly(self):
        """max_iters=1 → only 1-edge paths: d reachable at cost 10."""
        from bioie_llm_ray.stages.graph import sssp_weighted

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "subj": ["a", "a", "b", "c"],
                    "obj": ["d", "b", "c", "d"],
                    "w": pa.array([10, 1, 1, 1], type=pa.int64()),
                }
            )
        )
        out = (
            sssp_weighted(edges, seed="a", max_iters=1)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        assert out == {"a": 0, "b": 1, "d": 10}


class TestTransitiveClosureScc:
    def test_closure_planted_chain_and_cycle(self):
        """Chain a→b→c plus cycle {x,y}: closure has every ≥1-length path,
        self-pairs only inside the cycle."""
        from bioie_llm_ray.stages.graph import transitive_closure

        edges = ray.data.from_items(
            [
                {"src": "a", "dst": "b"},
                {"src": "b", "dst": "c"},
                {"src": "x", "dst": "y"},
                {"src": "y", "dst": "x"},
            ]
        )
        out = {
            (r["src"], r["dst"])
            for r in transitive_closure(edges, n_buckets=4).take_all()
        }
        assert out == {
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "x"), ("x", "x"), ("y", "y"),
        }

    def test_scc_planted_topology(self):
        """Two cycles bridged one-way + a tail: labels = min of each
        mutual-reach class; bridge and tail stay singletons."""
        from bioie_llm_ray.stages.graph import strongly_connected_components

        edges = ray.data.from_items(
            [
                {"src": 1, "dst": 2},
                {"src": 2, "dst": 3},
                {"src": 3, "dst": 1},
                {"src": 10, "dst": 11},
                {"src": 11, "dst": 10},
                {"src": 3, "dst": 10},
                {"src": 11, "dst": 20},
            ]
        )
        out = {
            r["node"]: r["scc"]
            for r in strongly_connected_components(edges, n_buckets=4).take_all()
        }
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


class TestDagLongestLevels:
    def test_planted_diamond_with_tail(self):
        """a→b→d, a→c→d, d→e: levels are longest paths (d at 2, e at 3)."""
        from bioie_llm_ray.stages.graph import dag_longest_levels

        edges = ray.data.from_items(
            [
                {"src": "a", "dst": "b"},
                {"src": "a", "dst": "c"},
                {"src": "b", "dst": "d"},
                {"src": "c", "dst": "d"},
                {"src": "d", "dst": "e"},
            ]
        )
        out = {
            r["node"]: r["level"]
            for r in dag_longest_levels(edges, n_buckets=4).take_all()
        }
        assert out == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}

    def test_cycle_raises(self):
        from bioie_llm_ray.stages.graph import dag_longest_levels
        import pytest

        edges = ray.data.from_items(
            [{"src": "x", "dst": "y"}, {"src": "y", "dst": "x"}]
        )
        with pytest.raises(RuntimeError, match="converge"):
            dag_longest_levels(edges, n_buckets=2, max_rounds=6)


class TestWlColors:
    def test_path_vs_star_distinguished(self):
        """P4 path ends vs middles get different colors; star center differs
        from leaves; all four leaves of the star share a color."""
        from bioie_llm_ray.stages.graph import wl_colors

        path = ray.data.from_items(
            [{"src": "a", "dst": "b"}, {"src": "b", "dst": "c"},
             {"src": "c", "dst": "d"}]
        )
        star = ray.data.from_items(
            [{"src": "hub", "dst": f"leaf{i}"} for i in range(4)]
        )
        p = {r["node"]: r["color"] for r in wl_colors(path, n_buckets=2).take_all()}
        s = {r["node"]: r["color"] for r in wl_colors(star, n_buckets=2).take_all()}
        assert p["a"] == p["d"] and p["b"] == p["c"] and p["a"] != p["b"]
        leaves = {s[f"leaf{i}"] for i in range(4)}
        assert len(leaves) == 1 and s["hub"] not in leaves


class TestKTruss:
    def test_k4_clique_survives_shared_edge_pair_dies(self):
        """K4 is its own 4-truss (every edge in 2 triangles); two triangles
        sharing one edge peel to nothing at k=4."""
        from bioie_llm_ray.stages.graph import k_truss

        k4 = ray.data.from_items(
            [{"src": a, "dst": b}
             for i, a in enumerate([1, 2, 3, 4])
             for b in [1, 2, 3, 4][i + 1:]]
        )
        out = {(r["u"], r["v"]) for r in k_truss(k4, k=4, n_buckets=2).take_all()}
        assert out == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}

        shared = ray.data.from_items(
            [{"src": 1, "dst": 2}, {"src": 1, "dst": 3}, {"src": 2, "dst": 3},
             {"src": 2, "dst": 4}, {"src": 3, "dst": 4}]
        )
        assert k_truss(shared, k=4, n_buckets=2).count() == 0

    def test_k_below_3_rejected(self):
        from bioie_llm_ray.stages.graph import k_truss
        import pytest

        edges = ray.data.from_items([{"src": 1, "dst": 2}])
        with pytest.raises(ValueError):
            k_truss(edges, k=2)


class TestGraphScaleStress:
    """Structure-scaled stress for the closure/SCC family: node and pair
    counts well beyond the bucket count, shapes chosen so the closure
    stays linear-ish (a path) or bounded (many small cycles) — proving
    the iteration holds no per-node driver state and the doubling-round
    count stays logarithmic."""

    def test_closure_long_path_log_rounds(self):
        """256-node directed path: closure = C(256,2) pairs in ⌈log2(255)⌉=8
        doubling rounds (max_rounds=9 would fail if rounds were linear)."""
        from bioie_llm_ray.stages.graph import transitive_closure

        n = 256
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": [f"n{i:04d}" for i in range(n - 1)],
                    "dst": [f"n{i + 1:04d}" for i in range(n - 1)],
                }
            )
        )
        out = transitive_closure(edges, n_buckets=8, max_rounds=9)
        assert out.count() == n * (n - 1) // 2

    def test_scc_many_small_cycles(self):
        """600 disjoint 3-cycles (1800 nodes): every node labeled with its
        cycle's minimum — closure stays bounded (9 pairs per cycle)."""
        from bioie_llm_ray.stages.graph import strongly_connected_components

        rows = []
        for c in range(600):
            a, b, d = 3 * c, 3 * c + 1, 3 * c + 2
            rows += [
                {"src": a, "dst": b},
                {"src": b, "dst": d},
                {"src": d, "dst": a},
            ]
        out = strongly_connected_components(
            ray.data.from_arrow(pa.Table.from_pylist(rows)), n_buckets=8
        ).to_pandas()
        assert len(out) == 1800
        assert (out["scc"].to_numpy() == (out["node"].to_numpy() // 3) * 3).all()


class TestGraphEdgeCases:
    def test_scc_and_levels_empty_input(self):
        from bioie_llm_ray.stages.graph import (
            dag_longest_levels,
            strongly_connected_components,
        )

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], type=pa.string()),
                    "dst": pa.array([], type=pa.string()),
                }
            )
        )
        assert strongly_connected_components(empty, n_buckets=2).count() == 0
        assert dag_longest_levels(empty, n_buckets=2).count() == 0

    def test_levels_depth_equals_max_rounds(self):
        """A depth-3 chain must succeed at max_rounds=3 (the loop budgets
        the drain + detection rounds on top of the depth)."""
        from bioie_llm_ray.stages.graph import dag_longest_levels

        chain = ray.data.from_items(
            [{"src": "a", "dst": "b"}, {"src": "b", "dst": "c"},
             {"src": "c", "dst": "d"}]
        )
        out = {
            r["node"]: r["level"]
            for r in dag_longest_levels(chain, n_buckets=2, max_rounds=3).take_all()
        }
        assert out == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_ktruss_budget_shared_with_oracle(self):
        from bioie_llm_ray.oracle import ktruss_sql
        from bioie_llm_ray.stages.graph import K_TRUSS_MAX_ROUNDS

        # the oracle's deepest unrolled CTE must match the Ray raise point
        assert f"e{K_TRUSS_MAX_ROUNDS} AS MATERIALIZED" in ktruss_sql()
        assert f"e{K_TRUSS_MAX_ROUNDS + 1}" not in ktruss_sql()


class TestMaximalIndependentSet:
    def _run(self, pairs, n_rounds=6):
        import ray

        from bioie_llm_ray.stages.graph import maximal_independent_set

        edges = ray.data.from_items(
            [{"src": s, "dst": d} for s, d in pairs]
        )
        out = maximal_independent_set(
            edges, n_rounds=n_rounds, n_buckets=4
        ).to_pandas()
        return out.set_index("node")

    def test_independence_and_maximality(self):
        # path 0-1-2-3-4 plus a triangle 5-6-7 and an isolated pair 8-9
        pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (8, 9)]
        out = self._run(pairs)
        status = out["in_mis"].to_dict()
        # every node decided (graph exhausts well inside 6 rounds)
        assert set(status.values()) <= {0, 1}
        adj: dict[int, set] = {}
        for s, d in pairs:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        # independence: no edge inside the MIS
        for s, d in pairs:
            assert not (status[s] == 1 and status[d] == 1), (s, d)
        # maximality: every removed node has an MIS neighbor
        for n, st in status.items():
            if st == 0:
                assert any(status[m] == 1 for m in adj[n]), n

    def test_rounds_monotone_and_self_consistent(self):
        pairs = [(i, i + 1) for i in range(12)]
        out = self._run(pairs)
        # winners and their removed neighbors share the decision round
        assert (out["round_decided"] >= 1).all()
        assert set(out["in_mis"].unique()) <= {0, 1}

    def test_undecided_when_rounds_exhausted(self):
        # a single round cannot finish a long path; leftovers emit -1
        pairs = [(i, i + 1) for i in range(30)]
        out = self._run(pairs, n_rounds=1)
        assert (out["in_mis"] == -1).sum() > 0
        assert (out.loc[out["in_mis"] == -1, "round_decided"] == -1).all()


class TestMaximalMatching:
    def _run(self, pairs, n_rounds=6):
        import ray

        from bioie_llm_ray.stages.graph import maximal_matching

        edges = ray.data.from_items(
            [{"src": s, "dst": d} for s, d in pairs]
        )
        return maximal_matching(
            edges, n_rounds=n_rounds, n_buckets=4
        ).to_pandas()

    def test_matching_valid_and_maximal(self):
        # two squares joined by a bridge plus a pendant
        pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4), (4, 5), (5, 6),
                 (6, 7), (7, 4), (7, 8)]
        out = self._run(pairs)
        matched_nodes: list = []
        for u, v in zip(out["u"], out["v"]):
            matched_nodes += [u, v]
        # validity: no node appears in two matched edges
        assert len(matched_nodes) == len(set(matched_nodes))
        # maximality: every input edge touches a matched node
        ms = set(matched_nodes)
        for s, d in pairs:
            assert s in ms or d in ms, (s, d)

    def test_canonicalization_dedups_directions(self):
        # the same undirected edge in both directions is ONE edge
        out = self._run([(1, 2), (2, 1)])
        assert len(out) == 1
        assert (out.iloc[0]["u"], out.iloc[0]["v"]) == (1, 2)


class TestMultiSourceBfs:
    def test_all_pairs_distances_on_chain(self):
        import ray

        from bioie_llm_ray.stages.graph import multi_source_bfs

        # directed chain 0 -> 1 -> 2 -> 3
        edges = ray.data.from_items(
            [{"src": i, "dst": i + 1} for i in range(3)]
        )
        got = {
            (r["seed"], r["node"]): r["dist"]
            for r in multi_source_bfs(
                edges, max_iters=6, n_buckets=2
            ).take_all()
        }
        want = {
            (s, t): t - s for s in range(4) for t in range(s, 4)
        }
        assert got == want

    def test_horizon_truncates_identically(self):
        import ray

        from bioie_llm_ray.stages.graph import multi_source_bfs

        edges = ray.data.from_items(
            [{"src": i, "dst": i + 1} for i in range(5)]
        )
        got = multi_source_bfs(edges, max_iters=2, n_buckets=2).take_all()
        # no pair beyond 2 hops is emitted
        assert max(r["dist"] for r in got) == 2
        assert all(r["dist"] >= 0 for r in got)
