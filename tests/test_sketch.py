"""Mergeable sketches: HyperLogLog distinct count, exact discrete quantiles."""

import numpy as np
import pandas as pd
import ray

from bioie_llm_ray.stages.sketch import (
    _hll_estimate,
    _hll_partial,
    approx_distinct,
    exact_quantiles_discrete,
)


class TestHLL:
    def test_error_within_bound(self):
        n = 100_000
        ds = ray.data.range(n, override_num_blocks=16).map_batches(
            lambda b: b.rename(columns={"id": "v"}), batch_format="pandas"
        )
        out = approx_distinct(ds, "v", p=14)
        rel = abs(out["estimate"] - n) / n
        assert rel < 0.03, rel  # 1.04/sqrt(2^14) ~ 0.8% std; 0.03 ~ 3.7 sigma

    def test_duplicates_do_not_inflate(self):
        rows = pd.DataFrame({"v": [f"u{i % 500:04d}" for i in range(50_000)]})
        out = approx_distinct(ray.data.from_pandas(rows), "v", p=14)
        assert abs(out["estimate"] - 500) / 500 < 0.03

    def test_partials_merge_by_max(self):
        a = _hll_partial([f"a{i}" for i in range(5000)], 12)
        b = _hll_partial([f"b{i}" for i in range(5000)], 12)
        ab = _hll_partial(
            [f"a{i}" for i in range(5000)] + [f"b{i}" for i in range(5000)], 12
        )
        assert np.array_equal(np.maximum(a, b), ab)
        est = _hll_estimate(np.maximum(a, b))
        assert abs(est - 10_000) / 10_000 < 0.05

    def test_small_cardinality_linear_counting(self):
        regs = _hll_partial(["x", "y", "z"], 14)
        assert round(_hll_estimate(regs)) == 3


class TestDiscreteQuantiles:
    def test_matches_duckdb_quantile_disc(self):
        import duckdb

        rng = np.random.RandomState(3)
        vals = rng.randint(1, 51, 20_000).astype(np.float64)
        df = pd.DataFrame({"x": vals})
        got = exact_quantiles_discrete(
            ray.data.from_pandas(df).repartition(8), "x", [0.1, 0.5, 0.9, 1.0]
        )
        con = duckdb.connect()
        con.register("t", df)
        for q in [0.1, 0.5, 0.9, 1.0]:
            want = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM t"
            ).fetchone()[0]
            assert got[q] == float(want), (q, got[q], want)


class TestHistQuantiles:
    def test_within_one_bin_of_exact(self):
        import numpy as np
        import ray

        from bioie_llm_ray.stages.sketch import approx_quantiles_hist

        rng = np.random.RandomState(11)
        vals = rng.lognormal(mean=3.0, sigma=1.0, size=20_000)
        ds = ray.data.from_items([{"v": float(x)} for x in vals])
        qs = [0.25, 0.5, 0.9]
        got = approx_quantiles_hist(ds, "v", qs, n_bins=2048)
        w = (vals.max() - vals.min()) / 2048
        srt = np.sort(vals)
        for q in qs:
            exact = srt[max(1, int(np.ceil(q * len(vals)))) - 1]
            assert exact <= got[q] <= exact + 2 * w, q

    def test_constant_and_empty(self):
        import math

        import pyarrow as pa
        import ray

        from bioie_llm_ray.stages.sketch import approx_quantiles_hist

        const = ray.data.from_items([{"v": 5.0}] * 10)
        assert approx_quantiles_hist(const, "v", [0.5]) == {0.5: 5.0}
        empty = ray.data.from_arrow(
            pa.table({"v": pa.array([], type=pa.float64())})
        )
        assert math.isnan(approx_quantiles_hist(empty, "v", [0.5])[0.5])


class TestHeavyHitters:
    def test_exact_vs_counter(self):
        import collections

        import numpy as np
        import ray

        from bioie_llm_ray.stages.sketch import heavy_hitters

        rng = np.random.RandomState(5)
        # Zipfian draw over 200 values + an adversarial all-distinct tail
        vals = [f"w{int(x)}" for x in rng.zipf(1.5, size=5000) if x < 200]
        vals += [f"rare{i}" for i in range(2000)]
        ds = ray.data.from_items([{"v": v} for v in vals])
        theta = 0.01
        got = heavy_hitters(ds, "v", theta=theta)
        counts = collections.Counter(vals)
        import math

        thresh = math.ceil(theta * len(vals))
        want = sorted(
            ((v, c) for v, c in counts.items() if c >= thresh),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert got == want

    def test_all_distinct_returns_empty(self):
        import ray

        from bioie_llm_ray.stages.sketch import heavy_hitters

        ds = ray.data.from_items([{"v": f"u{i}"} for i in range(500)])
        assert heavy_hitters(ds, "v", theta=0.05) == []


class TestGroupedQuantiles:
    def test_matches_pandas_quantile_disc(self):
        from bioie_llm_ray.stages.sketch import grouped_quantiles_discrete

        rng = np.random.RandomState(23)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c", "d"], 3000),
                "v": rng.randint(1, 51, 3000).astype("float64"),
            }
        )
        got = grouped_quantiles_discrete(
            ray.data.from_pandas(df).repartition(7),
            group_col="g",
            col="v",
            quantiles=[0.25, 0.5, 0.75],
            n_buckets=3,
        )

        def disc(s, q):
            vals = np.sort(s.to_numpy())
            return float(vals[max(1, int(np.ceil(q * len(vals)))) - 1])

        for _, row in got.iterrows():
            s = df[df["g"] == row["g"]]["v"]
            assert row["p25"] == disc(s, 0.25)
            assert row["p50"] == disc(s, 0.5)
            assert row["p75"] == disc(s, 0.75)
        assert sorted(got["g"]) == ["a", "b", "c", "d"]

    def test_single_element_groups(self):
        from bioie_llm_ray.stages.sketch import grouped_quantiles_discrete

        df = pd.DataFrame({"g": ["x", "y"], "v": [3.0, 9.0]})
        got = grouped_quantiles_discrete(
            ray.data.from_pandas(df), "g", "v", [0.5], n_buckets=2
        )
        assert got.set_index("g")["p50"].to_dict() == {"x": 3.0, "y": 9.0}


class TestContQuantiles:
    def test_matches_duckdb_quantile_cont(self):
        import duckdb

        from bioie_llm_ray.stages.sketch import exact_quantiles_cont

        rng = np.random.RandomState(5)
        # continuous-ish values with some exact ties
        vals = np.round(rng.uniform(0, 1000, 15_000), 2)
        df = pd.DataFrame({"x": vals})
        qs = [0.0, 0.25, 0.5, 0.613, 0.9, 1.0]
        got = exact_quantiles_cont(
            ray.data.from_pandas(df).repartition(9), "x", qs
        )
        con = duckdb.connect()
        con.register("t", df)
        for q in qs:
            want = con.execute(
                f"SELECT quantile_cont(x, {q}) FROM t"
            ).fetchone()[0]
            assert abs(got[q] - float(want)) < 1e-9, (q, got[q], want)

    def test_matches_numpy_interpolation(self):
        from bioie_llm_ray.stages.sketch import exact_quantiles_cont

        rng = np.random.RandomState(8)
        vals = rng.uniform(-5, 5, 999)
        got = exact_quantiles_cont(
            ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(4),
            "x",
            [0.25, 0.5, 0.75],
        )
        for q in (0.25, 0.5, 0.75):
            want = float(np.quantile(vals, q))  # linear interpolation
            assert abs(got[q] - want) < 1e-9

    def test_single_row(self):
        from bioie_llm_ray.stages.sketch import exact_quantiles_cont

        got = exact_quantiles_cont(
            ray.data.from_pandas(pd.DataFrame({"x": [42.0]})), "x", [0.5]
        )
        assert got[0.5] == 42.0


class TestCountMin:
    def _stream(self, words, parts=5):
        df = pd.DataFrame({"token": words})
        return ray.data.from_pandas(
            df.sample(frac=1.0, random_state=6)
        ).repartition(parts)

    def test_overestimate_and_accuracy(self):
        from collections import Counter

        from bioie_llm_ray.stages.sketch import count_min, count_min_estimate

        rng = np.random.RandomState(11)
        words = [f"w{int(i)}" for i in rng.zipf(1.5, 5000) if i < 500]
        truth = Counter(words)
        sk = count_min(self._stream(words), "token", d=4, w=512)
        keys = sorted(truth)
        est = count_min_estimate(sk, keys)
        for k, e in zip(keys, est):
            assert e >= truth[k]  # CM never under-estimates
            assert e <= truth[k] + 2 * len(words) // 512 + 8

    def test_sketch_is_mergeable_and_partition_invariant(self):
        from bioie_llm_ray.stages.sketch import count_min

        words = [f"t{i % 37}" for i in range(700)]
        a = count_min(self._stream(words, parts=2), "token", d=3, w=64)
        b = count_min(self._stream(words, parts=11), "token", d=3, w=64)
        assert (a == b).all()
        assert a.sum() == 3 * 700  # every occurrence lands once per row

    def test_total_mass_per_row(self):
        from bioie_llm_ray.stages.sketch import count_min

        sk = count_min(self._stream(["x", "y", "x"]), "token", d=4, w=16)
        assert (sk.sum(axis=1) == 3).all()


class TestHLLSetOps:
    def test_union_and_intersection_estimates(self):
        from bioie_llm_ray.stages.sketch import _hll_estimate, approx_distinct

        n_a, n_b, n_both = 4000, 3000, 1000
        a_vals = [f"a{i}" for i in range(n_a - n_both)] + [
            f"c{i}" for i in range(n_both)
        ]
        b_vals = [f"b{i}" for i in range(n_b - n_both)] + [
            f"c{i}" for i in range(n_both)
        ]
        a = approx_distinct(
            ray.data.from_pandas(pd.DataFrame({"v": a_vals})).repartition(4),
            "v",
        )
        b = approx_distinct(
            ray.data.from_pandas(pd.DataFrame({"v": b_vals})).repartition(4),
            "v",
        )
        est_u = _hll_estimate(np.maximum(a["registers"], b["registers"]))
        est_i = a["estimate"] + b["estimate"] - est_u
        assert abs(est_u - (n_a + n_b - n_both)) / (n_a + n_b - n_both) < 0.05
        # inclusion-exclusion error compounds three estimates; stay loose
        assert abs(est_i - n_both) / n_both < 0.15


class TestGroupedHeavyHitters:
    def test_equals_per_group_counter(self):
        from collections import Counter

        from bioie_llm_ray.stages.sketch import heavy_hitters_grouped

        rng = np.random.RandomState(23)
        gs = rng.choice(["g1", "g2", "g3"], 8000)
        vs = [f"w{int(i)}" for i in rng.zipf(1.3, 8000)]
        df = pd.DataFrame({"g": gs, "v": vs})
        theta = 0.02
        got = heavy_hitters_grouped(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=2)
            ).repartition(9),
            "g",
            "v",
            theta=theta,
        )
        want = []
        import math

        for g, sub in df.groupby("g"):
            n = len(sub)
            for v, c in Counter(sub["v"]).items():
                if c >= math.ceil(theta * n):
                    want.append((g, v, c))
        want.sort()
        assert got == want and len(want) > 0

    def test_all_distinct_group_survives_n_accounting(self):
        from bioie_llm_ray.stages.sketch import heavy_hitters_grouped

        # one group all-distinct (no hitters), one with a clear hitter
        df = pd.DataFrame(
            {
                "g": ["a"] * 500 + ["b"] * 10,
                "v": [f"u{i}" for i in range(500)] + ["hot"] * 10,
            }
        )
        got = heavy_hitters_grouped(
            ray.data.from_pandas(df).repartition(4), "g", "v", theta=0.5
        )
        assert got == [("b", "hot", 10)]


class TestGroupedContQuantiles:
    def test_matches_duckdb_per_group(self):
        import duckdb

        from bioie_llm_ray.stages.sketch import grouped_quantiles_cont

        rng = np.random.RandomState(29)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 4000),
                "x": np.round(rng.uniform(0, 100, 4000), 3),
            }
        )
        got = grouped_quantiles_cont(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=3)
            ).repartition(7),
            "g",
            "x",
            [0.25, 0.5, 0.9],
            n_buckets=4,
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT g, quantile_cont(x, 0.25) p25, quantile_cont(x, 0.5) p50,"
            " quantile_cont(x, 0.9) p90 FROM t GROUP BY g ORDER BY g"
        ).df()
        for c in ("p25", "p50", "p90"):
            assert np.allclose(got[c], want[c], atol=1e-9), c

    def test_single_element_group(self):
        from bioie_llm_ray.stages.sketch import grouped_quantiles_cont

        df = pd.DataFrame({"g": ["a", "b", "b"], "x": [5.0, 1.0, 2.0]})
        got = grouped_quantiles_cont(
            ray.data.from_pandas(df), "g", "x", [0.5], n_buckets=2
        )
        assert got[got.g == "a"].p50.iloc[0] == 5.0
        assert got[got.g == "b"].p50.iloc[0] == 1.5
