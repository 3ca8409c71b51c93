"""Unigram-LM scoring, left-outer shuffle join, cumulative window."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from bioie_llm_ray.stages.join import shuffle_join


class TestLeftOuterShuffleJoin:
    def test_unmatched_left_rows_survive(self):
        left = ray.data.from_arrow(
            pa.table({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
        )
        right = ray.data.from_arrow(
            pa.table({"k": [2, 2, 3], "rv": [10, 11, 12]})
        )
        out = shuffle_join(
            left,
            right,
            keys="k",
            n_buckets=4,
            join_type="left outer",
            left_schema={"k": pa.int64(), "lv": pa.string()},
            right_schema={"k": pa.int64(), "rv": pa.int64()},
        ).to_pandas()
        # every left key appears; k=2 fans out to its two matches
        assert sorted(out["k"]) == [1, 2, 2, 3, 4]
        unmatched = out[out["k"].isin([1, 4])]
        assert unmatched["rv"].isna().all()

    def test_left_outer_rollup_counts_matches_only(self):
        left = ray.data.from_arrow(pa.table({"k": [1, 2, 3]}))
        right = ray.data.from_arrow(pa.table({"k": [2, 2], "rv": [5, 6]}))

        def rollup(joined: pa.Table) -> pa.Table:
            df = joined.to_pandas()
            g = df.groupby("k", as_index=False).agg(n=("rv", "count"))
            return pa.table(
                {
                    "k": pa.array(g["k"], type=pa.int64()),
                    "n": pa.array(g["n"], type=pa.int64()),
                }
            )

        out = shuffle_join(
            left,
            right,
            keys="k",
            n_buckets=2,
            join_type="left outer",
            left_schema={"k": pa.int64()},
            right_schema={"k": pa.int64(), "rv": pa.int64()},
            bucket_post=rollup,
        ).to_pandas()
        assert dict(zip(out["k"], out["n"])) == {1: 0, 2: 2, 3: 0}


class TestUnigramLM:
    def test_scores_match_hand_computed(self, tmp_path, sf_dir):
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import doc_unigram_lm

        # corpus: 'a' x4, 'b' x2, 'c' x1, 'd' x1  (8 tokens)
        docs = pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["a a b", "a a b c", "d"],
                "lang": ["en"] * 3,
            }
        )
        d = tmp_path / "lm"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        out = doc_unigram_lm(str(d), top_v=2)  # top-2: a, b; OOV mass = 2/8
        p = {"a": 4 / 8, "b": 2 / 8}
        oov = 2 / 8
        exp0 = -(2 * np.log2(p["a"]) + np.log2(p["b"])) / 3
        exp1 = -(2 * np.log2(p["a"]) + np.log2(p["b"]) + np.log2(oov)) / 4
        exp2 = -np.log2(oov)
        got = dict(zip(out["doc_id"], out["bits_per_token"]))
        assert abs(got[0] - exp0) < 1e-6
        assert abs(got[1] - exp1) < 1e-6
        assert abs(got[2] - exp2) < 1e-6
        assert dict(zip(out["doc_id"], out["n_tokens"])) == {0: 3, 1: 4, 2: 1}


class TestCumulativeWindow:
    def test_running_sum_per_user(self, sf_dir):
        from bioie_llm_ray.pipelines.analytics import user_cumulative_value

        out = user_cumulative_value(sf_dir)
        # within each user (ordered by ts, event_id) cum_value is the
        # running total of a nonneg... values may be negative; instead
        # recompute per user for a sample and compare
        import pyarrow.parquet as pq
        import os

        ev = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "value"],
        ).to_pandas()
        uid = ev["user_id"].iloc[0]
        mine = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        expected = np.round(mine["value"].cumsum().to_numpy(), 4)
        got = (
            out[out["user_id"] == uid]
            .sort_values(["ts", "event_id"])["cum_value"]
            .to_numpy()
        )
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestDupNgramSpans:
    def test_planted_duplicate_window(self, tmp_path):
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import doc_dup_ngram_spans

        shared = "alpha beta gamma delta epsilon"
        docs = pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    f"x {shared} y",
                    f"p q {shared}",
                    "totally unrelated words here now",
                ],
            }
        )
        d = tmp_path / "dup"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        out = doc_dup_ngram_spans(str(d), w=5)
        assert shared in set(out["window"])
        row = out[out["window"] == shared].iloc[0]
        assert row["n_occ"] == 2 and row["n_docs"] == 2
        # windows occurring once never appear
        assert (out["n_occ"] >= 2).all()

    def test_within_doc_repeat_counts_occurrences(self, tmp_path):
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import doc_dup_ngram_spans

        docs = pa.table(
            {"doc_id": [0], "text": ["a b c d e a b c d e"]}
        )
        d = tmp_path / "dup2"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        out = doc_dup_ngram_spans(str(d), w=5)
        row = out[out["window"] == "a b c d e"].iloc[0]
        assert row["n_occ"] == 2 and row["n_docs"] == 1


class TestSplitAssign:
    def test_deterministic_and_roughly_80_10_10(self, sf_dir):
        from bioie_llm_ray.pipelines.analytics import doc_split_assign

        a = doc_split_assign(sf_dir)
        b = doc_split_assign(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        frac = a["split"].value_counts(normalize=True)
        assert 0.7 < frac["train"] < 0.9
        assert set(a["split"]) == {"train", "val", "test"}


class TestBloomFilter:
    def test_no_false_negatives_and_low_fpp(self):
        from bioie_llm_ray.functions.hashing import BloomFilter

        keys = np.arange(0, 20_000, 2)  # even ints
        bf = BloomFilter.build(keys, fpp=0.01)
        assert bf.contains_many(keys).all()
        probe = np.arange(1, 20_001, 2)  # odd ints, none inserted
        fp = bf.contains_many(probe).mean()
        assert fp < 0.03

    def test_string_keys_and_merge(self):
        from bioie_llm_ray.functions.hashing import BloomFilter

        a = BloomFilter.build([f"k{i}" for i in range(100)], m_bits=4096, k=5)
        b = BloomFilter.build([f"q{i}" for i in range(100)], m_bits=4096, k=5)
        m = a.merge(b)
        assert m.contains_many(["k3", "q7"]).all()

    def test_distributed_build_equals_local(self):
        from bioie_llm_ray.functions.hashing import BloomFilter
        from bioie_llm_ray.stages.join import build_bloom_distributed

        keys = np.arange(5000, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
        dist = build_bloom_distributed(ds, "k", m_bits=1 << 16, k=5)
        local = BloomFilter.build(keys, m_bits=1 << 16, k=5)
        assert (dist.words == local.words).all()

    def test_prefilter_keeps_all_matches(self):
        from bioie_llm_ray.stages.join import bloom_prefilter

        facts = ray.data.from_arrow(
            pa.table({"k": list(range(1000)), "v": list(range(1000))})
        )
        build_keys = np.arange(0, 1000, 10)
        out = bloom_prefilter(facts, build_keys, key="k").to_pandas()
        assert set(build_keys) <= set(out["k"])  # no false negatives
        assert len(out) < 1000  # actually filters


class TestSaltedShuffleJoin:
    def test_matches_pandas_with_planted_hub(self):
        from bioie_llm_ray.stages.join import salted_shuffle_join

        # hub key 7: 5,000 left rows; cold keys 0..99: a few rows each
        lk = [7] * 5000 + [i % 100 for i in range(400)]
        lv = list(range(len(lk)))
        rk = [7, 7, 3, 5]
        rv = ["hub_a", "hub_b", "three", "five"]
        left = ray.data.from_arrow(pa.table({"k": lk, "lv": lv}))
        right = ray.data.from_arrow(pa.table({"k": rk, "rv": rv}))
        out = salted_shuffle_join(
            left,
            right,
            keys="k",
            hot_keys={"7"},
            n_salt=4,
            n_buckets=8,
            left_schema={"k": pa.int64(), "lv": pa.int64()},
            right_schema={"k": pa.int64(), "rv": pa.string()},
        ).to_pandas()
        expected = (
            pd.DataFrame({"k": lk, "lv": lv})
            .merge(pd.DataFrame({"k": rk, "rv": rv}), on="k")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        got = out.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], expected)

    def test_left_outer_with_salting(self):
        from bioie_llm_ray.stages.join import salted_shuffle_join

        left = ray.data.from_arrow(
            pa.table({"k": [1] * 100 + [2, 3], "lv": list(range(102))})
        )
        right = ray.data.from_arrow(pa.table({"k": [1], "rv": [9]}))
        out = salted_shuffle_join(
            left,
            right,
            keys="k",
            hot_keys={"1"},
            n_salt=4,
            join_type="left outer",
            left_schema={"k": pa.int64(), "lv": pa.int64()},
            right_schema={"k": pa.int64(), "rv": pa.int64()},
        ).to_pandas()
        assert len(out) == 102
        assert out[out["k"] == 1]["rv"].notna().all()
        assert out[out["k"] != 1]["rv"].isna().all()

    def test_composes_with_heavy_hitters(self, sf_dir):
        """Detect hot order keys with the exact frequent-items sketch, then
        salt exactly those keys — the end-to-end skew recipe."""
        import os

        from bioie_llm_ray.stages.sketch import heavy_hitters

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
        )
        hot = heavy_hitters(li, "l_orderkey", theta=0.001)
        assert isinstance(hot, list)  # [(value, count)] — feed str(value)s in


class TestMetaBlocking:
    def test_purging_and_cbs_weighting(self, tmp_path):
        import pyarrow.parquet as pq

        from bioie_llm_ray.stages.blocking import token_blocking_pairs

        # docs 0,1 share two distinct 3-gram blocks; doc 2 shares only one
        # with doc 0; the "z z z ..." key floods >max_block_size docs and
        # must be purged before pair generation
        flood = " ".join(["z"] * 3)
        docs = pa.table(
            {
                "doc_id": list(range(14)),
                "text": [
                    f"alpha beta gamma delta {flood}",
                    f"alpha beta gamma delta {flood}",
                    f"alpha beta gamma zzz {flood}",
                ]
                + [f"unique{i} filler{i} pad{i} {flood}" for i in range(11)],
            }
        )
        d = tmp_path / "blk"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        ds = ray.data.read_parquet(str(d / "documents.parquet"))
        out = token_blocking_pairs(
            ds, max_block_size=5, min_common_blocks=2
        ).to_pandas()
        got = {(a, b): c for a, b, c in out.itertuples(index=False)}
        # docs 0/1 share every 3-gram of their identical text (>=2 -> kept)
        assert (0, 1) in got and got[(0, 1)] >= 2
        # docs 0/2 share 'alpha beta gamma' + 'beta gamma ...'? only
        # 'alpha beta gamma' -> below min_common_blocks, absent
        assert (0, 2) not in got
        # no pair may exist solely through the flooded key
        assert all(a < 3 and b < 3 for a, b in got)


class TestRollupAggregate:
    def test_matches_pandas_all_levels(self):
        from bioie_llm_ray.stages.rollup import rollup_aggregate

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "a": rng.choice(["x", "y", "z"], 200),
                "b": rng.choice(["p", "q"], 200),
                "v": rng.randint(0, 100, 200),
            }
        )
        out = rollup_aggregate(
            ray.data.from_pandas(df),
            keys=["a", "b"],
            aggs={
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            n_buckets=4,
            key_types={"a": pa.string(), "b": pa.string()},
        ).to_pandas()
        out[["a", "b"]] = out[["a", "b"]].fillna("ALL")
        out = out.sort_values(["a", "b"]).reset_index(drop=True)

        def agg(g):
            return pd.Series(
                {
                    "s": g["v"].sum(),
                    "n": len(g),
                    "lo": g["v"].min(),
                    "hi": g["v"].max(),
                }
            )

        fine = df.groupby(["a", "b"]).apply(agg, include_groups=False).reset_index()
        mid = df.groupby("a").apply(agg, include_groups=False).reset_index()
        mid["b"] = "ALL"
        top = agg(df).to_frame().T
        top["a"] = "ALL"
        top["b"] = "ALL"
        want = (
            pd.concat([fine, mid, top], ignore_index=True)[
                ["a", "b", "s", "n", "lo", "hi"]
            ]
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, want, check_dtype=False)

    def test_single_key_and_row_counts(self):
        from bioie_llm_ray.stages.rollup import rollup_aggregate

        df = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 4.0]})
        out = rollup_aggregate(
            ray.data.from_pandas(df),
            keys=["k"],
            aggs={"s": ("v", "sum")},
            n_buckets=2,
            key_types={"k": pa.string()},
        ).to_pandas()
        # 2 finest groups + 1 grand total
        assert len(out) == 3
        total = out[out["k"].isna()]
        assert total["s"].iloc[0] == 7.0


class TestPivotCounts:
    def test_matches_pandas_crosstab(self):
        from bioie_llm_ray.stages.rollup import pivot_counts

        rng = np.random.RandomState(19)
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 30, 500),
                "p": rng.choice(["a", "b", "c"], 500),
            }
        )
        got = (
            pivot_counts(
                ray.data.from_pandas(df).repartition(6),
                key_col="k",
                pivot_col="p",
                values=["a", "b", "c"],
                n_buckets=4,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            pd.crosstab(df["k"], df["p"])
            .reindex(columns=["a", "b", "c"], fill_value=0)
            .reset_index()
        )
        want.columns = ["k", "n_a", "n_b", "n_c"]
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_discovers_domain_and_zero_cells(self):
        from bioie_llm_ray.stages.rollup import pivot_counts

        df = pd.DataFrame({"k": [1, 1, 2], "p": ["x", "x", "y"]})
        got = (
            pivot_counts(ray.data.from_pandas(df), "k", "p", n_buckets=2)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"k": 1, "n_x": 2, "n_y": 0},
            {"k": 2, "n_x": 0, "n_y": 1},
        ]


class TestAutoJoin:
    def test_small_side_broadcasts_large_side_shuffles(self):
        from bioie_llm_ray.stages.join import auto_join

        left = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
        right = pd.DataFrame({"k": [2, 3], "w": [20, 30]})
        lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)

        out, plan = auto_join(lds, rds, keys="k")
        assert plan == "broadcast"
        got = out.to_pandas().sort_values("k").reset_index(drop=True)
        want = left.merge(right, on="k").sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        out2, plan2 = auto_join(lds, rds, keys="k", broadcast_bytes=1)
        assert plan2 == "shuffle"
        got2 = out2.to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got2[["k", "v", "w"]], want[["k", "v", "w"]], check_dtype=False
        )

    def test_bucket_post_forces_shuffle_plan(self):
        from bioie_llm_ray.stages.join import auto_join

        left = ray.data.from_pandas(pd.DataFrame({"k": [1, 1, 2]}))
        right = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "w": [5, 6]}))

        def rollup(t: pa.Table) -> pa.Table:
            return t.group_by("k").aggregate([("w", "count")]).rename_columns(
                ["k", "n"]
            )

        out, plan = auto_join(left, right, keys="k", bucket_post=rollup)
        assert plan == "shuffle"
        got = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert got.to_dict("records") == [{"k": 1, "n": 2}, {"k": 2, "n": 1}]


class TestUnpivot:
    def test_roundtrips_pivot(self):
        from bioie_llm_ray.stages.rollup import unpivot

        df = pd.DataFrame(
            {"k": [1, 2], "n_a": [3, 0], "n_b": [1, 5]}
        )
        got = (
            unpivot(
                ray.data.from_pandas(df),
                id_cols=["k"],
                value_cols=["n_a", "n_b"],
                var_name="cat",
                value_name="n",
            )
            .to_pandas()
            .sort_values(["k", "cat"])
            .reset_index(drop=True)
        )
        want = (
            df.melt(id_vars="k", var_name="cat", value_name="n")
            .sort_values(["k", "cat"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestSemiJoinScaleStress:
    def test_million_row_semi_join_counts(self):
        """>=1M left rows through shuffle_semi_join: the right side's key
        multiplicity collapses in the per-batch combiner, the exchange stays
        bucket-bounded, and semi+anti partition the left exactly."""
        from bioie_llm_ray.stages.join import shuffle_semi_join

        n_left, n_keys = 1_000_000, 50_000
        left = ray.data.range(n_left).map_batches(
            lambda b: pa.table({"k": pa.array(np.asarray(b["id"]) % n_keys)}),
            batch_format="numpy",
        )
        # right: even keys only, each repeated 8x (combiner must collapse)
        right = ray.data.range(n_keys * 4).map_batches(
            lambda b: pa.table(
                {"k": pa.array((np.asarray(b["id"]) % n_keys) // 2 * 2)}
            ),
            batch_format="numpy",
        )
        schema = {"k": pa.int64()}

        def count_bucket(kept: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([len(kept)], type=pa.int64())})

        n_semi = sum(
            r["n"]
            for r in shuffle_semi_join(
                left, right, keys="k", left_schema=schema,
                bucket_post=count_bucket,
            ).take_all()
        )
        n_anti = sum(
            r["n"]
            for r in shuffle_semi_join(
                left, right, keys="k", anti=True, left_schema=schema,
                bucket_post=count_bucket,
            ).take_all()
        )
        assert n_semi == n_left // 2  # even keys = half the rows
        assert n_semi + n_anti == n_left


class TestJoinRekeyTopkScaleStress:
    def test_million_row_fact_join_rekey_topk(self):
        """>=1M fact rows through the top_return_customers dataflow:
        fact ⋈ dim-fact shuffle join with a per-bucket re-key rollup, a
        second combiner exchange on the new key, and a per-block partial
        top-k whose driver merge sees <= 20 rows per block — nothing
        corpus-sized ever materializes.  Revenue per customer is
        analytic (custkey × 100), so the exact top-20 is checkable."""
        from bioie_llm_ray.stages.join import shuffle_join
        from bioie_llm_ray.stages.rollup import grouped_agg

        n_rows, n_orders, n_cust = 1_000_000, 100_000, 10_000
        fact = ray.data.range(n_rows).map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": pa.array(np.asarray(b["id"]) % n_orders),
                    "revenue": pa.array(
                        ((np.asarray(b["id"]) % n_orders) % n_cust).astype(
                            "float64"
                        )
                    ),
                }
            ),
            batch_format="numpy",
        )
        orders = ray.data.range(n_orders).map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": pa.array(np.asarray(b["id"])),
                    "o_custkey": pa.array(np.asarray(b["id"]) % n_cust),
                }
            ),
            batch_format="numpy",
        )

        def to_cust(joined: pa.Table) -> pa.Table:
            g = joined.group_by("o_custkey").aggregate([("revenue", "sum")])
            return g.rename_columns(["c_custkey", "revenue"])

        partials = shuffle_join(
            fact,
            orders,
            keys="o_orderkey",
            n_buckets=16,
            left_schema={"o_orderkey": pa.int64(), "revenue": pa.float64()},
            right_schema={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
            bucket_post=to_cust,
        )
        sums = grouped_agg(
            partials,
            keys=["c_custkey"],
            aggs={"revenue": ("revenue", "sum")},
            n_buckets=16,
            partial=True,
        )

        def block_topk(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas().sort_values(
                ["revenue", "c_custkey"], ascending=[False, True]
            ).head(20)
            return pa.Table.from_pandas(df, preserve_index=False)

        cand = sums.map_batches(block_topk, batch_format="pyarrow").to_pandas()
        top = cand.sort_values(
            ["revenue", "c_custkey"], ascending=[False, True]
        ).head(20)
        # each custkey c owns 10 orders x 10 rows, each row worth c
        assert list(top["c_custkey"]) == list(range(n_cust - 1, n_cust - 21, -1))
        assert all(
            top["revenue"].to_numpy()
            == top["c_custkey"].to_numpy().astype("float64") * 100.0
        )


class TestIncrementalHourly:
    def test_incremental_equals_full_recompute(self, sf_dir):
        """merge(state(t1), delta(t1, t2)) == full aggregate at t2 — the
        incremental-correctness contract of events_incremental_hourly."""
        import pandas as pd

        from bioie_llm_ray.pipelines.analytics import (
            events_incremental_hourly,
            hourly_counts_asof,
            _read,
        )

        inc = events_incremental_hourly(sf_dir)
        full = (
            hourly_counts_asof(
                _read(sf_dir, "events", columns=["user_id", "ts"]),
                pd.Timestamp("2099-01-01"),
            )
            .to_pandas()
            .sort_values(["user_id", "hour"])
            .reset_index(drop=True)
        )
        full["n_events"] = full["n_events"].astype("int64")
        pd.testing.assert_frame_equal(inc, full)


class TestGoldenRecords:
    def test_survivorship_rule(self, tmp_path):
        """Planted 3-member cluster: mode wins, ties break to smallest."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import er_golden_records

        # three near-identical texts (one cluster) + one unrelated doc
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 9], type=pa.int64()),
                "text": [
                    base,
                    base + " one",
                    base + " two",
                    "totally different words nothing shared here at all "
                    "xx yy zz ww vv uu tt ss",
                ],
                "lang": ["en", "en", "de", "fr"],      # mode -> en
                "source": ["s2", "s1", "s2", "s0"],    # mode -> s2
                "n_chars": pa.array([10, 30, 20, 5], type=pa.int64()),
            }
        )
        d = str(tmp_path)
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = er_golden_records(d, threshold=0.5)
        assert len(out) == 1
        row = out.iloc[0]
        assert int(row.component) == 0
        assert int(row.n_members) == 3
        assert row.lang == "en"
        assert row.source == "s2"
        assert int(row.max_chars) == 30

    def test_tie_breaks_to_smallest_value(self, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import er_golden_records

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": [base, base + " one"],
                "lang": ["fr", "de"],   # 1-1 tie -> 'de'
                "source": ["s9", "s3"],  # 1-1 tie -> 's3'
                "n_chars": pa.array([7, 8], type=pa.int64()),
            }
        )
        d = str(tmp_path)
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = er_golden_records(d, threshold=0.5)
        assert len(out) == 1
        assert out.iloc[0].lang == "de"
        assert out.iloc[0].source == "s3"


class TestSkylineScaleStress:
    def test_million_point_skyline_analytic(self):
        """>=1M points through skyline_2d with an analytic frontier:
        x = i, y = i % 1000 — the running max reaches 999 at x=999, so
        the frontier is exactly {(i, i) : i < 1000}.  Per-block frontiers
        bound what the final task sees; nothing corpus-sized reaches the
        driver."""
        from bioie_llm_ray.stages.rollup import skyline_2d

        n = 1_000_000
        pts = ray.data.range(n).map_batches(
            lambda b: pa.table(
                {
                    "x": pa.array(np.asarray(b["id"], dtype=np.float64)),
                    "y": pa.array(
                        (np.asarray(b["id"]) % 1000).astype(np.float64)
                    ),
                }
            ),
            batch_format="numpy",
        )
        out = (
            skyline_2d(pts, "x", "y")
            .to_pandas()
            .sort_values("x")
            .reset_index(drop=True)
        )
        assert len(out) == 1000
        np.testing.assert_array_equal(
            out["x"].to_numpy(), np.arange(1000, dtype=np.float64)
        )
        np.testing.assert_array_equal(out["x"].to_numpy(), out["y"].to_numpy())


class TestArgminJoinScaleStress:
    def test_million_row_groupwise_argmin(self):
        """>=1M fact rows through the q2 dataflow (partial-min combiner →
        keyed min → rejoin-on-extremum with in-bucket tie-break): part p's
        min price 0.0 is attained only at row i=p, whose supplier is
        p % 97 — exact analytic check of every winner."""
        from ray.data.aggregate import Min

        from bioie_llm_ray.stages.join import shuffle_join

        n_rows, n_parts = 1_000_000, 10_000
        fact = ray.data.range(n_rows).map_batches(
            lambda b: pa.table(
                {
                    "part": pa.array(np.asarray(b["id"]) % n_parts),
                    "supp": pa.array(np.asarray(b["id"]) % 97),
                    "price": pa.array(
                        (np.asarray(b["id"]) // n_parts).astype(np.float64)
                    ),
                }
            ),
            batch_format="numpy",
        )

        def partial_min(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("part", as_index=False)["price"].min()
            return pa.table(
                {
                    "part": pa.array(g["part"], type=pa.int64()),
                    "min_price": pa.array(g["price"], type=pa.float64()),
                }
            )

        mins = (
            fact.map_batches(partial_min, batch_format="pyarrow")
            .groupby("part")
            .aggregate(Min("min_price", alias_name="min_price"))
        )

        def argmin_rollup(joined: pa.Table) -> pa.Table:
            df = joined.to_pandas()
            df = df[df["price"] == df["min_price"]]
            g = df.groupby("part", as_index=False).agg(supp=("supp", "min"))
            return pa.table(
                {
                    "part": pa.array(g["part"], type=pa.int64()),
                    "supp": pa.array(g["supp"], type=pa.int64()),
                }
            )

        winners = (
            shuffle_join(
                fact,
                mins,
                keys="part",
                left_schema={
                    "part": pa.int64(),
                    "supp": pa.int64(),
                    "price": pa.float64(),
                },
                right_schema={"part": pa.int64(), "min_price": pa.float64()},
                bucket_post=argmin_rollup,
            )
            .to_pandas()
            .sort_values("part")
            .reset_index(drop=True)
        )
        assert len(winners) == n_parts
        np.testing.assert_array_equal(
            winners["supp"].to_numpy(), np.arange(n_parts) % 97
        )


class TestSkylineRandomized:
    def test_matches_quadratic_dominance_filter(self):
        """skyline_2d vs the O(n²) dominance definition on random clouds,
        across different block counts (partition invariance)."""
        from bioie_llm_ray.stages.rollup import skyline_2d

        for seed in range(5):
            rng = np.random.RandomState(seed)
            n = 400
            x = rng.randint(0, 60, n).astype(np.float64)
            y = rng.randint(0, 60, n).astype(np.float64)
            # quadratic reference on distinct (x, y) pairs
            pts = sorted(set(zip(x, y)))
            expect = sorted(
                (a, b)
                for a, b in pts
                if not any(
                    (c <= a and d >= b and (c < a or d > b)) for c, d in pts
                )
            )
            for n_blocks in (1, 7):
                ds = ray.data.from_arrow(
                    pa.table({"x": x, "y": y})
                ).repartition(n_blocks)
                out = skyline_2d(ds, "x", "y").to_pandas()
                got = sorted(zip(out["x"], out["y"]))
                assert got == expect, (seed, n_blocks)


class TestAttributionSerialReference:
    def test_matches_pandas_serial_walk(self, tmp_path):
        """purchase_attribution vs a serial per-user walk: for every
        purchase, scan that user's touches for the latest one <= ts and
        apply the 7-day gate."""
        import os

        from bioie_llm_ray.pipelines.analytics import purchase_attribution

        rng = np.random.RandomState(7)
        n = 4000
        base = pd.Timestamp("2024-01-01")
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 40, n).astype(np.int64),
                "ts": base
                + pd.to_timedelta(
                    rng.randint(0, 30 * 24 * 3600, n), unit="s"
                ),
                "event_type": rng.choice(
                    ["purchase", "click", "view", "error"], n
                ),
                "value": np.round(rng.uniform(0, 50, n), 2),
                "props": ["{}"] * n,
            }
        )
        sf = tmp_path / "sf"
        os.makedirs(sf)
        pa.parquet.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(sf / "events.parquet"),
        )

        got = purchase_attribution(str(sf))

        touches = df[df["event_type"].isin(["click", "view"])]
        rows = []
        for _, p in df[df["event_type"] == "purchase"].iterrows():
            t = touches[
                (touches["user_id"] == p["user_id"])
                & (touches["ts"] <= p["ts"])
            ]
            if len(t):
                last = t.sort_values(["ts", "event_type"]).iloc[-1]
                ch = (
                    last["event_type"]
                    if (p["ts"] - last["ts"]) <= pd.Timedelta(days=7)
                    else "direct"
                )
            else:
                ch = "direct"
            rows.append((ch, int(np.round(p["value"] * 100))))
        ref = (
            pd.DataFrame(rows, columns=["channel", "cents"])
            .groupby("channel", as_index=False)
            .agg(n_purchases=("cents", "size"), cents=("cents", "sum"))
        )
        ref["total_value"] = ref["cents"] / 100.0
        ref = (
            ref.drop(columns="cents")
            .sort_values("channel")
            .reset_index(drop=True)
        )
        ref["n_purchases"] = ref["n_purchases"].astype(np.int64)
        got2 = got[got["n_purchases"] > 0].reset_index(drop=True)
        pd.testing.assert_frame_equal(got2, ref)


class TestIvfStoreScaleStress:
    def test_store_path_equals_inmemory_at_200k(self, tmp_path):
        """200k vectors through build_ivf_store + ivf_store_topk: the
        persisted partition-pruned search returns EXACTLY what the
        in-memory probed path returns on the same corpus (same quantizer,
        probes, tie-breaks), and only the probed partitions are read."""
        from bioie_llm_ray.state.ivf_store import build_ivf_store, ivf_store_topk
        from bioie_llm_ray.stages.similarity import ivf_probed_topk

        n, dim = 200_000, 16

        def gen(batch):
            ids = np.asarray(batch["id"], dtype=np.int64)
            # deterministic pseudo-embeddings: 8 coarse directions + noise
            base = np.zeros((len(ids), dim))
            base[np.arange(len(ids)), ids % 8] = 1.0
            noise = np.stack(
                [np.sin(ids * (j + 1) * 0.001) for j in range(dim)], axis=1
            )
            emb = base + 0.05 * noise
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.array(
                        list(emb.astype(np.float32)),
                        type=pa.list_(pa.float32()),
                    ),
                }
            )

        ds = ray.data.range(n).map_batches(gen, batch_format="numpy")
        store = str(tmp_path / "ivf")
        build_ivf_store(ds, store, n_centroids=8, n_iters=2)

        qds = ds.filter(expr="vec_id < 5").take_all()
        qrows = sorted(qds, key=lambda r: r["vec_id"])
        queries = np.stack([np.asarray(r["embedding"]) for r in qrows])
        qids = [r["vec_id"] for r in qrows]

        got = (
            ivf_store_topk(store, queries, qids, k=5, n_probe=2)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = (
            ivf_probed_topk(
                ds, queries, qids, k=5, n_centroids=8, n_probe=2, n_iters=2
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        # pruning is real: fewer list dirs were probed than exist
        import os

        n_lists = sum(
            1 for d in os.listdir(store) if d.startswith("list=")
        )
        assert n_lists == 8


class TestAttributionScaleStress:
    def test_million_event_attribution_analytic(self, tmp_path):
        """1M events through purchase_attribution with an analytic answer:
        55k users sign-shaped — even users click, odd users view, each
        purchases exactly 1h later (inside the 7-day window); 5k users
        purchase with no touch (direct); 890k filler error events inflate
        the stream.  The as-of machinery must produce exactly the
        constructed split with nothing corpus-sized on the driver."""
        import os

        from bioie_llm_ray.pipelines.analytics import purchase_attribution

        n_users, n_fill = 50_000, 890_000
        base = np.int64(pd.Timestamp("2024-01-01").value // 1000)
        rows = []
        # touched users: touch at base+u s, purchase 1h later
        u = np.arange(n_users, dtype=np.int64)
        touch_ts = base + u * 1_000_000
        parts = [
            pd.DataFrame(
                {
                    "user_id": u,
                    "ts": touch_ts,
                    "event_type": np.where(u % 2 == 0, "click", "view"),
                    "value": 0.0,
                }
            ),
            pd.DataFrame(
                {
                    "user_id": u,
                    "ts": touch_ts + 3_600_000_000,
                    "event_type": "purchase",
                    "value": 1.0,
                }
            ),
        ]
        # 5k untouched purchasers
        u2 = np.arange(n_users, n_users + 5_000, dtype=np.int64)
        parts.append(
            pd.DataFrame(
                {
                    "user_id": u2,
                    "ts": base + u2 * 1_000_000,
                    "event_type": "purchase",
                    "value": 1.0,
                }
            )
        )
        # filler noise the pipeline must stream past
        rng = np.random.RandomState(3)
        parts.append(
            pd.DataFrame(
                {
                    "user_id": rng.randint(0, n_users, n_fill).astype(np.int64),
                    "ts": base + rng.randint(0, 10**9, n_fill).astype(np.int64),
                    "event_type": "error",
                    "value": 0.0,
                }
            )
        )
        df = pd.concat(parts, ignore_index=True)
        df["ts"] = df["ts"].to_numpy().astype("datetime64[us]")
        df["event_id"] = np.arange(len(df), dtype=np.int64)
        df["props"] = "{}"
        sf = tmp_path / "sf"
        os.makedirs(sf)
        pa.parquet.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(sf / "events.parquet"),
        )

        out = purchase_attribution(str(sf)).set_index("channel")
        assert int(out.loc["click", "n_purchases"]) == n_users // 2
        assert int(out.loc["view", "n_purchases"]) == n_users // 2
        assert int(out.loc["direct", "n_purchases"]) == 5_000
        assert float(out.loc["click", "total_value"]) == n_users // 2


class TestCrossDupSpansScaleStress:
    def test_planted_duplicate_blocks_50k_docs(self, tmp_path):
        """50k docs (~1.4M windows) with one planted 8-token shared block
        per doc (100 distinct blocks, 500 docs each): every doc must emit
        exactly one maximal span covering the block's 4 interior 5-gram
        positions — analytic expectation, no serial reference needed."""
        from bioie_llm_ray.pipelines.analytics import doc_cross_dup_spans

        n_docs, n_blocks = 50_000, 100
        texts, ids = [], []
        for i in range(n_docs):
            b = i % n_blocks
            pre = " ".join(f"u{i}x{t}" for t in range(10))
            blk = " ".join(f"s{b}y{t}" for t in range(8))
            suf = " ".join(f"v{i}x{t}" for t in range(10))
            texts.append(f"{pre} {blk} {suf}")
            ids.append(i)
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = doc_cross_dup_spans(str(tmp_path))
        assert len(out) == n_docs
        assert (out["span_start"] == 10).all()
        assert (out["span_end"] == 18).all()
        assert (out["n_windows"] == 4).all()
        assert out["doc_id"].is_unique

    def test_no_shared_windows_is_empty(self, tmp_path):
        from bioie_llm_ray.pipelines.analytics import doc_cross_dup_spans

        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(
                        [
                            "a b c d e f g h",
                            "p q r s t u v w",
                        ]
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = doc_cross_dup_spans(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == [
            "doc_id",
            "span_start",
            "span_end",
            "n_windows",
        ]


class TestBlbSanity:
    def test_ci_brackets_true_mean(self, sf_dir):
        """The averaged per-bag bootstrap interval must bracket the plain
        corpus mean (the estimator BLB approximates the sampling
        distribution of)."""
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import value_mean_blb

        out = value_mean_blb(sf_dir)
        true_mean = (
            pq.read_table(f"{sf_dir}/events.parquet", columns=["value"])
            .to_pandas()["value"]
            .mean()
        )
        assert out["ci_lo"][0] <= true_mean <= out["ci_hi"][0]
        assert out["ci_width"][0] > 0


class TestLshStoreScaleStress:
    def test_store_path_equals_scan_at_200k(self, tmp_path):
        """200k vectors through build_lsh_store + lsh_store_topk: the
        persisted per-band hash tables return EXACTLY what the scan-side
        lsh_topk returns on the same corpus."""
        from bioie_llm_ray.stages.similarity import lsh_topk
        from bioie_llm_ray.state.lsh_store import (
            build_lsh_store,
            lsh_store_topk,
        )

        n, dim = 200_000, 16

        def gen(batch):
            ids = np.asarray(batch["id"], dtype=np.int64)
            base = np.zeros((len(ids), dim))
            base[np.arange(len(ids)), ids % 8] = 1.0
            noise = np.stack(
                [np.sin(ids * (j + 1) * 0.001) for j in range(dim)], axis=1
            )
            emb = base + 0.05 * noise
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.array(
                        list(emb.astype(np.float32)),
                        type=pa.list_(pa.float32()),
                    ),
                }
            )

        ds = ray.data.range(n).map_batches(gen, batch_format="numpy")
        store = str(tmp_path / "lsh")
        build_lsh_store(ds, store)

        qrows = sorted(
            ds.filter(expr="vec_id < 4").take_all(),
            key=lambda r: r["vec_id"],
        )
        queries = np.stack([np.asarray(r["embedding"]) for r in qrows])
        qids = [r["vec_id"] for r in qrows]

        got = (
            lsh_store_topk(store, queries, qids, k=5)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = (
            lsh_topk(ds, queries, qids, k=5)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


class TestERPurgedCorpus:
    """A corpus whose duplication pushes every blocking key past
    max_block_size purges ALL candidate pairs — the ER chain must return
    a TYPED empty result, not a schema-less frame that KeyErrors
    (regression: found by the sf1-equivalent sweep, where 10× exact
    duplication purged every block)."""

    def _docs(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        text = "alpha beta gamma delta epsilon zeta"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(12), type=pa.int64()),
                    "text": pa.array([text] * 12),
                    "lang": pa.array(["en"] * 12),
                    "source": pa.array(["web"] * 12),
                    "n_chars": pa.array([len(text)] * 12, type=pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        return str(tmp_path)

    def test_er_entity_clusters_typed_empty(self, tmp_path):
        from bioie_llm_ray.pipelines.analytics import er_entity_clusters

        out = er_entity_clusters(self._docs(tmp_path))
        assert list(out.columns) == ["node", "component"]
        assert len(out) == 0 and str(out["node"].dtype) == "int64"

    def test_er_golden_records_typed_empty(self, tmp_path):
        from bioie_llm_ray.pipelines.analytics import er_golden_records

        out = er_golden_records(self._docs(tmp_path))
        assert list(out.columns) == [
            "component", "n_members", "lang", "source", "max_chars",
        ]
        assert len(out) == 0
