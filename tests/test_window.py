"""Windowed / per-group ranking operators (stages/window.py)."""

import numpy as np
import pandas as pd
import ray

from bioie_llm_ray.stages.window import grouped_top_k, sliding_window_counts


class TestGroupedTopK:
    def test_matches_pandas_rank(self):
        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "g": rng.randint(0, 40, 2000),
                "id": np.arange(2000),
                "v": rng.randn(2000).round(6),
            }
        )
        got = (
            grouped_top_k(
                ray.data.from_pandas(df),
                group_cols="g",
                order_col="v",
                k=3,
                tie_cols=["id"],
            )
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        want = want.groupby("g", sort=True).head(3).copy()
        want["rank"] = want.groupby("g").cumcount() + 1
        want = want.sort_values(["g", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["g", "id", "v", "rank"]].astype({"rank": "int64"}),
            want[["g", "id", "v", "rank"]].astype({"rank": "int64"}),
        )

    def test_exact_duplicate_values_tie_break(self):
        df = pd.DataFrame(
            {"g": [1] * 4, "id": [4, 3, 2, 1], "v": [5.0, 5.0, 5.0, 1.0]}
        )
        got = (
            grouped_top_k(
                ray.data.from_pandas(df), "g", "v", k=2, tie_cols=["id"]
            )
            .to_pandas()
            .sort_values("rank")
        )
        assert got["id"].tolist() == [2, 3]  # smallest ids win equal values


class TestSessionize:
    def test_spans_consistent_with_session_counts(self):
        from bioie_llm_ray.stages.window import sessionize

        rng = np.random.RandomState(17)
        base = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 15, 2000),
                "ts": base
                + pd.to_timedelta(rng.randint(0, 48 * 60, 2000), unit="m"),
            }
        )
        got = sessionize(
            ray.data.from_pandas(df), "user_id", "ts", gap_minutes=30
        ).to_pandas()

        # pandas reference: per-user gap breaks
        def ref(sub):
            ts = sub["ts"].sort_values()
            brk = (ts.diff() > pd.Timedelta(minutes=30)).cumsum()
            g = ts.groupby(brk)
            return pd.DataFrame(
                {
                    "session_idx": np.arange(1, g.ngroups + 1),
                    "start_ts": g.min().values,
                    "end_ts": g.max().values,
                    "n_events": g.size().values,
                }
            )

        for uid, sub in df.groupby("user_id"):
            want = ref(sub)
            mine = (
                got[got.user_id == uid]
                .sort_values("session_idx")
                .reset_index(drop=True)
            )
            assert len(mine) == len(want), uid
            assert (mine["n_events"].values == want["n_events"].values).all()
            assert (mine["start_ts"].values == want["start_ts"].values).all()
            assert (mine["end_ts"].values == want["end_ts"].values).all()
        # spans partition the events exactly
        assert int(got["n_events"].sum()) == len(df)


class TestSlidingWindow:
    def test_matches_pandas_window(self):
        rng = np.random.RandomState(13)
        base = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 20, 3000),
                "ts": base
                + pd.to_timedelta(rng.randint(0, 72 * 60, 3000), unit="m"),
            }
        )
        got = (
            sliding_window_counts(
                ray.data.from_pandas(df), "user_id", "ts", n_units=3
            )
            .to_pandas()
            .sort_values(["user_id", "bucket_ts"])
            .reset_index(drop=True)
        )
        h = (
            df.assign(bucket_ts=df["ts"].dt.floor("h"))
            .groupby(["user_id", "bucket_ts"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

        def win(sub):
            sub = sub.sort_values("bucket_ts").set_index("bucket_ts")
            w = sub["n"].rolling("3h").sum().astype("int64")
            return sub.assign(n_3h=w).reset_index()

        want = (
            h.groupby("user_id", group_keys=False)[h.columns]
            .apply(win)
            .sort_values(["user_id", "bucket_ts"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["user_id", "bucket_ts", "n", "n_3h"]],
            want[["user_id", "bucket_ts", "n", "n_3h"]],
            check_dtype=False,
        )

    def test_partial_counts_combine_across_blocks(self):
        """The same (user, hour) arriving in many input blocks must merge."""
        base = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {"user_id": [1] * 100, "ts": [base] * 100}
        )
        out = sliding_window_counts(
            ray.data.from_pandas(df).repartition(10), "user_id", "ts"
        ).to_pandas()
        assert len(out) == 1
        assert out["n"].iloc[0] == 100 and out["n_3h"].iloc[0] == 100


class TestFunnelCounts:
    def test_hand_computed_chain(self):
        from bioie_llm_ray.stages.window import funnel_counts

        rows = [
            # u1 converts all 3 steps in order
            (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
            # u2: click BEFORE first view → not a step-2 conversion;
            # later purchase without a qualifying click → stops at view
            (2, 15, "click"), (2, 20, "view"), (2, 25, "purchase"),
            # u3: view then purchase, no click → stops at view
            (3, 5, "view"), (3, 50, "purchase"),
            # u4: equal timestamps are NOT strictly after → stops at view
            (4, 7, "view"), (4, 7, "click"),
            # u5: never views → counted nowhere (purchase alone)
            (5, 1, "purchase"),
            # u6: two chains; earliest-qualifying picks view@2→click@3→purchase@4
            (6, 2, "view"), (6, 3, "click"), (6, 4, "purchase"), (6, 1, "click"),
        ]
        ds = ray.data.from_items(
            [{"user_id": u, "ts": t, "event_type": e} for u, t, e in rows]
        )
        out = funnel_counts(
            ds, steps=["view", "click", "purchase"], n_buckets=4
        )
        assert out.to_dict("records") == [
            {"step": 1, "event_type": "view", "n_users": 5},
            {"step": 2, "event_type": "click", "n_users": 2},
            {"step": 3, "event_type": "purchase", "n_users": 2},
        ]


class TestPeakConcurrency:
    def test_planted_intervals(self, tmp_path):
        """3 users overlapping at one instant; touching counts as 2."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import peak_concurrency

        def ts(minute):
            return pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=minute)

        # u1: [0, 10]; u2: [5, 15]; u3: [8, 9]  -> peak 3 at t=8..9
        # u4: [100, 110]; u5 starts exactly at u4's end -> concurrent (2)
        rows = [
            (1, ts(0)), (1, ts(10)),
            (2, ts(5)), (2, ts(15)),
            (3, ts(8)), (3, ts(9)),
            (4, ts(100)), (4, ts(110)),
            (5, ts(110)), (5, ts(120)),
        ]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows],
                               type=pa.timestamp("us")),
            }
        )
        d = str(tmp_path)
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = peak_concurrency(d)
        assert int(out.peak_concurrency[0]) == 3
        assert int(out.n_sessions[0]) == 5


class TestGroupedRanks:
    def test_matches_pandas_with_ties(self):
        from bioie_llm_ray.stages.window import grouped_ranks

        rng = np.random.RandomState(15)
        n = 1200
        df = pd.DataFrame(
            {
                "g": rng.randint(0, 40, n),
                "v": rng.randint(0, 8, n),
                "id": np.arange(n, dtype=np.int64),
            }
        )
        ds = ray.data.from_pandas(
            df.sample(frac=1.0, random_state=1)
        ).repartition(7)
        out = (
            grouped_ranks(ds, "g", "v", tiebreak=["id"], n_buckets=8)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        exp = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        exp["row_number"] = exp.groupby("g").cumcount() + 1
        exp["rank"] = (
            df.groupby("g")["v"].rank(method="min", ascending=False)
            .astype("int64")
        )
        exp["dense_rank"] = (
            df.groupby("g")["v"].rank(method="dense", ascending=False)
            .astype("int64")
        )
        exp = exp.sort_values("id").reset_index(drop=True)
        for c in ("row_number", "rank", "dense_rank"):
            assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c

    def test_ascending_order(self):
        from bioie_llm_ray.stages.window import grouped_ranks

        df = pd.DataFrame(
            {"g": ["a", "a", "b"], "v": [5, 3, 9],
             "id": np.arange(3, dtype=np.int64)}
        )
        out = (
            grouped_ranks(
                ray.data.from_pandas(df), "g", "v",
                tiebreak=["id"], descending=False, n_buckets=4,
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert out["rank"].tolist() == [2, 1, 1]


class TestRangeWindow:
    def test_peer_inclusive_interval_frame(self, tmp_path):
        """RANGE frame includes equal-ts FOLLOWERS (peers) — the semantics
        pandas rolling('1h') cannot express — and never crosses users."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import user_range_window

        base = pd.Timestamp("2024-03-01 12:00:00")
        rows = [
            # user 1: three rows at the SAME ts (peers), one 30 min later,
            # one 2 h later (outside the 1 h frame of the first cluster)
            (1, 1, base, 1.0),
            (2, 1, base, 2.0),
            (3, 1, base, 4.0),
            (4, 1, base + pd.Timedelta("30min"), 8.0),
            (5, 1, base + pd.Timedelta("2h"), 16.0),
            # user 2: same timestamps — frames must not leak across users
            (6, 2, base, 100.0),
            (7, 2, base + pd.Timedelta("59min"), 200.0),
            (8, 2, base + pd.Timedelta("60min"), 400.0),  # exactly 1 h: in
        ]
        df = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        got = user_range_window(str(tmp_path))
        # peers: each of events 1-3 sees all three (sum 7)
        assert got.set_index("event_id")["range_sum"].loc[[1, 2, 3]].tolist() == [
            7.0,
            7.0,
            7.0,
        ]
        assert got.set_index("event_id")["n_in_range"].loc[5] == 1  # 2 h gap
        # exactly-1h-preceding row is INSIDE the closed frame
        assert got.set_index("event_id")["range_sum"].loc[8] == 700.0
        con = duckdb.connect()
        con.register("events", df)
        want = con.sql(
            """
            SELECT event_id, user_id,
                   round_even(sum(value) OVER w, 4) AS range_sum,
                   count(*) OVER w AS n_in_range
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                   AND CURRENT ROW)
            ORDER BY event_id
            """
        ).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


class TestLateArrivals:
    def test_planted_late_events(self, tmp_path):
        """Watermark = running event-time max over arrival order; an event
        is late when its event-time is > 10 min behind it."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines.analytics import events_late_arrivals

        base = pd.Timestamp("2024-02-01 00:00:00")
        m = pd.Timedelta("1min")
        rows = [
            # arrival order = event_id; watermark rises to base+30min,
            # then two stragglers arrive far behind it
            (0, base, "view"),
            (1, base + 30 * m, "view"),
            (2, base + 5 * m, "click"),   # 25 min late -> 15 min past wm
            (3, base + 29 * m, "click"),  # within allowed lateness
            (4, base + 31 * m, "view"),
            (5, base + 10 * m, "error"),  # 21 min behind wm, 11 past cutoff
        ]
        df = pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        got = events_late_arrivals(str(tmp_path), n_buckets=3)
        by = got.set_index("event_type")
        assert by.loc["click", "n_late"] == 1
        assert by.loc["click", "max_lateness_s"] == 15 * 60
        assert by.loc["error", "n_late"] == 1
        assert by.loc["error", "max_lateness_s"] == 11 * 60
        assert by.loc["view", "n_late"] == 0
        con = duckdb.connect()
        con.register("events", df)
        import __ray_entry__ as entrymod

        want = con.sql(entrymod.oracle_sql()["events_late_arrivals"]).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


class TestRangeWindowChunking:
    def test_multi_chunk_path_matches_single_chunk(self, tmp_path, monkeypatch):
        """Shrinking the per-chunk segment budget forces every user into
        its own searchsorted chunk; results must be identical to the
        single-chunk fast path (the int64-overflow guard is pure
        partitioning, never semantics)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines import analytics

        rng = np.random.RandomState(7)
        base = pd.Timestamp("2024-04-01").value // 1000
        n = 400
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 12, n).astype(np.int64),
                "ts": pd.to_datetime(
                    base + rng.randint(0, 3 * 3600 * 1_000_000, n), unit="us"
                ),
                "value": rng.randn(n).round(3),
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        fast = analytics.user_range_window(str(tmp_path))
        monkeypatch.setattr(analytics, "_RANGE_SEG_CHUNK", 1.0)
        chunked = analytics.user_range_window(str(tmp_path))
        pd.testing.assert_frame_equal(fast, chunked)


class TestStreamStreamJoin:
    def test_chunked_band_join_matches_fast_path(self, tmp_path, monkeypatch):
        """Forcing one searchsorted chunk per user must not change the
        (error, click) pair counts."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bioie_llm_ray.pipelines import analytics

        rng = np.random.RandomState(3)
        base = pd.Timestamp("2024-05-01").value // 1000
        n = 300
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 8, n).astype(np.int64),
                "ts": pd.to_datetime(
                    base + rng.randint(0, 2 * 3600 * 1_000_000, n), unit="us"
                ),
                "event_type": rng.choice(["error", "click", "view"], n),
                "value": np.zeros(n),
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        fast = analytics.error_click_correlation(str(tmp_path))
        monkeypatch.setattr(analytics, "_RANGE_SEG_CHUNK", 1.0)
        chunked = analytics.error_click_correlation(str(tmp_path))
        pd.testing.assert_frame_equal(fast, chunked)
        assert fast["n_pairs"].sum() > 0  # dense hours correlate
