"""Distributed ordered prefix sum + sequence packing (stages/scan.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from bioie_llm_ray.stages.scan import ordered_prefix_sum, pack_sequences


def _ds(df: pd.DataFrame, parts: int) -> ray.data.Dataset:
    from bioie_llm_ray.functions.arrowio import from_pandas_clean

    # shuffle row order so correctness can't ride on input ordering
    shuffled = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    return ray.data.from_arrow(from_pandas_clean(shuffled)).repartition(parts)


class TestOrderedPrefixSum:
    def test_matches_pandas_cumsum(self):
        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {"k": np.arange(1000, dtype=np.int64),
             "v": rng.randint(0, 50, 1000).astype(np.int64)}
        )
        out = (
            ordered_prefix_sum(_ds(df, 7), "k", "v", out_col="c", n_buckets=16)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = df["v"].cumsum().to_numpy()
        assert (out["c"].to_numpy() == want).all()
        assert (out["k"].to_numpy() == df["k"].to_numpy()).all()

    def test_partition_invariant(self):
        rng = np.random.RandomState(9)
        df = pd.DataFrame(
            {"k": np.arange(300, dtype=np.int64),
             "v": rng.randint(0, 9, 300).astype(np.int64)}
        )
        a = (
            ordered_prefix_sum(_ds(df, 2), "k", "v", n_buckets=8)
            .to_pandas().sort_values("k")["cumsum"].to_numpy()
        )
        b = (
            ordered_prefix_sum(_ds(df, 11), "k", "v", n_buckets=32)
            .to_pandas().sort_values("k")["cumsum"].to_numpy()
        )
        assert (a == b).all()

    def test_sparse_negative_domain(self):
        # non-contiguous, negative order keys — range bucketing must not
        # assume density or non-negativity
        ks = np.array([-500, -3, 0, 7, 9999, 100000], dtype=np.int64)
        df = pd.DataFrame({"k": ks, "v": np.ones(len(ks), dtype=np.int64)})
        out = (
            ordered_prefix_sum(_ds(df, 3), "k", "v", n_buckets=4)
            .to_pandas().sort_values("k")
        )
        assert (out["cumsum"].to_numpy() == np.arange(1, len(ks) + 1)).all()

    def test_static_domain_skips_probe(self):
        df = pd.DataFrame(
            {"k": np.arange(50, dtype=np.int64),
             "v": np.full(50, 2, dtype=np.int64)}
        )
        out = (
            ordered_prefix_sum(
                _ds(df, 4), "k", "v", n_buckets=8, order_min=0, order_max=49
            )
            .to_pandas().sort_values("k")
        )
        assert (out["cumsum"].to_numpy() == np.arange(1, 51) * 2).all()


class TestPackSequences:
    def test_spans_and_straddle(self):
        # doc 0: 10 tokens → block 0; doc 1: 250 → straddles 0..1 (size 256);
        # doc 2: 0 tokens → empty-doc convention; doc 3: 300 → 1..2
        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "n_tokens": np.array([10, 250, 0, 300], dtype=np.int64),
            }
        )
        out = (
            pack_sequences(_ds(df, 2), block_size=256, n_buckets=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["token_start"].tolist() == [0, 10, 260, 260]
        assert out["block_first"].tolist() == [0, 0, 1, 1]
        assert out["block_last"].tolist() == [0, 1, 1, 2]

    def test_total_tokens_conserved(self):
        rng = np.random.RandomState(1)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(200, dtype=np.int64),
                "n_tokens": rng.randint(0, 400, 200).astype(np.int64),
            }
        )
        out = (
            pack_sequences(_ds(df, 5), block_size=128)
            .to_pandas().sort_values("doc_id")
        )
        ends = out["token_start"] + out["n_tokens"]
        # spans tile [0, total) with no gaps or overlaps
        assert out["token_start"].iloc[0] == 0
        assert (out["token_start"].to_numpy()[1:] == ends.to_numpy()[:-1]).all()
        assert ends.iloc[-1] == df["n_tokens"].sum()


class TestGlobalOrderRanks:
    """row_number / rank / dense_rank / ntile vs pandas ground truth."""

    @staticmethod
    def _expected(df: pd.DataFrame, key: str, tie: str, n_tile: int):
        e = df.sort_values([key, tie]).reset_index(drop=True)
        n = len(e)
        e["row_number"] = np.arange(1, n + 1, dtype=np.int64)
        e["rank"] = e[key].rank(method="min").astype("int64")
        e["dense_rank"] = e[key].rank(method="dense").astype("int64")
        q, r = divmod(n, n_tile)
        rn = e["row_number"].to_numpy()
        cut = r * (q + 1)
        e["ntile"] = np.where(
            rn <= cut,
            (rn - 1) // (q + 1) + 1,
            r + (rn - 1 - cut) // max(q, 1) + 1,
        )
        return e.sort_values(tie).reset_index(drop=True)

    def test_matches_pandas_with_ties(self):
        from bioie_llm_ray.stages.scan import global_order_ranks

        rng = np.random.RandomState(7)
        n = 3000
        df = pd.DataFrame(
            {"k": rng.randint(0, 200, n), "id": np.arange(n, dtype=np.int64)}
        )
        out = (
            global_order_ranks(
                _ds(df, 9), "k", tiebreak=["id"], n_buckets=16, ntile=7
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        exp = self._expected(df, "k", "id", 7)
        for c in ("row_number", "rank", "dense_rank", "ntile"):
            assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c

    def test_partition_and_bucket_invariant(self):
        from bioie_llm_ray.stages.scan import global_order_ranks

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {"k": rng.randint(0, 40, 500), "id": np.arange(500, dtype=np.int64)}
        )
        a = (
            global_order_ranks(_ds(df, 2), "k", tiebreak=["id"], n_buckets=4)
            .to_pandas().sort_values("id")["rank"].to_numpy()
        )
        b = (
            global_order_ranks(_ds(df, 13), "k", tiebreak=["id"], n_buckets=32)
            .to_pandas().sort_values("id")["rank"].to_numpy()
        )
        assert (a == b).all()

    def test_string_keys(self):
        from bioie_llm_ray.stages.scan import global_order_ranks

        rng = np.random.RandomState(13)
        df = pd.DataFrame(
            {
                "s": rng.choice(list("zyxwvuts"), 400),
                "id": np.arange(400, dtype=np.int64),
            }
        )
        out = (
            global_order_ranks(_ds(df, 5), "s", tiebreak=["id"], n_buckets=8)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        exp = self._expected(df, "s", "id", 4)
        for c in ("row_number", "rank", "dense_rank"):
            assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c

    def test_constant_key_degenerates_to_ties(self):
        from bioie_llm_ray.stages.scan import global_order_ranks

        df = pd.DataFrame(
            {"k": np.zeros(100, dtype=np.int64),
             "id": np.arange(100, dtype=np.int64)}
        )
        out = (
            global_order_ranks(_ds(df, 3), "k", tiebreak=["id"], n_buckets=8)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert (out["rank"].to_numpy() == 1).all()
        assert (out["dense_rank"].to_numpy() == 1).all()
        assert sorted(out["row_number"]) == list(range(1, 101))

    def test_ntile_smaller_than_tiles(self):
        # n rows < n tiles: SQL gives tiles 1..n one row each
        from bioie_llm_ray.stages.scan import global_order_ranks

        df = pd.DataFrame(
            {"k": [3, 1, 2], "id": np.arange(3, dtype=np.int64)}
        )
        out = (
            global_order_ranks(
                _ds(df, 1), "k", tiebreak=["id"], n_buckets=4, ntile=5
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert out["ntile"].tolist() == [1, 2, 3]


class TestPercentRankCumeDist:
    def test_matches_duckdb(self):
        import duckdb

        from bioie_llm_ray.stages.scan import global_order_ranks

        rng = np.random.RandomState(21)
        n = 800
        df = pd.DataFrame(
            {"k": rng.randint(0, 60, n), "id": np.arange(n, dtype=np.int64)}
        )
        out = (
            global_order_ranks(_ds(df, 6), "k", tiebreak=["id"], n_buckets=8)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT id, percent_rank() OVER (ORDER BY k) AS pr,"
            "       cume_dist() OVER (ORDER BY k) AS cd "
            "FROM t ORDER BY id"
        ).df()
        assert np.allclose(out["percent_rank"], want["pr"], atol=1e-12)
        assert np.allclose(out["cume_dist"], want["cd"], atol=1e-12)

    def test_single_row(self):
        from bioie_llm_ray.stages.scan import global_order_ranks

        df = pd.DataFrame({"k": [5], "id": [0]})
        out = global_order_ranks(
            _ds(df, 1), "k", tiebreak=["id"], n_buckets=2
        ).to_pandas()
        assert out["percent_rank"].iloc[0] == 0.0
        assert out["cume_dist"].iloc[0] == 1.0


class TestGlobalRanksScaleStress:
    def test_500k_rows_and_invariants(self):
        """The ranking operator at 500k rows: driver state stays at B
        scalars, output invariants hold (bijective row_number, rank within
        [1, N], dense_rank contiguous)."""
        from bioie_llm_ray.stages.scan import global_order_ranks

        n = 500_000
        ds = ray.data.range(n, override_num_blocks=32).map_batches(
            lambda b: pd.DataFrame(
                {"k": b["id"] % 1000, "id": b["id"]}
            ),
            batch_format="pandas",
        )
        out = global_order_ranks(ds, "k", tiebreak=["id"], n_buckets=32)

        def check(batch):
            rn = batch["row_number"].to_numpy(zero_copy_only=False)
            rk = batch["rank"].to_numpy(zero_copy_only=False)
            dr = batch["dense_rank"].to_numpy(zero_copy_only=False)
            k = batch["k"].to_numpy(zero_copy_only=False)
            assert (rn >= 1).all() and (rn <= n).all()
            assert (rk >= 1).all() and (rk <= n).all()
            # k in [0, 1000): dense rank IS k+1 (every value present)
            assert (dr == k + 1).all()
            # rank = 500*k + 1 (each of 1000 values has 500 rows)
            assert (rk == 500 * k + 1).all()
            import pyarrow as pa_

            return pa_.table({"n": pa_.array([len(batch)])})

        total = sum(
            r["n"]
            for r in out.map_batches(
                check, batch_format="pyarrow"
            ).take_all()
        )
        assert total == n
