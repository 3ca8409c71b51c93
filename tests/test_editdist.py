"""Exact Levenshtein self-join (stages/editdist.py)."""

import numpy as np
import pandas as pd
import ray

from bioie_llm_ray.stages.editdist import (
    banded_levenshtein,
    deletion_variants,
    edit_distance_pairs,
)


def brute(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[lb]


def _pairs_df(strs, d, **kw):
    df = pd.DataFrame(
        {"id": np.arange(len(strs), dtype=np.int64), "s": strs}
    )
    ds = ray.data.from_pandas(
        df.sample(frac=1.0, random_state=2)
    ).repartition(5)
    out = edit_distance_pairs(ds, "s", "id", max_dist=d, n_buckets=8, **kw)
    return out.to_pandas()


def _truth(strs, d):
    return {
        (i, j, brute(strs[i], strs[j]))
        for i in range(len(strs))
        for j in range(i + 1, len(strs))
        if brute(strs[i], strs[j]) <= d
    }


class TestKernel:
    def test_banded_matches_brute(self):
        rng = np.random.RandomState(4)
        for _ in range(200):
            a = "".join(rng.choice(list("abc"), rng.randint(0, 9)))
            b = "".join(rng.choice(list("abc"), rng.randint(0, 9)))
            for d in (1, 2, 3):
                t = brute(a, b)
                assert banded_levenshtein(a, b, d) == (t if t <= d else d + 1)

    def test_deletion_variants(self):
        assert deletion_variants("ab", 1) == {"ab", "a", "b"}
        assert "" in deletion_variants("ab", 2)
        assert deletion_variants("", 2) == {""}


class TestEditDistancePairs:
    def test_exact_vs_brute_force_d1_and_d2(self):
        rng = np.random.RandomState(7)
        strs = [
            "".join(rng.choice(list("abcd"), rng.randint(3, 8)))
            for _ in range(120)
        ]
        for d in (1, 2):
            out = _pairs_df(strs, d)
            got = set(
                zip(
                    out.id_a.astype(int),
                    out.id_b.astype(int),
                    out.dist.astype(int),
                )
            )
            assert got == _truth(strs, d)

    def test_planted_typo_classes(self):
        strs = [
            "distributed",   # base
            "distribbuted",  # insertion
            "distributd",    # deletion
            "destributed",   # substitution
            "dustrebuted",   # 2 edits — excluded at d=1
            "unrelated",
        ]
        out = _pairs_df(strs, 1)
        got = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
        assert got == {(0, 1), (0, 2), (0, 3)}

    def test_exact_duplicates_emit_distance_zero(self):
        out = _pairs_df(["same", "same", "other"], 1)
        assert len(out) == 1
        assert (
            int(out.id_a[0]), int(out.id_b[0]), int(out.dist[0])
        ) == (0, 1, 0)

    def test_join_refetch_path_matches_broadcast(self):
        rng = np.random.RandomState(9)
        strs = [
            "".join(rng.choice(list("ab"), rng.randint(2, 6)))
            for _ in range(60)
        ]
        a = _pairs_df(strs, 1)
        b = _pairs_df(strs, 1, max_broadcast_ids=0)  # force shuffle joins
        ka = sorted(zip(a.id_a, a.id_b, a.dist))
        kb = sorted(zip(b.id_a, b.id_b, b.dist))
        assert ka == kb and len(ka) > 0


class TestSegmentMethod:
    def test_agrees_with_deletion_method(self):
        rng = np.random.RandomState(17)
        strs = [
            "".join(rng.choice(list("abcd"), rng.randint(3, 11)))
            for _ in range(150)
        ]
        for d in (1, 2):
            a = _pairs_df(strs, d)
            b = _pairs_df(strs, d, method="segment")
            ka = set(zip(a.id_a.astype(int), a.id_b.astype(int),
                         a.dist.astype(int)))
            kb = set(zip(b.id_a.astype(int), b.id_b.astype(int),
                         b.dist.astype(int)))
            assert ka == kb and len(ka) > 0

    def test_long_strings_planted_edits(self):
        rng = np.random.RandomState(19)
        base = "".join(rng.choice(list("abcdefgh"), 300))
        strs = [
            base,
            base[:70] + "X" + base[71:],    # substitution
            base[:140] + "Q" + base[140:],  # insertion
            base[:210] + base[211:],        # deletion
            base[:10] + "ZZ" + base[12:],   # two edits - excluded at d=1
            "".join(rng.choice(list("abcdefgh"), 300)),  # unrelated
        ]
        out = _pairs_df(strs, 1, method="segment")
        got = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
        assert got == {(0, 1), (0, 2), (0, 3)}

    def test_segments_partition_exactly(self):
        from bioie_llm_ray.stages.editdist import _segments

        for length in (0, 1, 5, 17, 100):
            for d in (1, 2, 3):
                segs = _segments(length, d)
                assert len(segs) == d + 1
                assert segs[0][0] == 0
                assert sum(ln for _, ln in segs) == length
                for (p1, l1), (p2, _) in zip(segs, segs[1:]):
                    assert p1 + l1 == p2
