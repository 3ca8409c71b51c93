"""Distributed BPE tokenizer training (stages/tokenizer.py).

The serial textbook loop lives in oracle.expected_bpe_merges (independent
second implementation); here we pin (a) the distributed loop == the driver
fold on shared inputs, (b) the merge/encode kernel semantics, and (c)
conservation invariants of the corpus tokenization.
"""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from bioie_llm_ray import oracle
from bioie_llm_ray.stages import tokenizer as T


def _docs(rows: list[str]) -> ray.data.Dataset:
    return ray.data.from_items([{"text": t} for t in rows]).repartition(3)


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
]


class TestMergeKernels:
    def test_merge_word_non_overlapping_left_to_right(self):
        assert T.merge_word(list("aaa"), "a", "a") == ["aa", "a"]
        assert T.merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
        assert T.merge_word(["x", "y", "z"], "y", "z") == ["x", "yz"]
        assert T.merge_word(["ab"], "a", "b") == ["ab"]  # no split re-match

    def test_oracle_merge_matches_stage_kernel(self):
        for syms in (list("aaa"), list("banana"), ["q"], []):
            assert (
                list(oracle._bpe_merge_seq(tuple(syms), "a", "n"))
                == T.merge_word(list(syms), "a", "n")
            )

    def test_encode_word_lowest_rank_first(self):
        # ranks: (e,s)->0, (es,t)->1, (n,e)->2  — classic 'newest' chain
        ranks = {("e", "s"): 0, ("es", "t"): 1, ("n", "e"): 2}
        # (e,s) fires before (n,e) even though (n,e) appears first in the
        # word; after 'es', (es,t) fires; 'n'+'est' has no rank -> stop
        assert T.encode_word("nest", ranks) == ["n", "est", "</w>"]


class TestTrainBPE:
    def test_distributed_equals_driver_fold(self):
        ds = _docs(CORPUS)
        fast = T.train_bpe(ds, "text", n_merges=6)
        dist = T.train_bpe(ds, "text", n_merges=6, driver_bound_bytes=0)
        pd.testing.assert_frame_equal(fast, dist)

    def test_matches_serial_oracle_on_fixture(self, sf_dir):
        # the full pipeline over the fixture corpus == textbook serial loop
        import __ray_entry__ as entrymod

        got = entrymod.queries()["bpe_merges"](sf_dir)
        want = oracle.expected_bpe_merges()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_early_stop_below_min_pair_count(self):
        # every word unique, all pairs count 1 -> no merge at threshold 2
        ds = _docs(["abc def", "ghi jkl"])
        out = T.train_bpe(ds, "text", n_merges=5, min_pair_count=2)
        assert len(out) == 0

    def test_deterministic_tiebreak(self):
        # 'ab' and 'cd' both appear twice; (a,b) < (c,d) lexicographically
        ds = _docs(["ab cd", "ab cd"])
        out = T.train_bpe(ds, "text", n_merges=1)
        assert (out.loc[0, "left"], out.loc[0, "right"]) == ("a", "b")


class TestEncodeCorpus:
    def test_token_count_conservation(self):
        ds = _docs(CORPUS)
        merges = T.train_bpe(ds, "text", n_merges=4)
        toks = T.bpe_token_counts(ds, "text", merges).to_pandas()
        # total symbols = sum over distinct words of n * len(encode(word))
        wc = (
            T.word_counts(ds, "text").to_pandas().set_index("word")["n"]
        )
        ranks = {
            (l, r): k
            for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
        }
        want_total = sum(
            n * len(T.encode_word(w, ranks)) for w, n in wc.items()
        )
        assert int(toks["n"].sum()) == want_total

    def test_no_merges_yields_characters(self):
        ds = _docs(["ab ab"])
        toks = T.bpe_token_counts(
            ds, "text", pd.DataFrame(columns=["rank", "left", "right"])
        ).to_pandas()
        got = dict(zip(toks["token"], toks["n"]))
        assert got == {"a": 2, "b": 2, "</w>": 2}
