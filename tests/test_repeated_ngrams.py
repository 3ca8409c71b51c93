"""Repeated n-gram span detection (Lee et al. 2022 primitive)."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from bioie_llm_ray.pipelines.analytics import doc_repeated_ngrams

SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _reference(texts, n=8, min_docs=2):
    """Plain-Python oracle: all n-token windows shared by >= min_docs docs."""
    per_ngram_docs = collections.defaultdict(set)
    per_ngram_total = collections.Counter()
    for doc_id, text in enumerate(texts):
        toks = text.strip().split()
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            per_ngram_docs[g].add(doc_id)
            per_ngram_total[g] += 1
    rows = [
        (g, len(d), per_ngram_total[g])
        for g, d in per_ngram_docs.items()
        if len(d) >= min_docs
    ]
    return (
        pd.DataFrame(rows, columns=["ngram", "n_docs", "n_total"])
        .sort_values(["n_total", "ngram"], ascending=[False, True])
        .reset_index(drop=True)
    )


class TestRepeatedNgrams:
    def test_planted_span_across_three_docs(self, tmp_path):
        texts = [
            f"u{i}a u{i}b u{i}c {SPAN} u{i}d u{i}e u{i}f u{i}g u{i}h"
            for i in range(3)
        ] + ["short doc", f"solo filler only {SPAN.replace('alpha', 'ALPHA')}"]
        out = doc_repeated_ngrams(_write_docs(tmp_path, texts))
        assert SPAN in set(out["ngram"])
        row = out[out["ngram"] == SPAN].iloc[0]
        assert row["n_docs"] == 3 and row["n_total"] == 3

    def test_within_doc_repeat_alone_is_not_cross_doc(self, tmp_path):
        texts = [f"{SPAN} x1 x2 x3 {SPAN}", "totally unrelated words here"]
        out = doc_repeated_ngrams(_write_docs(tmp_path, texts))
        assert SPAN not in set(out["ngram"])  # n_docs == 1

    def test_windows_never_cross_document_boundaries(self, tmp_path):
        # doc0 ends with the span's first half, doc1 starts with its second:
        # the span exists only across the boundary, so it must not appear
        texts = [
            "p1 p2 p3 p4 alpha beta gamma delta",
            "epsilon zeta eta theta q1 q2 q3 q4",
        ]
        out = doc_repeated_ngrams(_write_docs(tmp_path, texts))
        assert len(out) == 0

    def test_exact_copy_pair_reports_every_window(self, tmp_path):
        body = " ".join(f"w{i}" for i in range(20))
        out = doc_repeated_ngrams(_write_docs(tmp_path, [body, body, "zz"]))
        assert len(out) == 20 - 8 + 1
        assert (out["n_docs"] == 2).all() and (out["n_total"] == 2).all()

    def test_matches_plain_python_reference_on_random_corpus(self, tmp_path):
        rng = np.random.RandomState(11)
        vocab = [f"t{i}" for i in range(30)]  # small vocab => real collisions
        texts = [
            " ".join(rng.choice(vocab, rng.randint(5, 60)))
            for _ in range(40)
        ]
        got = doc_repeated_ngrams(_write_docs(tmp_path, texts))
        want = _reference(texts)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
