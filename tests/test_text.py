"""Unit tests for the text-analysis kernels (functions/text.py)."""

import numpy as np
import pyarrow as pa

from bioie_llm_ray.functions.text import (
    bpe_ish_token_count,
    detect_language,
    normalize_ws_lower,
    rolling_fingerprint,
    whitespace_token_count,
)


class TestNormalize:
    def test_lower_and_collapse(self):
        t = pa.table({"text": ["  Hello   WORLD \t x ", "a"]})
        out = normalize_ws_lower(t)
        assert out["norm"].to_pylist() == ["hello world x", "a"]


class TestTokenCounts:
    def test_whitespace(self):
        arr = pa.array(["a b  c", " x ", ""])
        assert whitespace_token_count(arr).to_pylist()[:2] == [3, 1]

    def test_bpe_ish(self):
        # letters / digits / punct runs count separately
        out = bpe_ish_token_count(["abc123!", "hello, world"])
        assert out.tolist() == [3, 3]  # abc|123|! and hello|,|world


class TestLanguageId:
    def test_markers(self):
        out = detect_language(
            [
                "the cat and the dog of a house",
                "el perro y la casa de que no",
                "der Hund und die Katze in den",
                "zzz qqq www",
            ]
        )
        assert out == ["en", "es", "de", "und"]


class TestRollingFingerprint:
    def test_deterministic_and_shift_stable(self):
        base = "the quick brown fox jumps over the lazy dog"
        f1 = rolling_fingerprint([base, base])
        assert f1[0] == f1[1]
        # min-of-rolling-hashes is stable under prefix noise when the
        # minimizing window survives
        f2 = rolling_fingerprint(["XY " + base])
        assert f2[0] == f1[0] or f2[0] < f1[0]  # min can only move down/stay

    def test_short_strings(self):
        out = rolling_fingerprint(["ab", ""])
        assert out.dtype == np.uint64


class TestChunkDocuments:
    def test_full_coverage_and_overlap(self):
        import pyarrow as pa

        from bioie_llm_ray.functions.text import chunk_documents

        toks = [f"t{i}" for i in range(150)]
        batch = pa.table({"doc_id": [1], "text": [" ".join(toks)]})
        out = chunk_documents(batch, max_tokens=64, overlap=16).to_pylist()
        # ceil((150-16)/48) = 3 chunks; strides 0, 48, 96
        assert [r["chunk_id"] for r in out] == [0, 1, 2]
        assert [r["n_tokens"] for r in out] == [64, 64, 54]
        assert out[0]["chunk_text"].split()[:2] == ["t0", "t1"]
        assert out[1]["chunk_text"].split()[0] == "t48"
        # every token covered; consecutive chunks share exactly `overlap`
        covered = set()
        for r in out:
            covered.update(r["chunk_text"].split())
        assert covered == set(toks)
        a, b = out[0]["chunk_text"].split(), out[1]["chunk_text"].split()
        assert a[-16:] == b[:16]

    def test_short_and_empty_docs(self):
        import pyarrow as pa

        from bioie_llm_ray.functions.text import chunk_documents

        batch = pa.table(
            {"doc_id": [1, 2, 3], "text": ["a b c", "", "   "]}
        )
        out = chunk_documents(batch, max_tokens=64, overlap=16).to_pylist()
        # empty/whitespace docs emit nothing; short doc emits one chunk
        assert len(out) == 1
        assert out[0] == {
            "doc_id": 1,
            "chunk_id": 0,
            "n_tokens": 3,
            "chunk_text": "a b c",
        }
