"""Text → embedding stage (the RAG-ingestion contract).

``HashEmbedder`` is the actor-pool embedding stage: a callable CLASS for
``map_batches(HashEmbedder, concurrency=N)`` whose ``__init__`` runs once
per actor (this is where a real sentence-transformer checkpoint would
load — the same environment-gated contract as ``stages/scorer.HFScorer``
and ``stages/multimodal.DecodeStub``) and whose ``__call__`` embeds one
Arrow batch.  The deterministic implementation maps each text to the
first ``dim`` md5 digest bytes scaled by 1/256 — exactly reproducible in
SQL (DuckDB ``md5()`` hex parsing, the ``multimodal_features`` oracle
trick), which is what lets the composed retrieval pipeline
(``analytics.rag_retrieval``) carry a full value-hash oracle instead of a
rows-only check.

Scale shape: pure per-batch projection, zero shuffle; the embedding
column adds dim × 8 bytes per row, so size ``batch_size`` accordingly
when dim is model-sized (384-1024) rather than the 8 used here.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HashEmbedder:
    """Deterministic per-text embedding: md5 digest bytes / 256.

    Stands in for a model embedder; weights would load in ``__init__``
    (once per actor), never in ``__call__``.
    """

    def __init__(self, text_col: str = "chunk_text", dim: int = 8):
        if dim > 16:
            raise ValueError("md5 digest provides at most 16 bytes")
        self.text_col = text_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.empty((len(batch), self.dim), dtype=np.float64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            digest = hashlib.md5(text.encode("utf-8")).digest()
            vecs[i] = np.frombuffer(digest[: self.dim], dtype=np.uint8)
        vecs /= 256.0
        return batch.append_column(
            "embedding", pa.array(list(vecs), type=pa.list_(pa.float64()))
        )


def embed_texts(texts: list[str], dim: int = 8) -> np.ndarray:
    """Driver-side twin of ``HashEmbedder`` for broadcast query vectors."""
    out = np.empty((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        out[i] = np.frombuffer(
            hashlib.md5(t.encode("utf-8")).digest()[:dim], dtype=np.uint8
        )
    return out / 256.0


class CrossEncoderStub:
    """Deterministic (query, passage) relevance scorer — the RERANK stage
    of two-stage retrieval (retrieve-k0-with-bi-encoder, rerank-with-
    cross-encoder).  A real cross-encoder checkpoint would load in
    ``__init__`` (once per actor); scoring batches (query, text) pairs is
    ``__call__``.  The stand-in score is the first 4 md5 digest bytes of
    ``"<query>|<text>"`` scaled to [0, 1) — exactly reproducible in SQL
    via hex parsing, keeping the composed pipeline value-hash-checkable.
    """

    def __init__(
        self,
        query_texts: list[str],
        text_col: str = "chunk_text",
        qid_col: str = "qid",
    ):
        self.queries = list(query_texts)
        self.text_col = text_col
        self.qid_col = qid_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = np.empty(len(batch), dtype=np.float64)
        for i, (qid, text) in enumerate(
            zip(
                batch[self.qid_col].to_pylist(),
                batch[self.text_col].to_pylist(),
            )
        ):
            digest = hashlib.md5(
                f"{self.queries[qid]}|{text}".encode("utf-8")
            ).digest()
            scores[i] = int.from_bytes(digest[:4], "big") / 2**32
        return batch.append_column(
            "ce_score", pa.array(scores, type=pa.float64())
        )
