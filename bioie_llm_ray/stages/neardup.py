"""Deduplication suite for training-data pipelines.

Exact dedup lives in ``stages.dedup``; this module adds the near-dup family,
each expressed Ray-Data-first:

- **MinHash + LSH**: shingle → minhash signature per batch (vectorized
  numpy), explode to (band_id, band_hash) rows, groupby band buckets →
  candidate pairs → verify Jaccard.  The only shuffle is the band groupby,
  keyed by (band_id, band_hash) — naturally load-balanced.
- **SimHash**: 64-bit signed-projection fingerprint per doc; near-dups =
  equal fingerprints (or equal on ≥1 of 4 16-bit bands for Hamming ≤ k
  candidates).
- **n-gram Jaccard**: exact pairwise verification kernel used by both
  candidate generators.
- **Embedding cosine**: near-dup over a ``list<float>`` embedding column via
  LSH sign-buckets (random hyperplanes) → within-bucket cosine verify.

All hashes are md5-derived (process-stable); signatures use the standard
(a*x+b) mod p universal-hash family with a fixed seed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.arrowio import from_pandas_clean

_MERSENNE = np.uint64((1 << 61) - 1)


import functools

from ..functions.hashing import _splitmix64

_POLY = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


@functools.lru_cache(maxsize=1 << 20)
def _word_hash(word: str) -> int:
    return int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")


def _token_hashes(text: str, n_shingle: int) -> np.ndarray:
    """Stable 64-bit hashes of word shingles.

    md5 runs once per DISTINCT word (process-wide LRU — Zipfian reuse makes
    this ~free); shingle hashes combine the word hashes with a vectorized
    position-sensitive polynomial mix instead of hashing each joined
    shingle string.  ~10× over md5-per-shingle on real text.
    """
    toks = text.split()
    if not toks:
        return np.array(
            [int.from_bytes(hashlib.md5(b"").digest()[:8], "big")],
            dtype=np.uint64,
        )
    h = np.array([_word_hash(w) for w in toks], dtype=np.uint64)
    if len(toks) < n_shingle:
        n_shingle = len(toks)
    acc = h[: len(h) - n_shingle + 1].copy()
    for j in range(1, n_shingle):
        acc = _splitmix64(acc * _POLY + h[j : len(h) - n_shingle + 1 + j])
    return _splitmix64(acc)


_EMPTY_HASH = np.uint64(
    int.from_bytes(hashlib.md5(b"").digest()[:8], "big")
)


def _batch_shingle_hashes(
    texts, n_shingle: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Flat shingle-hash array for a whole batch + per-doc offsets.

    The batch-vectorized form of ``_token_hashes``: ONE Arrow whitespace
    split for the batch (empty tokens dropped — parity with ``str.split``
    pinned in tests), ONE dictionary-encode so md5 runs once per DISTINCT
    word in the batch (then through the process-wide LRU), and the
    position-mixing polynomial runs on the flat token array with global
    shifts — doc boundaries handled by masking, no per-doc Python.

    Returns ``(S, soff)`` where ``S[soff[d]:soff[d+1]]`` equals
    ``_token_hashes(texts[d], n_shingle)`` element-for-element (exact-order
    parity pinned in tests), so a per-doc signature is one
    ``np.minimum.reduceat`` away.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    sp = pc.utf8_split_whitespace(texts)
    lens_raw = pc.list_value_length(sp).to_numpy(zero_copy_only=False)
    lens_raw = np.asarray(lens_raw, dtype=np.int64)
    flat = pc.list_flatten(sp)
    docidx = np.repeat(np.arange(n_docs, dtype=np.int64), lens_raw)
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(ne))
    docidx = docidx[ne]
    counts = np.bincount(docidx, minlength=n_docs)
    # md5 once per distinct word (dictionary-encode is the C-level path)
    dic = pc.dictionary_encode(flat)
    codes = np.asarray(dic.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    uniq = dic.dictionary.to_pylist()
    uh = np.fromiter(
        (_word_hash(w) for w in uniq), dtype=np.uint64, count=len(uniq)
    )
    h = uh[codes] if len(codes) else np.empty(0, dtype=np.uint64)

    toff = np.concatenate(([0], np.cumsum(counts)))
    sc = np.where(counts >= n_shingle, counts - n_shingle + 1, 1)
    soff = np.concatenate(([0], np.cumsum(sc)))
    S = np.empty(soff[-1], dtype=np.uint64)

    T = len(h)
    if T:
        # full-shingle docs: the rolling mix over the flat array; shifts
        # that cross a doc boundary land on masked-out positions
        hp = np.concatenate([h, np.zeros(n_shingle - 1, dtype=np.uint64)])
        acc = h.copy()
        for j in range(1, n_shingle):
            acc = _splitmix64(acc * _POLY + hp[j : j + T])
        sh = _splitmix64(acc)
        pos_in_doc = np.arange(T, dtype=np.int64) - toff[docidx]
        cnt_tok = counts[docidx]
        main = (cnt_tok >= n_shingle) & (pos_in_doc <= cnt_tok - n_shingle)
        S[(soff[docidx] + pos_in_doc)[main]] = sh[main]
    # short docs (0 < n < n_shingle): one shingle over all n tokens,
    # vectorized per length class (at most n_shingle - 1 classes)
    for l in range(1, n_shingle):
        dl = np.flatnonzero(counts == l)
        if not len(dl):
            continue
        acc = h[toff[dl]].copy()
        for j in range(1, l):
            acc = _splitmix64(acc * _POLY + h[toff[dl] + j])
        S[soff[dl]] = _splitmix64(acc)
    S[soff[:-1][counts == 0]] = _EMPTY_HASH
    return S, soff


# transient (n_perm × shingles) chunk bound for the signature matmul —
# 16k shingles × 64 perms × 8 B ≈ 8 MB keeps the working set in L3
# (measured 2× over 64k chunks, 4× over an unchunked pass)
_SIG_CHUNK = 1 << 14


def _bands_table(
    ids, texts, a: np.ndarray, b: np.ndarray, id_col: str,
    n_bands: int, rows_per_band: int, n_shingle: int,
) -> pa.Table:
    """Batch of (id, text) → LSH band rows, fully vectorized: flat shingle
    hashes (``_batch_shingle_hashes``), ONE universal-hash outer product +
    ``np.minimum.reduceat`` per ~64k-shingle chunk (bounds the transient
    (n_perm × T) matrix), then the per-(doc, band) md5 compaction."""
    S, soff = _batch_shingle_hashes(texts, n_shingle)
    n_docs = len(soff) - 1
    n_perm = len(a)
    sig = np.empty((n_docs, n_perm), dtype=np.uint64)
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while d1 < n_docs and soff[d1 + 1] - soff[d0] <= _SIG_CHUNK:
            d1 += 1
        seg = S[soff[d0] : soff[d1]]
        # x mod (2^61−1) by shift-add: x = q·2^61 + r ⇒ x ≡ q + r, one
        # conditional subtract finishes (q ≤ 7 so q + r < 2M).  Exactly
        # equal to ``%`` for every uint64 x; fused in-place ops keep it
        # one allocation + one temp instead of five.
        vals = np.multiply(a[:, None], seg[None, :])
        np.add(vals, b[:, None], out=vals)
        q = np.right_shift(vals, np.uint64(61))
        np.bitwise_and(vals, _MERSENNE, out=vals)
        np.add(vals, q, out=vals)
        np.subtract(
            vals, _MERSENNE, out=vals, where=vals >= _MERSENNE
        )
        sig[d0:d1] = np.minimum.reduceat(
            vals, soff[d0 : d1] - soff[d0], axis=1
        ).T
        d0 = d1
    flat_bands = np.ascontiguousarray(sig).reshape(
        n_docs * n_bands, rows_per_band
    )
    step = rows_per_band * 8
    mv = memoryview(flat_bands.tobytes())
    # band key = first 8 md5 bytes as int64 (same 64 collision bits as the
    # old 16-hex-char prefix, but groupable/bucketable without per-row
    # string building)
    md5 = hashlib.md5
    out_hash = np.fromiter(
        (
            int.from_bytes(md5(mv[i * step : (i + 1) * step]).digest()[:8], "big")
            for i in range(n_docs * n_bands)
        ),
        dtype=np.uint64,
        count=n_docs * n_bands,
    ).astype(np.int64)
    ids_arr = pa.array(ids) if not isinstance(ids, (pa.Array, pa.ChunkedArray)) else ids
    rep_idx = pa.array(np.repeat(np.arange(n_docs, dtype=np.int64), n_bands))
    return pa.table(
        {
            id_col: ids_arr.take(rep_idx),
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n_docs)
            ),
            "band_hash": pa.array(out_hash, type=pa.int64()),
        }
    )


def _minhash_params(n_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, n_shingle: int) -> np.ndarray:
    h = _token_hashes(text, n_shingle)
    if len(h) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (n_perm, n_shingles): universal hash then row-min
    vals = (np.outer(a, h) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHasher:
    """Actor: text → LSH band rows (id, band_id, band_hash)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_perm: int = 64,
        n_bands: int = 16,
        n_shingle: int = 3,
        seed: int = 42,
    ):
        assert n_perm % n_bands == 0
        self.a, self.b = _minhash_params(n_perm, seed)
        self.text_col = text_col
        self.id_col = id_col
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.n_shingle = n_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _bands_table(
            batch[self.id_col],
            batch[self.text_col],
            self.a,
            self.b,
            self.id_col,
            self.n_bands,
            self.rows_per_band,
            self.n_shingle,
        )


import functools


@functools.lru_cache(maxsize=8)
def _cached_minhash_params(n_perm: int, seed: int = 42):
    return _minhash_params(n_perm, seed)


def minhash_bands_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
) -> pa.Table:
    """Stateless map_batches body: text → LSH band rows.

    The (a, b) permutation params rebuild from the seed in microseconds, so a
    task pool (elastic, no actor ramp-up) beats an actor pool here; the
    ``MinHasher`` actor class remains for configurations where signature
    state is genuinely expensive.
    """
    a, b = _cached_minhash_params(n_perm)
    return _bands_table(
        batch[id_col],
        batch[text_col],
        a,
        b,
        id_col,
        n_bands,
        n_perm // n_bands,
        n_shingle,
    )


def ngram_jaccard(a: str, b: str, n_shingle: int = 3) -> float:
    sa = set(map(int, _token_hashes(a, n_shingle)))
    sb = set(map(int, _token_hashes(b, n_shingle)))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Dataset → candidate near-dup pairs (id_a, id_b), id_a < id_b, distinct.

    Pairs are emitted per LSH bucket; a bucket of size m yields m-1 chained
    pairs (not m²/2) — enough to connect a duplicate cluster, bounded output.

    Signature generation uses the STATELESS task-pool body by default: the
    (a, b) permutation params rebuild from the seed in microseconds, and an
    elastic task pool uses every core while a fixed actor pool idles the
    rest (measured: 4.1 s → 1.1 s over 5k docs at 32 CPUs).  Pass
    ``concurrency`` to use the ``MinHasher`` actor pool instead (only worth
    it when signature state becomes genuinely expensive).
    """
    if concurrency is None:
        bands = ds.map_batches(
            lambda b: minhash_bands_batch(
                b,
                text_col=text_col,
                id_col=id_col,
                n_perm=n_perm,
                n_bands=n_bands,
                n_shingle=n_shingle,
            ),
            batch_format="pyarrow",
        )
    else:
        bands = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(
                text_col=text_col,
                id_col=id_col,
                n_perm=n_perm,
                n_bands=n_bands,
                n_shingle=n_shingle,
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    # group by hash(band_id, band_hash) % n_hash_buckets — one vectorized
    # pandas pass per hash-bucket instead of one Python call per LSH bucket
    # (LSH bucket count ~ n_bands × corpus size at scale)
    from ..functions.hashing import hash_bucket

    n_hash_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        # fully vectorized: the int64 band key is already md5-derived, so
        # one splitmix mix of (key, band_id) replaces the old per-row
        # "b|hash" string build + md5 pass
        bh = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bid = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (
            _splitmix64(bh + bid * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(n_hash_buckets)
        ).astype(np.int64)
        return batch.append_column("__bucket", pa.array(bucket))

    def bucket_pairs(group: pa.Table):
        import pandas as pd

        df = group.select(["band_id", "band_hash", id_col]).to_pandas()
        df = df.sort_values(["band_id", "band_hash", id_col])
        # chain consecutive ids within each LSH bucket: m-1 pairs connect a
        # duplicate cluster of size m without m²/2 output
        same = (
            df[["band_id", "band_hash"]]
            .eq(df[["band_id", "band_hash"]].shift())
            .all(axis=1)
        )
        out = pd.DataFrame(
            {"id_a": df[id_col].shift()[same], "id_b": df[id_col][same]}
        )
        # shift() promotes int ids to float64 (NaN in row 0) — cast back to
        # the SOURCE id dtype; string/object ids pass through untouched.
        if pd.api.types.is_integer_dtype(df[id_col].dtype):
            out = out.astype({"id_a": df[id_col].dtype, "id_b": df[id_col].dtype})
        return from_pandas_clean(out)

    pairs = (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    from .dedup import exact_dedup

    def to_str(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_k",
            pa.array(
                [f"{a}|{b}" for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())],
                type=pa.string(),
            ),
        )

    return exact_dedup(pairs.map_batches(to_str, batch_format="pyarrow"), ["_k"]).drop_columns(["_k"])


def verify_jaccard_pairs(
    pairs: ray.data.Dataset,
    docs_by_id,
    threshold: float = 0.8,
    n_shingle: int = 3,
) -> ray.data.Dataset:
    """Verify candidate pairs against true n-gram Jaccard ≥ threshold.

    ``docs_by_id``: broadcast dict id→text (or ObjectRef).  For corpora where
    the text side is too large to broadcast, verify by re-joining text via
    ``shuffle_join`` on id instead.
    """
    ref = docs_by_id if isinstance(docs_by_id, ray.ObjectRef) else ray.put(docs_by_id)

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(ref)
        # build each doc's shingle set ONCE per batch, not once per pair —
        # a doc in k candidate pairs would otherwise re-tokenize k times
        # (measured 55 s -> ~4 s on 431k candidates over 5k docs)
        cache: dict = {}

        def sset(i):
            s = cache.get(i)
            if s is None:
                s = set(map(int, _token_hashes(texts[i], n_shingle)))
                cache[i] = s
            return s

        ja = []
        for a, b in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist()
        ):
            sa, sb = sset(a), sset(b)
            if not sa and not sb:
                ja.append(1.0)
                continue
            inter = len(sa & sb)
            ja.append(inter / (len(sa) + len(sb) - inter))
        out = batch.append_column("jaccard", pa.array(ja, type=pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")


def verify_jaccard_pairs_join(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    n_shingle: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_type: pa.DataType | None = None,
    n_buckets: int = 32,
    max_broadcast_ids: int = 2_000_000,
) -> ray.data.Dataset:
    """Scale path for pair verification: re-fetch text via two shuffle joins.

    ``verify_jaccard_pairs`` broadcasts an id→text dict — an OOM when the
    corpus no longer fits on the driver.  Here the text side streams: join
    candidates to ``docs`` on ``id_a`` (text_a), then on ``id_b`` (text_b),
    then one vectorized Jaccard pass per batch.

    When the candidates' DISTINCT id set is small enough to broadcast, the
    docs side is semi-filtered against it and the surviving texts verify
    via the broadcast kernel — driver memory is bounded by the distinct-id
    count (≤ corpus row count), never by the pair count.  Gating on pair
    count was a scale bug: a duplication-heavy corpus emits tens of
    millions of candidate PAIRS over a few thousand distinct docs, and the
    join path those candidates were routed to ships a copy of each text
    PER PAIR through two shuffles (~pair_count × text_bytes of exchange —
    measured ~130 GB at the sf1 sweep, 714 s wall) when the whole distinct
    text set was ~75 MB.  Above ``max_broadcast_ids`` DISTINCT ids the
    full corpus streams through the bucketed joins — no driver
    materialization of text in that mode.
    """
    from .dedup import exact_dedup
    from .join import anti_semi_filter, shuffle_join

    if id_type is None:
        id_type = pa.int64()

    pairs = pairs.materialize()  # consumed by both joins; candidates are small

    def both_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [
                        batch["id_a"].combine_chunks(),
                        batch["id_b"].combine_chunks(),
                    ]
                )
            }
        )

    distinct_ids = exact_dedup(
        pairs.map_batches(both_ids, batch_format="pyarrow"), ["id"]
    ).materialize()
    if distinct_ids.count() <= max_broadcast_ids:
        id_set = {str(r["id"]) for r in distinct_ids.take_all()}
        texts = {
            r[id_col]: r[text_col]
            for r in anti_semi_filter(docs, id_set, keys=id_col)
            .select_columns([id_col, text_col])
            .take_all()
        }
        return verify_jaccard_pairs(
            pairs, texts, threshold=threshold, n_shingle=n_shingle
        )

    def side(col_id: str, col_text: str):
        def rename(batch: pa.Table) -> pa.Table:
            return pa.table(
                {col_id: batch[id_col], col_text: batch[text_col]}
            )

        return docs.map_batches(rename, batch_format="pyarrow")

    pair_schema = {"id_a": id_type, "id_b": id_type}
    j1 = shuffle_join(
        pairs,
        side("id_a", "text_a"),
        keys="id_a",
        n_buckets=n_buckets,
        left_schema=pair_schema,
        right_schema={"id_a": id_type, "text_a": pa.string()},
    )
    j2 = shuffle_join(
        j1,
        side("id_b", "text_b"),
        keys="id_b",
        n_buckets=n_buckets,
        left_schema={"id_b": id_type, "id_a": id_type, "text_a": pa.string()},
        right_schema={"id_b": id_type, "text_b": pa.string()},
    )

    def verify(batch: pa.Table) -> pa.Table:
        # per-batch shingle-set cache keyed by doc id (same rationale as
        # the broadcast kernel: a doc in k pairs tokenizes once, not k×)
        cache: dict = {}

        def sset(i, text):
            s = cache.get(i)
            if s is None:
                s = set(map(int, _token_hashes(text, n_shingle)))
                cache[i] = s
            return s

        ja = []
        for ia, ib, a, b in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            sa, sb = sset(ia, a), sset(ib, b)
            if not sa and not sb:
                ja.append(1.0)
                continue
            inter = len(sa & sb)
            ja.append(inter / (len(sa) + len(sb) - inter))
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "jaccard": pa.array(ja, type=pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j2.map_batches(verify, batch_format="pyarrow")


def near_dedup_docs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
    max_broadcast_ids: int = 2_000_000,
) -> ray.data.Dataset:
    """Corpus minus near-duplicates: keep one representative per cluster.

    Composition: LSH candidates → distributed Jaccard verify → connected
    components of the verified pair graph (``stages/graph.py``,
    large-star/small-star) → keep each component's minimum id.  Cluster
    membership is transitive-exact over the verified edges; recall is
    bounded by LSH candidate generation as usual.

    The drop set is ≤ the number of near-duplicate documents; below
    ``max_broadcast_ids`` it broadcasts as an id set (``anti_semi_filter``),
    above it ``cluster_dedup`` switches automatically to a distributed
    shuffle anti-join — no driver-side id collection on either path's
    scale branch.
    """
    cand = minhash_lsh_candidates(
        ds,
        text_col=text_col,
        id_col=id_col,
        n_perm=n_perm,
        n_bands=n_bands,
        n_shingle=n_shingle,
    )
    verified = verify_jaccard_pairs_join(
        cand,
        ds,
        threshold=threshold,
        n_shingle=n_shingle,
        id_col=id_col,
        text_col=text_col,
        max_broadcast_ids=max_broadcast_ids,
    )
    from .graph import cluster_dedup

    return cluster_dedup(
        ds, verified, id_col=id_col, max_broadcast_ids=max_broadcast_ids
    )


class SimHasher:
    """Actor: text → 64-bit simhash fingerprint column.

    Token hashes vote per bit position weighted +1/-1; the sign pattern is
    the fingerprint.  Identical-fingerprint rows are near-dup candidates.
    """

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col = text_col
        self.out_col = out_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            h = _token_hashes(t, 1)
            if len(h) == 0:
                out[i] = 0
                continue
            bits = (h[:, None] & self.bit_masks) != 0  # (n_tok, 64)
            votes = bits.sum(axis=0) * 2 - len(h)  # +1/-1 votes
            out[i] = np.uint64(
                int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)
            )
        return batch.append_column(
            self.out_col, pa.array(out.astype(np.int64))
        )


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple[int, int] = 2,
    n_hash_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep one row per simhash fingerprint (smallest id wins).

    Bucket-group pattern: distinct-fingerprint cardinality ≈ corpus size,
    so shuffling one group per fingerprint would make one Python call per
    distinct document; instead group by ``hash(simhash) % B`` and run one
    vectorized sort+dedup pass per bucket.
    """
    from ..functions.hashing import hash_bucket

    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = [str(s) for s in batch["simhash"].to_pylist()]
        return batch.append_column(
            "__bucket", pa.array(hash_bucket(keys, n_hash_buckets))
        )

    def first_by_id_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("simhash", "ascending"), (id_col, "ascending")],
        )
        sorted_t = group.take(order)
        sims = sorted_t["simhash"].to_numpy(zero_copy_only=False)
        first = np.empty(len(sims), dtype=bool)
        first[0] = True
        first[1:] = sims[1:] != sims[:-1]
        return sorted_t.filter(pa.array(first)).drop_columns(["__bucket"])

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(first_by_id_bucket, batch_format="pyarrow")
    )


def simhash_neardup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
    concurrency: int | tuple[int, int] = 2,
    n_hash_buckets: int = 64,
) -> ray.data.Dataset:
    """Near-dup candidate pairs via simhash Hamming bands, verified ≤ max_hamming.

    Pigeonhole: two 64-bit fingerprints within Hamming distance < n_bands of
    each other agree exactly on ≥1 of the ``n_bands`` 16-bit bands.  Explode
    each doc to (band_id, band_val) rows, bucket by hash(band_id|band_val),
    chain-pair consecutive ids within each equal-band run (m−1 pairs connect
    a cluster of m), then verify true Hamming distance on the paired
    fingerprints — no text re-fetch needed, the 64-bit signature travels with
    the band row.  Output: (id_a, id_b, hamming), id_a < id_b, distinct.
    """
    assert 64 % n_bands == 0
    band_bits = 64 // n_bands
    band_mask = np.uint64((1 << band_bits) - 1)

    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    from ..functions.hashing import hash_bucket

    def explode_bands(batch: pa.Table) -> pa.Table:
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sigs)
        id_type = batch.schema.field(id_col).type
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        out_id = (
            pa.array(np.tile(ids_np, n_bands), type=id_type)
            if n
            else pa.array([], type=id_type)
        )
        band_id = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        band_val = np.concatenate(
            [
                ((sigs >> np.uint64(bi * band_bits)) & band_mask).astype(np.int64)
                for bi in range(n_bands)
            ]
        ) if n else np.array([], dtype=np.int64)
        sim64 = np.tile(sigs.astype(np.int64), n_bands) if n else np.array([], dtype=np.int64)
        # vectorized bucket of the (band_id, band_val) group key — any
        # deterministic mix works (grouping only needs same-key-same-bucket)
        bucket = (
            _splitmix64(
                band_val.astype(np.uint64)
                + band_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            )
            % np.uint64(n_hash_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: out_id,
                "band_id": pa.array(band_id, type=pa.int32()),
                "band_val": pa.array(band_val, type=pa.int64()),
                "simhash": pa.array(sim64, type=pa.int64()),
                "__bucket": pa.array(bucket),
            }
        )

    def bucket_pairs(group: pa.Table):
        import pandas as pd

        df = group.select(["band_id", "band_val", id_col, "simhash"]).to_pandas()
        df = df.sort_values(["band_id", "band_val", id_col])
        same = (
            df[["band_id", "band_val"]]
            .eq(df[["band_id", "band_val"]].shift())
            .all(axis=1)
        )
        # positional indexing, NOT shift(): shift promotes int64 simhash to
        # float64 and corrupts fingerprints above 2^53
        idx = np.flatnonzero(same.to_numpy())
        sig = df["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        ids_np = df[id_col].to_numpy()
        ham = np.array(
            [int(x).bit_count() for x in (sig[idx - 1] ^ sig[idx])],
            dtype=np.int64,
        )
        keep = ham <= max_hamming
        idx = idx[keep]
        a_ids, b_ids = ids_np[idx - 1], ids_np[idx]
        swap = a_ids > b_ids
        a_ids, b_ids = (
            np.where(swap, b_ids, a_ids),
            np.where(swap, a_ids, b_ids),
        )
        return from_pandas_clean(
            pd.DataFrame({"id_a": a_ids, "id_b": b_ids, "hamming": ham[keep]})
        )

    pairs = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    from .dedup import exact_dedup

    def to_str(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_k",
            pa.array(
                [
                    f"{a}|{b}"
                    for a, b in zip(
                        batch["id_a"].to_pylist(), batch["id_b"].to_pylist()
                    )
                ],
                type=pa.string(),
            ),
        )

    return exact_dedup(
        pairs.map_batches(to_str, batch_format="pyarrow"), ["_k"]
    ).drop_columns(["_k"])


class EmbeddingLSH:
    """Actor: embedding list<float> → T sign-bucket ids (one per hash table).

    Multi-table random-hyperplane LSH: a near-dup pair straddling one
    table's hyperplane boundary still collides in another table, so recall
    rises as 1-(1-p^b)^T rather than the single-table p^b.  Each input row
    explodes to ``n_tables`` (table_id, bucket) rows; the embedding travels
    with the row for the within-bucket verify.
    """

    def __init__(
        self,
        dim: int,
        n_planes: int = 16,
        n_tables: int = 1,
        emb_col: str = "embedding",
        seed: int = 42,
    ):
        rng = np.random.RandomState(seed)
        # (T, dim, n_planes): independent hyperplane sets per table
        self.planes = rng.randn(n_tables, dim, n_planes).astype(np.float32)
        self.n_tables = n_tables
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch[self.emb_col].to_numpy(zero_copy_only=False))
        n = len(emb)
        powers = 1 << np.arange(self.planes.shape[2], dtype=np.int64)
        tables, buckets = [], []
        for t in range(self.n_tables):
            signs = (emb @ self.planes[t]) > 0
            buckets.append(signs.astype(np.int64) @ powers)
            tables.append(np.full(n, t, dtype=np.int32))
        out = batch.take(
            pa.array(np.tile(np.arange(n, dtype=np.int64), self.n_tables))
        )
        return out.append_column(
            "lsh_table", pa.array(np.concatenate(tables))
        ).append_column("lsh_bucket", pa.array(np.concatenate(buckets)))


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple[int, int] = 2,
    n_hash_buckets: int = 64,
) -> ray.data.Dataset:
    """Cosine near-dup pairs via multi-table LSH sign buckets + verify.

    Bucket-group pattern: the shuffle key is ``hash(table|bucket) % B``
    (bounded reducers, not one group per LSH bucket); each reducer runs a
    vectorized per-(table,bucket) pairwise verify.  Pairs found by several
    tables dedup via the bucketed exact_dedup, keeping one cosine.
    """
    from ..functions.hashing import hash_bucket

    bucketed = ds.map_batches(
        EmbeddingLSH,
        fn_constructor_kwargs={
            "dim": dim,
            "n_planes": n_planes,
            "n_tables": n_tables,
            "emb_col": emb_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = [
            f"{t}|{b}"
            for t, b in zip(
                batch["lsh_table"].to_pylist(), batch["lsh_bucket"].to_pylist()
            )
        ]
        return batch.append_column(
            "__bucket", pa.array(hash_bucket(keys, n_hash_buckets))
        )

    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )

    def verify(group: pa.Table) -> pa.Table:
        import pandas as pd

        if len(group) < 2:
            return empty
        df = pd.DataFrame(
            {
                "t": group["lsh_table"].to_pylist(),
                "b": group["lsh_bucket"].to_pylist(),
            }
        )
        emb = np.stack(group[emb_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        ids_np = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        out_a, out_b, out_c = [], [], []
        for _, sub in df.groupby(["t", "b"]):
            idx = sub.index.to_numpy()
            if len(idx) < 2:
                continue
            sims = norm[idx] @ norm[idx].T
            iu, ju = np.triu_indices(len(idx), k=1)
            hit = sims[iu, ju] >= threshold
            iu, ju = iu[hit], ju[hit]
            ga, gb = ids_np[idx[iu]], ids_np[idx[ju]]
            out_a.append(np.minimum(ga, gb))
            out_b.append(np.maximum(ga, gb))
            out_c.append(sims[iu, ju])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    pairs = (
        bucketed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(verify, batch_format="pyarrow")
    )
    # same pair may surface from several tables — keep one row per pair
    from .dedup import exact_dedup

    def key_col(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_k",
            pa.array(
                [
                    f"{a}|{b}"
                    for a, b in zip(
                        batch["id_a"].to_pylist(), batch["id_b"].to_pylist()
                    )
                ],
                type=pa.string(),
            ),
        )

    return exact_dedup(
        pairs.map_batches(key_col, batch_format="pyarrow"), ["_k"]
    ).drop_columns(["_k"])


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    n_shingle: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_type: pa.DataType | None = None,
    n_hash_buckets: int = 64,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """EXACT n-gram-Jaccard similarity self-join: all pairs with J ≥ t.

    MinHash/SimHash candidates are probabilistic (chain pairing can miss a
    true pair — see ``minhash_lsh_candidates``); this operator is the exact
    member of the dedup family, via prefix filtering (AllPairs / PPJoin,
    Bayardo et al. WWW'07; Xiao et al. WWW'08 — public algorithms):

    1. Per doc, sort its distinct shingle hashes ascending (one global
       order) and index only the first ``n − ceil(t·n) + 1`` of them.
       Theorem: the smallest shared shingle of any pair with overlap
       ≥ ceil(t·n) lies in BOTH prefixes, so no true pair is missed.
    2. Inverted-index join: groupby ``hash(shingle) % B`` (bounded
       reducers), emit all within-shingle pairs passing the length filter
       ``min(n_a, n_b) ≥ t · max(n_a, n_b)`` (necessary for J ≥ t).
    3. Dedup pairs (bucketed ``exact_dedup``), then verify true Jaccard
       with the distributed text re-fetch join — output == ground truth.

    Scale notes: index size is (1−t)·|shingles| rows — the threshold is the
    cost knob.  A boilerplate shingle shared by m prefixes emits O(m²)
    candidates; the length filter prunes most, and corpora with heavy
    boilerplate should pre-strip it (the usual AllPairs practice) — the
    exactness guarantee is on the given text.
    """
    from ..functions.hashing import hash_bucket
    from .dedup import exact_dedup

    if id_type is None:
        id_type = pa.int64()

    def prefix_rows(batch: pa.Table) -> pa.Table:
        out_sh, out_id, out_n = [], [], []
        for i, text in enumerate(batch[text_col].to_pylist()):
            u = np.unique(_token_hashes(text, n_shingle))
            n = len(u)
            plen = n - int(np.ceil(threshold * n)) + 1
            pref = u[:plen]
            out_sh.append(pref)
            out_id.append(np.full(len(pref), i, dtype=np.int64))
            out_n.append(np.full(len(pref), n, dtype=np.int64))
        ids = batch[id_col].take(
            pa.array(np.concatenate(out_id) if out_id else [], type=pa.int64())
        )
        return pa.table(
            {
                "shingle": pa.array(
                    np.concatenate(out_sh) if out_sh else [], type=pa.uint64()
                ),
                id_col: ids,
                "n_sh": pa.array(
                    np.concatenate(out_n) if out_n else [], type=pa.int64()
                ),
            }
        )

    rows = ds.map_batches(prefix_rows, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        # vectorized: the shingle is already a uniform uint64 hash — route
        # it with the int splitmix kernel, never per-row str()+md5
        from ..functions.hashing import hash_bucket_ints

        return batch.append_column(
            "__bucket",
            pa.array(
                hash_bucket_ints(
                    batch["shingle"].to_numpy(zero_copy_only=False),
                    n_hash_buckets,
                )
            ),
        )

    empty = pa.table(
        {"id_a": pa.array([], type=id_type), "id_b": pa.array([], type=id_type)}
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # Vectorized inverted-index pair generation: sort by shingle, walk
        # the runs, per-run triu index pairs + length filter in numpy (no
        # per-PAIR Python — on duplication-heavy corpora every shared
        # prefix shingle re-discovers the same pair, so the old per-pair
        # loop ran tens of millions of iterations), then ONE within-bucket
        # np.unique combiner before the global exact_dedup exchange.
        s = group["shingle"].to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s = s[order]
        ids = group[id_col].to_numpy(zero_copy_only=False)[order]
        ns = group["n_sh"].to_numpy(zero_copy_only=False)[order]
        bnd = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        sizes = np.diff(np.append(bnd, len(s)))
        out_a, out_b = [], []
        for start, m in zip(bnd[sizes >= 2], sizes[sizes >= 2]):
            iu, ju = np.triu_indices(m, k=1)
            na, nb = ns[start + iu], ns[start + ju]
            keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
            a, b = ids[start + iu[keep]], ids[start + ju[keep]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            ne = lo != hi
            out_a.append(lo[ne])
            out_b.append(hi[ne])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        if a.dtype.kind in "iu":  # combiner dedup (int ids: the scale path)
            uniq = np.unique(np.stack([a, b], axis=1), axis=0)
            a, b = uniq[:, 0], uniq[:, 1]
        return pa.table(
            {
                "id_a": pa.array(a, type=id_type),
                "id_b": pa.array(b, type=id_type),
            }
        )

    pairs = (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    def key_col(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_k",
            pc.binary_join_element_wise(
                pc.cast(batch["id_a"], pa.string()),
                pc.cast(batch["id_b"], pa.string()),
                "|",
            ),
        )

    cand = exact_dedup(
        pairs.map_batches(key_col, batch_format="pyarrow"), ["_k"]
    ).drop_columns(["_k"])
    return verify_jaccard_pairs_join(
        cand,
        ds,
        threshold=threshold,
        n_shingle=n_shingle,
        id_col=id_col,
        text_col=text_col,
        id_type=id_type,
        n_buckets=n_buckets,
    )


def ngram_containment_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    n_shingle: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_type: pa.DataType | None = None,
    n_hash_buckets: int = 64,
    n_buckets: int = 32,
    max_broadcast_ids: int = 2_000_000,
) -> ray.data.Dataset:
    """EXACT n-gram containment join: all ORDERED pairs (id_sub, id_super)
    with ``|S_sub ∩ S_super| / |S_sub| ≥ threshold`` — the asymmetric
    sibling of ``ngram_jaccard_pairs``, detecting quotes, boilerplate and
    near-subsumption where symmetric Jaccard stays low because the texts'
    sizes differ.

    Prefix filter for containment: only the CONTAINED side is
    threshold-bound, so the probe side indexes its first
    ``floor((1−t)·n)+1`` shingles (ascending hash order: if ≥ t·n of a
    doc's shingles appear in the super-doc, at most (1−t)·n are missing,
    so one of the first floor((1−t)·n)+1 must be shared) while the super
    side must index ALL its shingles — the inherent asymmetry of a
    containment join.  Candidates apply the length filter
    ``n_super ≥ t·n_sub``; verification computes exact containment over
    re-fetched texts (broadcast semi-filter when the candidate id set is
    small, two shuffle joins when not)."""
    from ..functions.hashing import hash_bucket
    from .dedup import exact_dedup

    if id_type is None:
        id_type = pa.int64()

    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_sh, out_idx, out_n, out_role = [], [], [], []
        for i, text in enumerate(batch[text_col].to_pylist()):
            u = np.unique(_token_hashes(text, n_shingle))
            n = len(u)
            out_sh.append(u)
            out_idx.append(np.full(n, i, dtype=np.int64))
            out_n.append(np.full(n, n, dtype=np.int64))
            out_role.append(np.zeros(n, dtype=np.int8))  # 0 = index/super
            plen = int(np.floor((1 - threshold) * n)) + 1
            pref = u[:plen]
            out_sh.append(pref)
            out_idx.append(np.full(len(pref), i, dtype=np.int64))
            out_n.append(np.full(len(pref), n, dtype=np.int64))
            out_role.append(np.ones(len(pref), dtype=np.int8))  # 1 = probe
        idx = np.concatenate(out_idx) if out_idx else np.array([], dtype=np.int64)
        ids = batch[id_col].take(pa.array(idx, type=pa.int64()))
        return pa.table(
            {
                "shingle": pa.array(
                    np.concatenate(out_sh) if out_sh else [],
                    type=pa.uint64(),
                ),
                id_col: ids,
                "n_sh": pa.array(
                    np.concatenate(out_n) if out_n else [], type=pa.int64()
                ),
                "role": pa.array(
                    np.concatenate(out_role) if out_role else [],
                    type=pa.int8(),
                ),
            }
        )

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        # vectorized int routing (see ngram_jaccard_pairs)
        from ..functions.hashing import hash_bucket_ints

        return batch.append_column(
            "__bucket",
            pa.array(
                hash_bucket_ints(
                    batch["shingle"].to_numpy(zero_copy_only=False),
                    n_hash_buckets,
                )
            ),
        )

    empty = pa.table(
        {
            "id_sub": pa.array([], type=id_type),
            "id_super": pa.array([], type=id_type),
        }
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "s": group["shingle"].to_numpy(zero_copy_only=False),
                "i": group[id_col].to_pylist(),
                "n": group["n_sh"].to_numpy(zero_copy_only=False),
                "r": group["role"].to_numpy(zero_copy_only=False),
            }
        )
        prb = df[df["r"] == 1]
        idxs = df[df["r"] == 0]
        m = prb.merge(idxs, on="s", suffixes=("_p", "_i"))
        m = m[m["i_p"] != m["i_i"]]
        m = m[m["n_i"] >= threshold * m["n_p"]]
        if m.empty:
            return empty
        m = m[["i_p", "i_i"]].drop_duplicates()
        return pa.table(
            {
                "id_sub": pa.array(m["i_p"].to_numpy(), type=id_type),
                "id_super": pa.array(m["i_i"].to_numpy(), type=id_type),
            }
        )

    pairs = (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    cand = exact_dedup(pairs, ["id_sub", "id_super"], n_buckets=n_buckets)

    # --- verify over re-fetched texts ------------------------------------
    cand = cand.materialize()

    def containment_batch(batch, texts_a, texts_b):
        cache: dict = {}

        def sset(i, text):
            s = cache.get(i)
            if s is None:
                s = set(map(int, _token_hashes(text, n_shingle)))
                cache[i] = s
            return s

        cs = []
        for ia, ib, a, b in zip(
            batch["id_sub"].to_pylist(),
            batch["id_super"].to_pylist(),
            texts_a,
            texts_b,
        ):
            sa, sb = sset(ia, a), sset(ib, b)
            cs.append(1.0 if not sa else len(sa & sb) / len(sa))
        out = pa.table(
            {
                "id_sub": batch["id_sub"],
                "id_super": batch["id_super"],
                "containment": pa.array(cs, type=pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["containment"], threshold))

    def _both_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [
                        batch["id_sub"].combine_chunks(),
                        batch["id_super"].combine_chunks(),
                    ]
                )
            }
        )

    # gate on DISTINCT ids (≤ corpus rows), not pair count — the pair-count
    # gate routed duplication-heavy corpora to the join path, which ships a
    # text copy PER PAIR (see verify_jaccard_pairs_join)
    distinct_ids = exact_dedup(
        cand.map_batches(_both_ids, batch_format="pyarrow"), ["id"]
    ).materialize()
    if distinct_ids.count() <= max_broadcast_ids:
        from .join import anti_semi_filter

        id_set = {str(r["id"]) for r in distinct_ids.take_all()}
        texts_ref = ray.put(
            {
                r[id_col]: r[text_col]
                for r in anti_semi_filter(ds, id_set, keys=id_col)
                .select_columns([id_col, text_col])
                .take_all()
            }
        )

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            texts = ray.get(texts_ref)
            ta = [texts[i] for i in batch["id_sub"].to_pylist()]
            tb = [texts[i] for i in batch["id_super"].to_pylist()]
            return containment_batch(batch, ta, tb)

        return cand.map_batches(verify_broadcast, batch_format="pyarrow")

    from .join import shuffle_join

    def side(col_id: str, col_text: str):
        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({col_id: batch[id_col], col_text: batch[text_col]})

        return ds.map_batches(rename, batch_format="pyarrow")

    j1 = shuffle_join(
        cand, side("id_sub", "text_a"), keys="id_sub", n_buckets=n_buckets,
        left_schema={"id_sub": id_type, "id_super": id_type},
        right_schema={"id_sub": id_type, "text_a": pa.string()},
    )
    j2 = shuffle_join(
        j1, side("id_super", "text_b"), keys="id_super", n_buckets=n_buckets,
        left_schema={
            "id_super": id_type, "id_sub": id_type, "text_a": pa.string()
        },
        right_schema={"id_super": id_type, "text_b": pa.string()},
    )

    def verify_join(batch: pa.Table) -> pa.Table:
        return containment_batch(
            batch,
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        )

    return j2.map_batches(verify_join, batch_format="pyarrow")
