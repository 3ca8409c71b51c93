"""Hashing utilities: the sha256 per-row invariant, stable sampling hashes.

The north rule requires carrying ``sha256(content)`` end-to-end (SURVEY §2.3
M15).  Deterministic hash-based sampling replaces the reference's global
``random.seed(42)`` + sorted-container sampling (string_processor.py:18,
176-187): a content-hash split is partition-count-invariant and needs no RNG
state in distributed stages (SURVEY §7.5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(values) -> list[str]:
    """sha256 hex digest of each UTF-8 string in an iterable."""
    return [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values]


def add_sha256_column(
    batch: pa.Table, column: str = "content", out: str = "content_sha256"
) -> pa.Table:
    """map_batches body: append the sha256 invariant column.

    hashlib releases the GIL per call and runs at C speed; at ~100 MB blocks
    this is I/O-bound, not a hot loop.
    """
    digests = sha256_hex(batch[column].to_pylist())
    return batch.append_column(out, pa.array(digests, type=pa.string()))


def stable_hash_u64(values) -> np.ndarray:
    """Deterministic 64-bit hash per string (first 8 bytes of md5).

    Process- and partition-invariant, unlike Python's randomized ``hash``.
    Used for hash-based splits/sampling and salted shuffle keys.
    """
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(v.encode("utf-8")).digest()[:8], "big"
        )
    return out


def hash_bucket(values, n_buckets: int) -> np.ndarray:
    """Stable bucket id in [0, n_buckets) per string key."""
    return (stable_hash_u64(values) % np.uint64(n_buckets)).astype(np.int64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain bit mixer)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hash_bucket_ints(values: np.ndarray, n_buckets: int) -> np.ndarray:
    """Stable bucket id per int key — fully vectorized (no per-row md5).

    For shuffle keys that are a single integer column this replaces the
    Python md5-per-row loop with one numpy pass (~100× on 10^5-row batches).
    Deterministic and partition-invariant like ``hash_bucket``; the two
    functions intentionally differ (a bucket id only needs to be consistent
    across the call sites of ONE shuffle).
    """
    v = np.asarray(values).astype(np.int64, copy=False).astype(np.uint64)
    return (_splitmix64(v) % np.uint64(n_buckets)).astype(np.int64)


def bucket_ids_for_column(col, n_buckets: int) -> np.ndarray:
    """Bucket ids for one pyarrow column: vectorized for integer dtypes,
    md5-based for everything else."""
    import pyarrow as pa

    t = col.type if isinstance(col, (pa.Array, pa.ChunkedArray)) else None
    if t is not None and pa.types.is_integer(t):
        if col.null_count:
            # null ints materialize as float NaN and NaN→int64 is
            # platform-dependent; pin nulls to the 0 bucket path (routing
            # needs determinism, not injectivity)
            import pyarrow.compute as pc

            col = pc.fill_null(col, 0)
        return hash_bucket_ints(col.to_numpy(zero_copy_only=False), n_buckets)
    vals = col.to_pylist() if t is not None else list(col)
    return hash_bucket([str(v) for v in vals], n_buckets)


def bucket_ids_for_columns(cols, n_buckets: int) -> np.ndarray:
    """Bucket ids for a COMPOSITE key: fully vectorized when every column
    is integer (chained splitmix64 mixing — same-key-same-bucket is the
    only contract a shuffle key needs), md5-joined-string fallback
    otherwise.  The multi-int path removes the per-row ``"a\\x1fb"`` build
    + md5 that made composite-key exchanges Python-bound on large batches.
    """
    import pyarrow as pa

    if not cols:
        # row count is unknowable from zero columns; the string path would
        # silently return a zero-length array for any batch
        raise ValueError("bucket_ids_for_columns requires at least one column")

    def _is_int(c):
        return isinstance(
            c, (pa.Array, pa.ChunkedArray)
        ) and pa.types.is_integer(c.type)

    if all(_is_int(c) for c in cols):
        import pyarrow.compute as pc

        acc = np.zeros(len(cols[0]), dtype=np.uint64)
        for c in cols:
            # null-safe: a null int column materializes as float NaN and
            # NaN→int64 is platform-dependent; pin nulls to 0 (bucket
            # routing only needs same-key-same-bucket, not injectivity)
            if c.null_count:
                c = pc.fill_null(c, 0)
            v = np.asarray(
                c.to_numpy(zero_copy_only=False)
            ).astype(np.int64, copy=False).astype(np.uint64)
            acc = _splitmix64(acc ^ (v + np.uint64(0x9E3779B97F4A7C15)))
        return (acc % np.uint64(n_buckets)).astype(np.int64)
    keys = [
        "\x1f".join(map(str, vals))
        for vals in zip(*(list(c) if not hasattr(c, "to_pylist") else c.to_pylist() for c in cols))
    ]
    return hash_bucket(keys, n_buckets)


def hash_sample_mask(values, keep_num: int, keep_den: int) -> np.ndarray:
    """Keep rows whose stable hash mod keep_den < keep_num.

    Deterministic replacement for the reference's seeded ``random.sample``
    test/shot splits (SURVEY §2.7 O2).
    """
    return (stable_hash_u64(values) % np.uint64(keep_den)) < np.uint64(keep_num)


class BloomFilter:
    """Vectorized Bloom filter over 64-bit key hashes (double hashing).

    Built once on the small side's distinct keys, broadcast via ``ray.put``,
    probed per batch with pure numpy — the classic shuffle-reduction
    pre-filter for large⋈small joins at cluster scale: fact rows whose key
    cannot be on the build side never enter the exchange.  False positives
    only (rate ``fpp``); the downstream join re-verifies, so results stay
    exact.  No false negatives: every inserted key always probes true.

    Keys are pre-hashed with the same vectorized paths the shuffle buckets
    use (``hash_bucket_ints`` mixer for ints, md5 for strings), then k bit
    positions derive from h1 + i*h2 double hashing (Kirsch–Mitzenmacher).
    """

    __slots__ = ("words", "m_bits", "k")

    def __init__(self, words: np.ndarray, m_bits: int, k: int):
        self.words = words
        self.m_bits = m_bits
        self.k = k

    @staticmethod
    def _key_hashes(values) -> np.ndarray:
        v = np.asarray(values)
        if v.dtype.kind in "iu":
            return _splitmix64(v.astype(np.int64, copy=False).astype(np.uint64))
        return stable_hash_u64([str(x) for x in values])

    @classmethod
    def build(
        cls,
        values,
        fpp: float = 0.01,
        m_bits: int | None = None,
        k: int | None = None,
    ) -> "BloomFilter":
        """Size from (n, fpp) unless ``m_bits``/``k`` are pinned — pinned
        sizing makes per-block partial filters mergeable (same positions),
        the distributed-build path."""
        h = cls._key_hashes(values)
        if m_bits is None:
            n = max(1, len(np.unique(h)))
            m_bits = int(max(64, np.ceil(-n * np.log(fpp) / (np.log(2) ** 2))))
            m_bits = ((m_bits + 63) // 64) * 64
            k = max(1, int(round(m_bits / n * np.log(2))))
        assert m_bits % 64 == 0 and k is not None and k >= 1
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        h1 = h
        h2 = _splitmix64(h) | np.uint64(1)  # odd → full-period stepping
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return cls(words, m_bits, k)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-union of two same-shape filters (per-block partial merge)."""
        assert self.m_bits == other.m_bits and self.k == other.k
        return BloomFilter(self.words | other.words, self.m_bits, self.k)

    def contains_many(self, values) -> np.ndarray:
        h1 = self._key_hashes(values)
        h2 = _splitmix64(h1) | np.uint64(1)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m_bits)
            bit = (
                self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))
            ) & np.uint64(1)
            out &= bit.astype(bool)
        return out
