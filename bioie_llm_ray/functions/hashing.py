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
        return hash_bucket_ints(col.to_numpy(zero_copy_only=False), n_buckets)
    vals = col.to_pylist() if t is not None else list(col)
    return hash_bucket([str(v) for v in vals], n_buckets)


def hash_sample_mask(values, keep_num: int, keep_den: int) -> np.ndarray:
    """Keep rows whose stable hash mod keep_den < keep_num.

    Deterministic replacement for the reference's seeded ``random.sample``
    test/shot splits (SURVEY §2.7 O2).
    """
    return (stable_hash_u64(values) % np.uint64(keep_den)) < np.uint64(keep_num)
