"""Incremental dedup against a shared mutable index (sharded actors).

``stages/dedup.py`` dedups WITHIN a dataset via shuffles.  A continuously
ingesting pipeline needs a different contract: drop rows whose key was seen
in ANY previous batch/run — state that must mutate across the whole stream.
That is the one shape the Dataset API genuinely cannot express, so this is
the engine's (single) raw-actor component:

- ``DedupIndexShard``: one shard of the seen-key set.  Keys route by
  ``stable_hash(key) % n_shards``, so each shard owns a disjoint key space
  and shards never coordinate.
- ``DedupIndex.filter_new``: a ``map_batches`` stage that tests-and-inserts
  each batch's keys against the owning shards (one RPC per shard per batch,
  keys grouped client-side) and keeps only first-seen rows.

Guarantee: each key survives EXACTLY once across everything filtered
through the same index (shard membership is atomic per actor).  Which
duplicate survives follows stream arrival order — by construction there is
no global order in a streaming ingest.

Scale notes: memory is the index's limit — keys are stored as 8-byte
stable hashes (not strings), ~80 MB per 10^7 keys per shard with Python
set overhead; size ``n_shards`` to the cluster and checkpoint via
``snapshot``/``restore`` (numpy arrays) alongside the data checkpoints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import stable_hash_u64

_SEP = "\x1f"


@ray.remote
class DedupIndexShard:
    """One shard: a set of seen 64-bit key hashes with test-and-insert."""

    def __init__(self):
        self.seen: set[int] = set()

    def check_and_add(self, hashes: list[int]) -> list[bool]:
        """For each hash (in order): True if NEW (and record it)."""
        seen = self.seen
        out = []
        for h in hashes:
            if h in seen:
                out.append(False)
            else:
                seen.add(h)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self.seen)

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self.seen, dtype=np.uint64, count=len(self.seen))

    def restore(self, arr: np.ndarray) -> int:
        self.seen = set(int(x) for x in np.asarray(arr, dtype=np.uint64))
        return len(self.seen)


class DedupIndex:
    """Sharded seen-key index + the ``filter_new`` Dataset stage."""

    def __init__(self, n_shards: int = 8, name_prefix: str | None = None):
        self.n_shards = n_shards
        opts = {}
        self.shards = [
            DedupIndexShard.options(
                **({"name": f"{name_prefix}-{i}"} if name_prefix else opts)
            ).remote()
            for i in range(n_shards)
        ]

    def filter_new(
        self, ds: ray.data.Dataset, key_cols: list[str] | str
    ) -> ray.data.Dataset:
        """Keep only rows whose key has never been seen by this index."""
        key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        shards = self.shards
        n_shards = self.n_shards

        def fn(batch: pa.Table) -> pa.Table:
            cols = [batch[c].to_pylist() for c in key_cols]
            keys = [_SEP.join(map(str, vals)) for vals in zip(*cols)]
            h = stable_hash_u64(keys)
            shard_of = (h % np.uint64(n_shards)).astype(np.int64)
            mask = np.zeros(len(keys), dtype=bool)
            # group keys per shard: one RPC per shard per batch, issued
            # concurrently; first occurrence WITHIN the batch also wins here
            # because each shard processes its list in order
            futures, positions = [], []
            for s in range(n_shards):
                pos = np.flatnonzero(shard_of == s)
                if len(pos) == 0:
                    continue
                futures.append(
                    shards[s].check_and_add.remote([int(h[i]) for i in pos])
                )
                positions.append(pos)
            for pos, res in zip(positions, ray.get(futures)):
                mask[pos] = res
            return batch.filter(pa.array(mask))

        return ds.map_batches(fn, batch_format="pyarrow")

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[np.ndarray]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[np.ndarray]) -> int:
        return sum(
            ray.get(
                [s.restore.remote(a) for s, a in zip(self.shards, snaps)]
            )
        )
