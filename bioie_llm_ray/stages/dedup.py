"""Exact dedup / canonicalization shuffles with hot-key salting (SURVEY §2.8 E3).

The reference dedups triples via Python ``set`` inserts in driver memory
(string_processor.py:173, G8).  At scale that is a groupby shuffle keyed by
the triple — and hub entities (TP53 analogs) make those keys hot.  The
two-phase salted pattern here:

  phase 1: group by (key, salt) where salt = stable_hash(discriminator) % k —
           duplicates of a hot key spread over k reducers, each keeps one row;
  phase 2: group by key alone over the ≤k survivors per key — tiny.

For uniform keys ``exact_dedup`` (single groupby, first row wins) is enough.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_bucket

_KEY_SEP = "\x1f"


def _add_key_column(batch: pa.Table, key_cols: list[str], out: str) -> pa.Table:
    cols = [batch[c].to_pylist() for c in key_cols]
    keys = [_KEY_SEP.join(vals) for vals in zip(*cols)] if cols else []
    return batch.append_column(out, pa.array(keys, type=pa.string()))


def _first_per_group(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def exact_dedup(ds, key_cols: list[str]):
    """Keep one row per distinct key tuple (single-phase groupby)."""
    keyed = ds.map_batches(
        lambda b: _add_key_column(b, key_cols, "_dk"), batch_format="pyarrow"
    )
    out = keyed.groupby("_dk").map_groups(_first_per_group, batch_format="pyarrow")
    return out.drop_columns(["_dk"])


def salted_dedup(ds, key_cols: list[str], salt_col: str, n_salt: int = 16):
    """Two-phase exact dedup for skewed keys.

    ``salt_col`` is any column whose value varies across duplicates of the
    same key (e.g. the source-document sha) — its hash spreads a hot key over
    ``n_salt`` phase-1 reducers.
    """

    def add_keys(batch: pa.Table) -> pa.Table:
        batch = _add_key_column(batch, key_cols, "_dk")
        salt = hash_bucket(batch[salt_col].to_pylist(), n_salt)
        combined = [
            f"{k}{_KEY_SEP}{s}"
            for k, s in zip(batch["_dk"].to_pylist(), salt)
        ]
        return batch.append_column("_dks", pa.array(combined, type=pa.string()))

    phase1 = (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("_dks")
        .map_groups(_first_per_group, batch_format="pyarrow")
    )
    phase2 = phase1.groupby("_dk").map_groups(
        _first_per_group, batch_format="pyarrow"
    )
    return phase2.drop_columns(["_dk", "_dks"])


def batch_local_dedup(ds, key_cols: list[str]):
    """Combiner-style pre-dedup inside each batch (no shuffle).

    Run before a global dedup to shrink the shuffle: duplicates that co-occur
    in a batch collapse early — the same partial-aggregation idea as
    pre-summing before a groupby.
    """

    def local(batch: pa.Table) -> pa.Table:
        batch = _add_key_column(batch, key_cols, "_dk")
        keys = batch["_dk"].to_pylist()
        seen: set[str] = set()
        mask = np.zeros(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            if k not in seen:
                seen.add(k)
                mask[i] = True
        return batch.filter(pa.array(mask)).drop_columns(["_dk"])

    return ds.map_batches(local, batch_format="pyarrow")
