"""Prediction/gold alignment — the reference's ``sort_and_pad`` (M12).

Behavior specified at
/root/reference/src/data_processors/base_processor.py:1571-1595:
intersection values first, then the remaining values of each list, both
truncated to ``max_entity_list_len`` (k=10), and the prediction side padded
with ``'NONE'`` up to the gold length.  Micro/macro P/R/F over the resulting
positional pairs is the reference's entity-task metric (SURVEY §2.3 M12).

Determinism note: the reference builds the ordering with Python ``set``
operations, whose iteration order depends on the process hash seed.  We use
insertion-ordered dedup instead (first-seen order), which is stable across
processes and partitions.  Micro metrics are identical (positional pairing of
non-common values is wrong under any order); macro metrics agree whenever the
parser output is a subset of gold — which ``parse_entity_response`` guarantees.
"""

from __future__ import annotations

from collections.abc import Sequence


def _ordered_unique(xs: Sequence[str]) -> list[str]:
    return list(dict.fromkeys(xs))


def sort_and_pad(
    pred: Sequence[str], true: Sequence[str], max_entity_list_len: int = 10
) -> tuple[list[str], list[str]]:
    """Align pred/true lists: common first, truncate to k, pad pred with NONE."""
    pred_u = _ordered_unique(pred)
    true_u = _ordered_unique(true)
    true_set = set(true_u)
    common = [x for x in pred_u if x in true_set]
    common_set = set(common)
    new_pred = common + [x for x in pred_u if x not in common_set]
    new_true = common + [x for x in true_u if x not in common_set]

    new_pred = new_pred[:max_entity_list_len]
    new_true = new_true[:max_entity_list_len]

    if len(new_pred) < len(new_true):
        new_pred += ["NONE"] * (len(new_true) - len(new_pred))
    return new_pred, new_true
