"""Reference-semantics oracle — sequential reimplementation for parity tests.

This module mirrors the reference's parse → align → score flow in plain
sequential Python (dicts/lists, no Ray), exactly as specified by
/root/reference/src/data_processors/base_processor.py:1251-1345 (parsers),
:1571-1595 (sort_and_pad) and string_processor.py:400-479 (update_results).
It is intentionally an INDEPENDENT second implementation: the Ray pipelines
must match it at triple P/R ≥ 0.95 (BASELINE.json gate), and the parser/
aligner kernels must agree case-by-case.

Two deliberate reference quirks reproduced here, documented divergences in
the engine:

- ``re.finditer(item, response)`` uses the gold name as a RAW regex
  (unescaped) — names containing regex metacharacters would misparse; the
  engine escapes (functions/parsing.py).  Parity holds on metachar-free
  vocabularies (all real STRING/KEGG names in the fixtures).
- ``set``-based ordering in sort_and_pad makes the positional order of
  non-common values process-dependent; the engine uses first-seen order.
  Comparisons therefore check the order-insensitive quantities that the
  scoring depends on: matched pairs per query, pad counts, micro metrics.
"""

from __future__ import annotations

import re
from collections.abc import Sequence


def ref_clean_response_entity(response: str, true: Sequence[str]) -> list[str]:
    """Verbatim reference behavior (base_processor.py:1269-1298)."""
    cleaned = []
    for item in true:
        item = item.strip()
        for match in re.finditer(item, response):
            s, e = match.start(), match.end()
            prev_part = False
            if s != 0:
                prev_part = bool(re.match("[a-zA-Z0-9-_]", response[s - 1]))
            next_part = False
            if e != len(response):
                next_part = bool(re.match("[a-zA-Z0-9-_]", response[e]))
            if not prev_part and not next_part:
                cleaned.append(item)
                break
    return cleaned


def ref_clean_response_choice(response: str, choices: Sequence[str]) -> str:
    """Verbatim reference behavior (base_processor.py:1336-1345)."""
    cleaned = "None"
    for token in response.split():
        token = re.sub(r"[^a-zA-Z]", "", token)
        if any(x.lower() == token.lower() for x in choices):
            cleaned = token
            break
    return cleaned.lower()


def ref_sort_and_pad(
    pred: Sequence[str], true: Sequence[str], max_entity_list_len: int = 10
) -> tuple[list[str], list[str]]:
    """Verbatim reference behavior (base_processor.py:1571-1595)."""
    common_values = list(set(pred) & set(true))
    new_pred = common_values + list(set(pred) - set(common_values))
    new_true = common_values + list(set(true) - set(common_values))
    if len(new_pred) > max_entity_list_len:
        new_pred = new_pred[:max_entity_list_len]
    if len(new_true) > max_entity_list_len:
        new_true = new_true[:max_entity_list_len]
    if len(new_pred) < len(new_true):
        new_pred += ["NONE"] * (len(new_true) - len(new_pred))
    return new_pred, new_true


def ref_entity_eval(
    items: Sequence[tuple[str, str, Sequence[str]]], k: int = 10
) -> dict:
    """Reference update_results flow (string_processor.py:400-450) over
    (entity, response, gold) rows → accumulators + per-query summaries.

    Returns order-insensitive comparable quantities:
    ``per_query``: entity → (matched gold set, n_pred_rows, n_pad),
    ``triples``: the emitted (src, interacts_with, obj) set,
    ``n_rows``: total accumulated prediction rows.
    """
    per_query = {}
    triples = set()
    n_rows = 0
    for entity, response, gold in items:
        gold = [g.strip() for g in gold]
        pred = ref_clean_response_entity(response, gold)
        pred_al, true_al = ref_sort_and_pad(pred, gold, max_entity_list_len=k)
        n_rows += len(pred_al)
        matched = {p for p, t in zip(pred_al, true_al) if p == t}
        n_pad = sum(1 for p in pred_al if p == "NONE")
        per_query[entity] = (matched, len(pred_al), n_pad)
        for p in pred_al:
            if p != "NONE":
                triples.add((entity, "interacts_with", p))
    return {"per_query": per_query, "triples": triples, "n_rows": n_rows}


def ref_choice_eval(
    items: Sequence[tuple[str, str, str]], choices: Sequence[str]
) -> list[tuple[str, str, str]]:
    """Reference relation/relation_type flow (string_processor.py:452-479):
    (key, response, gold) → (key, cleaned_pred, gold) rows."""
    out = []
    for key, response, gold in items:
        pred = ref_clean_response_choice(response.strip(), choices)
        out.append((key, pred, gold.strip()))
    return out
