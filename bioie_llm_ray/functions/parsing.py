"""Response parsers — the reference's ``clean_response`` semantics (SURVEY §2.3).

Reimplemented from scratch against the behavior specified at
/root/reference/src/data_processors/base_processor.py:1251-1345:

- ``parse_entity_response`` (M9): gold-guided span matcher.  For each gold
  name, scan the generated text; a match counts only when the characters
  adjacent to the span are NOT in ``[a-zA-Z0-9-_]`` — so ``EB1`` does not
  match inside ``RHEB`` and ``PSD`` does not match inside ``PSD-95``
  (base_processor.py:1275-1296).
- ``parse_choice_response`` (M10): token scan; strip non-alpha characters
  from each whitespace token, first case-insensitive member of the choice
  set wins, else ``'None'``; result lower-cased (base_processor.py:1336-1345).
- ``parse_containment_response`` (M11, the reference's "kbase" variant):
  lower-case containment over choices after removing the query entity;
  multi-hit disambiguated by the gold label (base_processor.py:1309-1332).

These are per-row Python (regex) by necessity, but they run inside
``map_batches`` over whole Arrow batches so the per-call overhead is
amortized; the boundary regexes are compiled once at module import.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

_BOUNDARY = re.compile(r"[a-zA-Z0-9\-_]")
_NON_ALPHA = re.compile(r"[^a-zA-Z]")


def parse_entity_response(response: str, gold: Sequence[str]) -> list[str]:
    """Gold-guided mention matching with boundary-character rules (M9).

    Returns the subset of ``gold`` names found in ``response`` with clean
    boundaries, in gold order (the reference appends in gold-iteration order
    too, base_processor.py:1269-1298).  Gold names are ``strip()``-ed first.

    INTENTIONAL fidelity deviation: the reference passes the raw gold name
    to ``re.finditer`` (base_processor.py:1275), so a name containing regex
    metacharacters (``C(2)``, ``IL-1+``) is silently treated as a PATTERN —
    matching wrong spans or raising.  This implementation escapes the name
    (``re.escape``) and matches it literally; for metacharacter-free names
    (all benchmark vocabularies) the two are identical.  A parity audit
    should expect divergence only on metacharacter-bearing gold names.
    """
    found: list[str] = []
    for item in gold:
        item = item.strip()
        if not item:
            continue
        for match in re.finditer(re.escape(item), response):
            s, e = match.start(), match.end()
            prev_part = s != 0 and bool(_BOUNDARY.match(response[s - 1]))
            next_part = e != len(response) and bool(_BOUNDARY.match(response[e]))
            if not prev_part and not next_part:
                found.append(item)
                break
    return found


def parse_choice_response(response: str, choices: Sequence[str]) -> str:
    """First-token-in-choice-set scan (M10); lower-cased; 'none' fallback."""
    lowered = [c.lower() for c in choices]
    for token in response.split():
        token = _NON_ALPHA.sub("", token)
        if token.lower() in lowered:
            return token.lower()
    return "none"


def parse_containment_response(
    response: str, entity: str, choices: Sequence[str], gold: str | None = None
) -> str:
    """Substring containment over choices after removing the entity (M11)."""
    response = response.lower().replace(entity.lower(), "")
    hits = [c.lower() for c in choices if c.lower() in response]
    if len(hits) == 1:
        return hits[0]
    if len(hits) > 1 and gold is not None:
        for h in hits:
            if h == gold:
                return h
    return "None"


_PAIR = re.compile(r"([^,()]+?)\s*\(([^)]+)\)")


def parse_entity_type_pairs(response: str) -> list[tuple[str, str]]:
    """Free-form 'Name (type), Name2 (type2)' → [(name, type), ...].

    The open-extraction parse for the kbase ``entity_and_entity_type`` task
    (run_model.py:549; the reference dumps this task's raw results as JSON,
    run_model.py:752-762, rather than aligning them).  Leading 'Answer:'
    markers are ignored; names/types are whitespace-trimmed; empty names
    dropped.
    """
    text = response.split("Answer:", 1)[-1]
    out = []
    for m in _PAIR.finditer(text):
        name = m.group(1).strip().strip(".")
        typ = m.group(2).strip()
        if name and typ:
            out.append((name, typ))
    return out
