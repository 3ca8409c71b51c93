"""MentionDetector — stateful vocabulary-automaton stage (SURVEY §7.1).

Finds candidate entity mentions in document content with the reference's
boundary semantics (base_processor.py:1275-1296): a surface form matches only
where the adjacent characters are not in ``[a-zA-Z0-9-_]`` — ``EB1`` never
matches inside ``RHEB1``, ``PSD`` never inside ``PSD-95``.

Implemented as a single compiled alternation with lookarounds, longest
alternative first (so ``PSD-95`` wins over ``PSD`` at the same offset) —
equivalent to the reference's per-gold-name ``re.finditer`` scan for
non-overlapping vocabularies, but one pass over the text instead of
|vocab| passes.

Usage (actor pool so the automaton compiles once per worker):

    vocab_ref = ray.put(vocab_list)
    ds.map_batches(MentionDetector, fn_constructor_kwargs={"vocab": vocab_ref},
                   batch_format="pyarrow", concurrency=8)
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray

_BOUNDARY_CLASS = "[a-zA-Z0-9\\-_]"


def compile_vocab_pattern(vocab: list[str]) -> re.Pattern:
    alts = sorted({v.strip() for v in vocab if v.strip()}, key=len, reverse=True)
    body = "|".join(re.escape(v) for v in alts)
    return re.compile(
        f"(?<!{_BOUNDARY_CLASS})(?:{body})(?!{_BOUNDARY_CLASS})"
    )


class MentionDetector:
    """Actor-pool callable: content → one row per detected mention.

    Output columns: carried id columns + (mention, span_start, span_end).
    """

    def __init__(
        self,
        vocab,
        text_col: str = "content",
        id_cols: tuple[str, ...] = ("content_sha256",),
    ):
        if isinstance(vocab, ray.ObjectRef):
            vocab = ray.get(vocab)
        self.pattern = compile_vocab_pattern(list(vocab))
        self.text_col = text_col
        self.id_cols = list(id_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = {c: batch[c].to_pylist() for c in self.id_cols}
        out: dict[str, list] = {c: [] for c in self.id_cols}
        out.update({"mention": [], "span_start": [], "span_end": []})
        for i, text in enumerate(texts):
            for m in self.pattern.finditer(text):
                for c in self.id_cols:
                    out[c].append(ids[c][i])
                out["mention"].append(m.group(0))
                out["span_start"].append(m.start())
                out["span_end"].append(m.end())
        return pa.table(
            {
                **{c: pa.array(out[c]) for c in self.id_cols},
                "mention": pa.array(out["mention"], type=pa.string()),
                "span_start": pa.array(out["span_start"], type=pa.int32()),
                "span_end": pa.array(out["span_end"], type=pa.int32()),
            }
        )
