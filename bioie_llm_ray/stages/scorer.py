"""Scorer actor stages — the "LLM" of the pipeline (SURVEY §2.4 A1/A2).

The reference loads a HF causal LLM once per process and runs batched
``generate`` (run_model.py:75-385, base_processor.py:121-207).  Here a scorer
is any callable class with the contract:

    __init__: load model/state once per actor (weights, KB index, tokenizer)
    __call__: Arrow batch in (``entity``, ``text`` prompt columns) →
              same batch + ``response`` string column out

Ship it as ``ds.map_batches(ScorerCls, fn_constructor_kwargs=...,
batch_format="pyarrow", concurrency=N, num_cpus=c[, num_gpus=g])``.

``MockScorer`` is the deterministic vocabulary-lookup model used for tests
and parity scoring (real LLM outputs are nondeterministic and no GPU/model
exists in this environment, SURVEY §7.5).  Its error injection is stable
hash-based, so every run — at any parallelism — produces identical responses.

``HFScorer`` is the real-model stage: same I/O contract, gated behind a
transformers import (not installed here).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray


def _stable_frac(key: str) -> float:
    """Deterministic uniform [0,1) from a string key (md5-based)."""
    h = int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "big")
    return h / 2**64


class MockScorer:
    """Deterministic mock LLM with configurable, hash-stable error rates.

    kind="entity":       kb = {entity: [neighbors]}; responds with the gold
                         neighbor list, dropping each with prob ``miss_rate``
                         and appending a distractor, comma-joined.
    kind="relation":     kb = {"e1\\x1fe2", ...} positive pair set; responds
                         yes/no, flipped with prob ``flip_rate``.
    kind="relation_type": kb = {statement_id: label}; responds the label,
                         flipped to another choice with prob ``flip_rate``.
    """

    def __init__(
        self,
        kind: str,
        kb,
        choices: list[str] | None = None,
        miss_rate: float = 0.03,
        flip_rate: float = 0.03,
        key_col: str = "entity",
    ):
        if isinstance(kb, ray.ObjectRef):
            kb = ray.get(kb)
        self.kind = kind
        self.kb = kb
        self.choices = choices or []
        self.miss_rate = miss_rate
        self.flip_rate = flip_rate
        self.key_col = key_col

    def _respond(self, key: str) -> str:
        if self.kind == "entity":
            gold = self.kb.get(key, [])
            kept = [
                g
                for g in gold
                if _stable_frac(f"miss|{key}|{g}") >= self.miss_rate
            ]
            extra = (
                [" and maybe UNKNOWNPROT"]
                if _stable_frac(f"extra|{key}") < self.miss_rate
                else []
            )
            return "Answer: " + ", ".join(kept) + "".join(extra)
        if self.kind == "relation":
            # PPI is symmetric (string_reader.py:112-120 inserts both
            # directions): accept either orientation of the pair key
            parts = key.split("\x1f")
            rev = "\x1f".join(reversed(parts)) if len(parts) == 2 else key
            truth = key in self.kb or rev in self.kb
            if _stable_frac(f"flip|{key}") < self.flip_rate:
                truth = not truth
            return "yes" if truth else "no"
        if self.kind == "containment":
            # free-form sentence embedding the label (kbase-style parse, M11)
            label = self.kb.get(key, "unknown")
            if _stable_frac(f"flip|{key}") < self.flip_rate and self.choices:
                idx = int(_stable_frac(f"pick|{key}") * len(self.choices))
                label = self.choices[idx % len(self.choices)]
            return f"I would say this describes a {label} event overall."
        if self.kind == "entity_and_entity_type":
            # open extraction: kb = {doc_id: ["Name (type)", ...]}; each gold
            # mention dropped with prob miss_rate (hash-stable)
            gold = self.kb.get(key, [])
            kept = [
                g
                for g in gold
                if _stable_frac(f"miss|{key}|{g}") >= self.miss_rate
            ]
            return "Answer: " + ", ".join(kept)
        if self.kind == "relation_type":
            # prompt rows pack (id, e1, span, e2, span) into the key; the
            # statement id is the first \x1f-segment
            label = self.kb.get(key, self.kb.get(key.split("\x1f")[0], "None"))
            if _stable_frac(f"flip|{key}") < self.flip_rate and self.choices:
                idx = int(_stable_frac(f"pick|{key}") * len(self.choices))
                label = self.choices[idx % len(self.choices)]
            return f"Answer: {label}"
        raise ValueError(f"unknown scorer kind {self.kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        responses = [self._respond(k) for k in keys]
        return batch.append_column(
            "response", pa.array(responses, type=pa.string())
        )


class HFScorer:
    """Real HF-model scorer stage — same contract as MockScorer.

    Mirrors the reference's load-once-per-process model setup
    (run_model.py:638-651) and batched generate → prompt-slice → decode loop
    (base_processor.py:169-203) as one actor:

        ds.map_batches(HFScorer, fn_constructor_kwargs={
                           "model_id": ..., "max_new_tokens": 128},
                       batch_format="pyarrow", concurrency=n_gpus,
                       num_gpus=1, batch_size=16)

    transformers/torch are not available in this environment; the constructor
    raises with a clear message (the Ray-side plumbing is what's tested).
    """

    def __init__(self, model_id: str, max_new_tokens: int = 128, **generate_kwargs):
        try:
            import torch  # noqa: F401
            from transformers import AutoModelForCausalLM, AutoTokenizer
        except ImportError as e:
            raise NotImplementedError(
                "HFScorer requires torch+transformers, which are not installed "
                "in this environment; use MockScorer for tests"
            ) from e
        self.tokenizer = AutoTokenizer.from_pretrained(model_id, padding_side="left")
        self.model = AutoModelForCausalLM.from_pretrained(model_id, device_map="auto")
        self.max_new_tokens = max_new_tokens
        self.generate_kwargs = generate_kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import torch

        prompts = batch["text"].to_pylist()
        inputs = self.tokenizer(
            prompts, return_tensors="pt", padding=True, truncation=True
        ).to(self.model.device)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=self.max_new_tokens, **self.generate_kwargs
            )
        gen = out[:, inputs["input_ids"].shape[1] :]
        responses = self.tokenizer.batch_decode(gen, skip_special_tokens=True)
        return batch.append_column(
            "response", pa.array(responses, type=pa.string())
        )
