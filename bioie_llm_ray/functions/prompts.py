"""Prompt-template registry (SURVEY §2.3 M5/M6).

The reference ships 12 model-family prompter classes (~2,100 LoC of format
lambdas, src/prompters/*.py) dispatched by model name
(base_processor.py:1401-1568).  Here templates are data: a ``PromptTemplates``
record per (family, dataset) in a registry, with a stable hash recorded in
partition lineage (north rule).  Adding a model family = registering one
record, not subclassing.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, fields


@dataclass(frozen=True)
class PromptTemplates:
    """Format strings use named placeholders; ``{entity}``, ``{e1}``, ``{e2}``,
    ``{choices}`` and ``{answer}``."""

    entity_q: str
    entity_a: str
    relation_q: str
    relation_a: str
    relation_type_q: str
    relation_type_a: str

    def hash(self) -> str:
        """Stable template hash for lineage manifests."""
        blob = "\x1f".join(getattr(self, f.name) for f in fields(self))
        return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


DEFAULT_TEMPLATES = PromptTemplates(
    entity_q="Question: Which proteins does {entity} interact with?\nAnswer: ",
    entity_a="{answer}\n\n",
    relation_q="Question: Does {e1} interact with {e2}? Answer yes or no.\nAnswer: ",
    relation_a="{answer}\n\n",
    relation_type_q=(
        "Sentence: {text}\nQuestion: What is the relation between {e1} and "
        "{e2}? Choose one of: {choices}.\nAnswer: "
    ),
    relation_type_a="{answer}\n\n",
)

KEGG_TEMPLATES = PromptTemplates(
    entity_q="Question: Which genes belong to the pathway {entity}?\nAnswer: ",
    entity_a="{answer}\n\n",
    relation_q="Question: Is gene {e1} a member of pathway {e2}? Answer yes or no.\nAnswer: ",
    relation_a="{answer}\n\n",
    relation_type_q=(
        "Sentence: {text}\nQuestion: relation between {e1} and {e2}? "
        "Choose one of: {choices}.\nAnswer: "
    ),
    relation_type_a="{answer}\n\n",
)

REGISTRY: dict[tuple[str, str], PromptTemplates] = {
    ("default", "string"): DEFAULT_TEMPLATES,
    ("default", "kegg"): KEGG_TEMPLATES,
    ("default", "indra"): DEFAULT_TEMPLATES,
}


def get_templates(model_family: str = "default", dataset: str = "string") -> PromptTemplates:
    try:
        return REGISTRY[(model_family, dataset)]
    except KeyError:
        raise KeyError(
            f"no templates registered for ({model_family!r}, {dataset!r}); "
            f"known: {sorted(REGISTRY)}"
        ) from None


def build_shot_prefix(
    templates: PromptTemplates, task: str, shots: list[dict]
) -> str:
    """Few-shot prefix string from sampled examples (SURVEY §2.4 A4).

    Computed once on the driver from a deterministic sample and broadcast
    into the prompt-builder stage as a constant.
    """
    parts = []
    for s in shots:
        if task == "entity":
            parts.append(
                templates.entity_q.format(entity=s["entity"])
                + templates.entity_a.format(answer=", ".join(s["answer"]))
            )
        elif task == "relation":
            parts.append(
                templates.relation_q.format(e1=s["e1"], e2=s["e2"])
                + templates.relation_a.format(answer=s["answer"])
            )
        elif task == "relation_type":
            parts.append(
                templates.relation_type_q.format(
                    text=s["text"], e1=s["e1"], e2=s["e2"], choices=s["choices"]
                )
                + templates.relation_type_a.format(answer=s["answer"])
            )
        else:
            raise ValueError(f"unknown task {task!r}")
    return "".join(parts)
