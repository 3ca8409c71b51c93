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
    ``{text}``, ``{choices}`` and ``{answer}``.

    ``entity_type_q/a`` and ``entity_and_entity_type_q/a`` carry the
    reference's kbase-style containment tasks (run_model.py:549, 563-565)."""

    entity_q: str
    entity_a: str
    relation_q: str
    relation_a: str
    relation_type_q: str
    relation_type_a: str
    entity_type_q: str = (
        "Question: Given the options: {choices}, which one is the entity "
        "type of {entity} in this text? Text: {text}\n\nAnswer:"
    )
    entity_type_a: str = " {answer}\n\n"
    entity_and_entity_type_q: str = (
        "{text}\n\nQuestion: What are the biological entities and genetic "
        "tools in the text above?\n\nAnswer:"
    )
    entity_and_entity_type_a: str = " {answer}\n"

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

# ---------------------------------------------------------------------------
# Model-family templates, one record per (family, dataset).  Semantics mirror
# the ACTIVE (uncommented) lambdas of the reference's 12 prompter classes
# (src/prompters/*.py, dispatch base_processor.py:1401-1568); the ``{text}``
# placeholder carries the sentence the reference prepends before its
# "in the text above" questions (indra_processor.py).
# ---------------------------------------------------------------------------

# Shared building blocks (verbatim per-family phrasing below).
_INDRA_Q = (
    "{text}\n\nQuestion: Given the options: {choices}, which one is the "
    "relation type between {e1} and {e2} in the text above?\n\nAnswer:"
)
_KEGG_REL_Q = (
    'Question: Is the gene "{e1}" involved in the pathway "{e2}"?\n\nAnswer:'
)


def _family(
    string_entity_q: str,
    string_entity_a: str,
    string_relation_q: str,
    string_relation_a: str,
    kegg_entity_q: str,
    kegg_entity_a: str,
    kegg_relation_q: str = _KEGG_REL_Q,
    kegg_relation_a: str = " {answer}\n\n",
    indra_q: str = _INDRA_Q,
    indra_a: str = " {answer}\n\n",
    **extra,
) -> dict[str, PromptTemplates]:
    """(dataset → templates) for one model family."""
    return {
        "string": PromptTemplates(
            entity_q=string_entity_q,
            entity_a=string_entity_a,
            relation_q=string_relation_q,
            relation_a=string_relation_a,
            relation_type_q=indra_q,
            relation_type_a=indra_a,
            **extra,
        ),
        "kegg": PromptTemplates(
            entity_q=kegg_entity_q,
            entity_a=kegg_entity_a,
            relation_q=kegg_relation_q,
            relation_a=kegg_relation_a,
            relation_type_q=indra_q,
            relation_type_a=indra_a,
            **extra,
        ),
        "indra": PromptTemplates(
            entity_q=string_entity_q,
            entity_a=string_entity_a,
            relation_q=string_relation_q,
            relation_a=string_relation_a,
            relation_type_q=indra_q,
            relation_type_a=indra_a,
            **extra,
        ),
    }


# llama2_prompter.py:35-118 — shared verbatim by llama3 / llama3.1 / mistral /
# solar (their prompter files carry identical active lambdas).
_LLAMA_STYLE = dict(
    string_entity_q="QUESTION: Which proteins interact with {entity}?\nANSWER:",
    string_entity_a=" {answer}\n",
    string_relation_q=(
        "QUESTION: Do {e1} and {e2} interact with each other?\nANSWER:"
    ),
    string_relation_a=" {answer}\n",
    kegg_entity_q='QUESTION: Which genes are associated with "{entity}"?\nANSWER:',
    kegg_entity_a=" {answer}\n",
)

_PAPER_STYLE_EET = dict(
    # llama3_1_prompter.py:185 / mistral_prompter.py:184
    entity_and_entity_type_q=(
        "Question: Which biological entities and genetic tools are mentioned "
        "in this paper, and what are their types? Choose from the following "
        "options: {choices} Paper: {text}\n\nAnswer:"
    ),
)

_FAMILIES: dict[str, dict[str, PromptTemplates]] = {
    "default": {
        "string": DEFAULT_TEMPLATES,
        "kegg": KEGG_TEMPLATES,
        "indra": DEFAULT_TEMPLATES,
    },
    "llama2": _family(**_LLAMA_STYLE),
    "llama3": _family(**_LLAMA_STYLE),
    "llama3.1": _family(**_LLAMA_STYLE, **_PAPER_STYLE_EET),
    "mistral": _family(**_LLAMA_STYLE, **_PAPER_STYLE_EET),
    "solar": _family(**_LLAMA_STYLE),
    # mpt_prompter.py:96-97 re-binds the kegg entity question
    "mpt": _family(
        **{
            **_LLAMA_STYLE,
            "kegg_entity_q": (
                'QUESTION: Which genes are related to "{entity}"?\nANSWER:'
            ),
        }
    ),
    # falcon_prompter.py:41-104 — >>QUESTION<< / >>ANSWER<< markers
    "falcon": _family(
        string_entity_q=(
            ">>QUESTION<< Which proteins interact with {entity}?\n>>ANSWER<<"
        ),
        string_entity_a=" {answer}\n",
        string_relation_q=(
            ">>QUESTION<< Do {e1} and {e2} interact with each other?\n>>ANSWER<<"
        ),
        string_relation_a=" {answer}\n",
        kegg_entity_q=(
            '>>QUESTION<< Which genes are associated with "{entity}"?\n>>ANSWER<<'
        ),
        kegg_entity_a=" {answer}\n",
    ),
    # galactica_prompter.py:36-88 — </s> separators after answers
    "galactica": _family(
        string_entity_q="Question: Which proteins are related to {entity}?\n\nAnswer:",
        string_entity_a=" {answer}</s>\n\n",
        string_relation_q=(
            "Question: Are {e1} and {e2} related to each other?\n\nAnswer:"
        ),
        string_relation_a=" {answer}</s>\n\n",
        kegg_entity_q='Question: Which genes are involved in "{entity}"?\n\nAnswer:',
        kegg_entity_a=" {answer}</s>\n\n",
        kegg_relation_q=(
            'Question: Are "{e1}" and "{e2}" related to each other?\n\nAnswer:'
        ),
        kegg_relation_a=" {answer}</s>\n\n",
    ),
    # biogpt_prompter.py:34-97
    "biogpt": _family(
        string_entity_q="Question: Which proteins are related to {entity}?\n\nAnswer:",
        string_entity_a=" {answer}\n\n",
        string_relation_q=(
            "Question: Do {e1} and {e2} interact with each other?\n\nAnswer:"
        ),
        string_relation_a=" {answer}\n\n",
        kegg_entity_q='Question: Which genes are involved in "{entity}"?\n\nAnswer:',
        kegg_entity_a=" {answer}\n\n",
    ),
    # biomedlm_prompter.py:44-115 — inline "Answer:" markers, no newline
    "biomedlm": _family(
        string_entity_q="QUESTION: Which proteins interact with {entity}?\nANSWER:",
        string_entity_a=" {answer}\n",
        string_relation_q=(
            "Question: Do {e1} and {e2} interact with each other? Answer:"
        ),
        string_relation_a=" {answer}\n\n",
        kegg_entity_q='Question: Which genes are involved in "{entity}"? Answer:',
        kegg_entity_a=" {answer}\n\n",
        kegg_relation_q=(
            'Question: Is the gene "{e1}" involved in the pathway "{e2}"? Answer:'
        ),
        indra_q=(
            "{text}\n\nQuestion: Given the options: {choices}, which one is "
            "the relation type between {e1} and {e2} in the text above? Answer:"
        ),
    ),
    # alpaca_prompter.py:38-97 — completion-style entity prompts
    "alpaca": _family(
        string_entity_q='The following proteins interact with the protein "{entity}":',
        string_entity_a=" {answer}\n\n",
        string_relation_q=(
            "Question: Do {e1} and {e2} interact with each other?\n\nAnswer:"
        ),
        string_relation_a=" {answer}\n\n",
        kegg_entity_q='The following genes are involved in "{entity}" pathway:',
        kegg_entity_a=" {answer}\n\n",
    ),
    # rst_prompter.py:37-87
    "rst": _family(
        string_entity_q="Question: Which proteins interact with {entity}? Answer:",
        string_entity_a=" {answer}\n",
        string_relation_q=(
            "Question: Are {e1} and {e2} related to each other?\n\nAnswer:"
        ),
        string_relation_a=" {answer}\n\n",
        kegg_entity_q='Question: Which genes are involved in "{entity}"?\n\nAnswer:',
        kegg_entity_a=" {answer}\n\n",
        kegg_relation_q=(
            'Question: Are "{e1}" and "{e2}" related to each other?\n\nAnswer:'
        ),
    ),
}

REGISTRY: dict[tuple[str, str], PromptTemplates] = {
    (fam, ds): t
    for fam, per_ds in _FAMILIES.items()
    for ds, t in per_ds.items()
}

# Model-name → family resolution, mirroring the reference's dispatch keys
# (base_processor.py:1401-1568: 'Galactica', 'LLaMA', 'Alpaca', 'LLaMA-2',
# 'LLaMA-3', 'LLaMA-3.1', 'Mistral', 'MPT', 'Falcon', 'SOLAR', 'RST',
# 'BioGPT', 'BioMedLM').  Ordered: most-specific substring first.
_NAME_PATTERNS: list[tuple[str, str]] = [
    ("llama-3.1", "llama3.1"),
    ("llama3.1", "llama3.1"),
    ("llama-3", "llama3"),
    ("llama3", "llama3"),
    ("llama-2", "llama2"),
    ("llama2", "llama2"),
    ("llama", "llama2"),  # LLaMA-v1 shares the llama prompt shape
    ("mixtral", "mistral"),
    ("mistral", "mistral"),
    ("mpt", "mpt"),
    ("falcon", "falcon"),
    ("galactica", "galactica"),
    ("biogpt", "biogpt"),
    ("biomedlm", "biomedlm"),
    ("solar", "solar"),
    ("alpaca", "alpaca"),
    ("rst", "rst"),
]


def resolve_family(model_name: str) -> str:
    """Model name/path → template family ('default' when unrecognized)."""
    low = model_name.lower()
    for pat, fam in _NAME_PATTERNS:
        if pat in low:
            return fam
    return "default"


def get_templates(model_family: str = "default", dataset: str = "string") -> PromptTemplates:
    """Resolve templates by family (or raw model name) and dataset."""
    key = (model_family, dataset)
    if key not in REGISTRY and model_family not in _FAMILIES:
        key = (resolve_family(model_family), dataset)
    try:
        return REGISTRY[key]
    except KeyError:
        raise KeyError(
            f"no templates registered for ({model_family!r}, {dataset!r}); "
            f"known families: {sorted(_FAMILIES)}"
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
