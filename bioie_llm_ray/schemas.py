"""Explicit pyarrow schemas for every logical table in the engine.

The reference keeps schemas implicit in dict shapes (SURVEY.md §1.3); here
each stage boundary has a fixed Arrow schema, validated in tests.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input table (BASELINE.json input_hint): source-code repositories.
DOCS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# docs + per-row invariant column (north rule: sha256(content) equality).
DOCS_SHA = DOCS.append(pa.field("content_sha256", pa.string()))

# STRING-shaped vocabulary/gold tables (FIXTURES.md §2,
# reference src/data_readers/string_reader.py:92-106).
PROTEIN_INFO = pa.schema(
    [
        ("string_protein_id", pa.string()),
        ("preferred_name", pa.string()),
        ("protein_size", pa.int32()),
        ("annotation", pa.string()),
    ]
)

PROTEIN_LINKS = pa.schema(
    [
        ("protein_1_id", pa.string()),
        ("protein_2_id", pa.string()),
        ("combined_score", pa.int32()),
    ]
)

# Canonical symmetric edge table (replaces the reference's in-memory
# adjacency dict, string_reader.py:112-122).
EDGES = pa.schema([("src", pa.string()), ("dst", pa.string())])

# Adjacency = groupby(src) collect_distinct(dst).
ADJACENCY = pa.schema([("src", pa.string()), ("neighbors", pa.list_(pa.string()))])

NEGATOME_PAIRS = pa.schema([("p1", pa.string()), ("p2", pa.string())])

# KEGG-shaped tables (FIXTURES.md §3, kegg_reader.py:107-177).
KEGG_PATHWAYS = pa.schema([("pathway_id", pa.string()), ("pathway_name", pa.string())])
KEGG_GENES = pa.schema([("gene_id", pa.string()), ("aliases", pa.list_(pa.string()))])
KEGG_PATHWAY_GENES = pa.schema([("gene_id", pa.string()), ("pathway_id", pa.string())])
# Normalized pathway→gene edge table with alias list (SURVEY §1.1).
PATHWAY_GENE = pa.schema(
    [
        ("pathway", pa.string()),
        ("gene_primary", pa.string()),
        ("aliases", pa.list_(pa.string())),
    ]
)

# INDRA-shaped statements (indra_reader.py:38-79) — struct columns instead of
# the reference's name_start_end string packing (indra_processor.py:186).
ENTITY_MENTION = pa.struct(
    [("name", pa.string()), ("span_start", pa.int32()), ("span_end", pa.int32())]
)
INDRA_STATEMENTS = pa.schema(
    [
        ("id", pa.string()),
        ("text", pa.string()),
        ("entity_1", ENTITY_MENTION),
        ("entity_2", ENTITY_MENTION),
        ("rel_type", pa.string()),
    ]
)

# Prompt/example row (string_processor.py:371-378 et al.).
PROMPT_ROW = pa.schema(
    [("entity", pa.string()), ("text", pa.string()), ("answer", pa.list_(pa.string()))]
)

# Canonical emitted triples (FIXTURES.md §5).
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("src_sha", pa.string()),
    ]
)

# Prediction rows flowing into metric aggregation — replaces the reference's
# driver-side parallel lists (base_processor.py:81, SURVEY §1.1).
PREDICTIONS = pa.schema(
    [("src", pa.string()), ("pred", pa.string()), ("true", pa.string())]
)

INDRA_RELATION_TYPES = (
    "Activation",
    "Inhibition",
    "Phosphorylation",
    "Dephosphorylation",
    "Ubiquitination",
    "Deubiquitination",
)
