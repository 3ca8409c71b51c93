"""Serial (no-Ray) oracle builders for the MockScorer benchmark tasks.

The kg_* driver queries are deterministic end-to-end: fixture KB
(``fixtures.make_kb``, seed-fixed) → hash-based sampling → MockScorer
(hash-stable responses) → parsers → alignment.  That makes their expected
output computable on the driver in plain Python — no Dataset, no actor pool,
no shuffle — by walking the same fixture KB and reusing the engine's own
scalar kernels (scorer response function, parsers, sort_and_pad, hash order).

Registering these expected tables as DuckDB ``VALUES`` relations upgrades
the kg_* checks from rows-only to full row/schema/value-hash verification of
the DISTRIBUTED plumbing: pool filters, hash top-n sampling across blocks,
prompt construction, the actor-pool scorer stage, parse/align explosion and
triple emission must all agree with this serial walk.  (Reference-semantics
parity is covered separately by ``parity.py``.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import fixtures
from .functions.align import sort_and_pad
from .functions.hashing import stable_hash_u64
from .functions.parsing import (
    parse_choice_response,
    parse_containment_response,
    parse_entity_response,
)
from .schemas import INDRA_RELATION_TYPES
from .stages.scorer import MockScorer

_SEP = "\x1f"

ENTITY_TYPE_CHOICES = ["kinase", "phosphatase", "ligase"]


def serial_hash_top_n(keys: list[str], n: int) -> list[str]:
    """n distinct keys with smallest stable hash, ties by key — the exact
    order contract of ``stages.sample.distributed_hash_top_n``."""
    uniq = sorted(set(keys))
    if not uniq:
        return []
    h = stable_hash_u64(uniq)
    order = np.lexsort((np.array(uniq), h))
    return [uniq[int(i)] for i in order[:n]]


def expected_kg_string_entity(
    test_size: int = 30,
    n_shots: int = 2,
    k: int = 10,
    min_test_list_len: int = 10,
    miss_rate: float = 0.03,
) -> pd.DataFrame:
    """Serial walk of ``_kg_string_entity`` (tasks.string_entity_task)."""
    kb = fixtures.make_kb()
    gold = {s: sorted(nb) for s, nb in kb.adjacency.items()}
    scorer = MockScorer(kind="entity", kb=gold, miss_rate=miss_rate)
    pool = [s for s, nb in kb.adjacency.items() if len(nb) >= min_test_list_len]
    picked = serial_hash_top_n(pool, test_size + n_shots)
    test_keys = sorted(picked[n_shots:])
    rows = []
    for src in test_keys:
        gold_list = [g.strip() for g in sorted(set(kb.adjacency[src]))]
        pred = parse_entity_response(scorer._respond(src), gold_list)
        pred, true = sort_and_pad(pred, gold_list, max_entity_list_len=k)
        rows.extend(
            {"src": src, "pred": p, "true": t} for p, t in zip(pred, true)
        )
    return (
        pd.DataFrame(rows).sort_values(["src", "pred"]).reset_index(drop=True)
    )


def expected_kg_string_relation(
    n_pairs_per_side: int = 50, flip_rate: float = 0.03
) -> pd.DataFrame:
    """Serial walk of ``_kg_string_relation`` (tasks.string_relation_task)."""
    kb = fixtures.make_kb()
    pos_pairs = {
        f"{min(a, b)}{_SEP}{max(a, b)}"
        for a, nb in kb.adjacency.items()
        for b in nb
    }
    scorer = MockScorer(kind="relation", kb=pos_pairs, flip_rate=flip_rate)
    pos_keys = [
        f"{a}{_SEP}{b}"
        for a, nb in kb.adjacency.items()
        for b in nb
        if a < b
    ]
    neg_keys = [f"{a}{_SEP}{b}" for a, b in kb.negatome]
    rows = []
    for keys, label in [(pos_keys, "yes"), (neg_keys, "no")]:
        for key in serial_hash_top_n(keys, n_pairs_per_side):
            pred = parse_choice_response(scorer._respond(key), ["yes", "no"])
            rows.append(
                {"src": key.replace(_SEP, "|"), "pred": pred, "true": label}
            )
    return pd.DataFrame(rows).sort_values("src").reset_index(drop=True)


def expected_kg_kegg_entity(
    top_n: int = 8, k: int = 10, miss_rate: float = 0.03
) -> pd.DataFrame:
    """Serial walk of ``_kg_kegg_entity`` (tasks.kegg_entity_task)."""
    kb = fixtures.make_kb()
    gold_map = {
        kb.pathways[pid]: sorted({kb.gene_aliases[g][0] for g in gids})
        for pid, gids in kb.pathway_genes.items()
    }
    scorer = MockScorer(kind="entity", kb=gold_map, miss_rate=miss_rate)
    top = [kb.pathways[p] for p in kb.dose_ranking["low"][:top_n]]
    rows = []
    for pathway in sorted(top):
        gold_list = sorted(set(gold_map[pathway]))
        pred = parse_entity_response(scorer._respond(pathway), gold_list)
        pred, true = sort_and_pad(pred, gold_list, max_entity_list_len=k)
        rows.extend(
            {"src": pathway, "pred": p, "true": t} for p, t in zip(pred, true)
        )
    return (
        pd.DataFrame(rows).sort_values(["src", "pred"]).reset_index(drop=True)
    )


def expected_kg_kegg_relation(
    n_pairs_per_side: int = 50, flip_rate: float = 0.03
) -> pd.DataFrame:
    """Serial walk of ``_kg_kegg_relation`` (tasks.kegg_relation_task)."""
    kb = fixtures.make_kb()
    pos_keys = {
        f"{alias}{_SEP}{kb.pathways[pid]}"
        for pid, gids in kb.pathway_genes.items()
        for gid in gids
        for alias in kb.gene_aliases[gid]
    }
    member_gids = {g for gids in kb.pathway_genes.values() for g in gids}
    member_aliases = {
        a for gid in member_gids for a in kb.gene_aliases[gid]
    }
    pathways = sorted(set(kb.pathways.values()))
    neg_keys = [
        f"{a}{_SEP}{p}"
        for a in sorted(member_aliases)
        for p in pathways
        if f"{a}{_SEP}{p}" not in pos_keys
    ]
    scorer = MockScorer(kind="relation", kb=pos_keys, flip_rate=flip_rate)
    rows = []
    for keys, label in [(sorted(pos_keys), "yes"), (neg_keys, "no")]:
        for key in serial_hash_top_n(keys, n_pairs_per_side):
            pred = parse_choice_response(scorer._respond(key), ["yes", "no"])
            rows.append(
                {"src": key.replace(_SEP, "|"), "pred": pred, "true": label}
            )
    return pd.DataFrame(rows).sort_values("src").reset_index(drop=True)


def expected_kg_indra_triples(
    per_class: int = 8, flip_rate: float = 0.03
) -> pd.DataFrame:
    """Serial walk of ``_kg_indra`` (tasks.indra_relation_type_task triples)."""
    kb = fixtures.make_kb()
    label_map = {
        s["id"]: s["rel_type"] for split in kb.indra.values() for s in split
    }
    choices = list(INDRA_RELATION_TYPES[:6])
    scorer = MockScorer(kind="relation_type", kb=label_map, flip_rate=flip_rate)
    # M2 unique-mention filter on raw substring counts (readers.py:252-257)
    stmts = [
        s
        for s in kb.indra["test"]
        if s["text"].count(s["entity_1"][0]) == 1
        and s["text"].count(s["entity_2"][0]) == 1
    ]
    by_class: dict[str, list[dict]] = {}
    for s in stmts:
        by_class.setdefault(s["rel_type"], []).append(s)
    rows = []
    for rel, members in by_class.items():
        ids = {s["id"]: s for s in members}
        for sid in serial_hash_top_n(list(ids), per_class):
            s = ids[sid]
            (e1, (s1, e1e)) = s["entity_1"][0], tuple(s["entity_1"][1])
            (e2, (s2, e2e)) = s["entity_2"][0], tuple(s["entity_2"][1])
            key = _SEP.join(
                [sid, e1, str(s1), str(e1e), e2, str(s2), str(e2e)]
            )
            pred = parse_choice_response(scorer._respond(key), choices)
            if pred != "none":
                rows.append(
                    {"subj": e1, "pred": pred, "obj": e2, "src_sha": sid}
                )
    return (
        pd.DataFrame(rows)
        .sort_values(["subj", "pred", "obj", "src_sha"])
        .reset_index(drop=True)
    )


def entity_type_inputs() -> list[dict]:
    """Deterministic (entity, text, answer) rows for the kg_entity_types
    query: every fixture protein typed by cycling the choice list."""
    kb = fixtures.make_kb()
    return [
        {
            "entity": name,
            "text": f"the protein {name} was assayed in vitro",
            "answer": ENTITY_TYPE_CHOICES[i % len(ENTITY_TYPE_CHOICES)],
        }
        for i, name in enumerate(kb.proteins)
    ]


def expected_kg_entity_types(flip_rate: float = 0.02) -> pd.DataFrame:
    """Serial walk of the kg_entity_types query (tasks.entity_type_task)."""
    inputs = entity_type_inputs()
    kb_types = {r["entity"]: r["answer"] for r in inputs}
    scorer = MockScorer(
        kind="containment",
        kb=kb_types,
        flip_rate=flip_rate,
        choices=ENTITY_TYPE_CHOICES,
    )
    rows = [
        {
            "src": r["entity"],
            "pred": parse_containment_response(
                scorer._respond(r["entity"]), r["entity"], ENTITY_TYPE_CHOICES
            ),
            "true": r["answer"],
        }
        for r in inputs
    ]
    return pd.DataFrame(rows).sort_values("src").reset_index(drop=True)


def expected_kg_chain_agreement(
    test_size: int = 20,
    n_shots: int = 1,
    k: int = 10,
    min_test_list_len: int = 10,
    miss_rate: float = 0.1,
    flip_rate: float = 0.02,
) -> pd.DataFrame:
    """Serial walk of ``_kg_chain_agreement`` (entity task → chained yes/no
    verify → full result_comparer aggregate, flattened)."""
    kb = fixtures.make_kb()
    gold = {s: sorted(nb) for s, nb in kb.adjacency.items()}
    ent_scorer = MockScorer(kind="entity", kb=gold, miss_rate=miss_rate)
    pool = [s for s, nb in kb.adjacency.items() if len(nb) >= min_test_list_len]
    picked = serial_hash_top_n(pool, test_size + n_shots)
    ent_rows = []
    for src in picked[n_shots:]:
        gold_list = [g.strip() for g in sorted(set(kb.adjacency[src]))]
        pred = parse_entity_response(ent_scorer._respond(src), gold_list)
        pred, true = sort_and_pad(pred, gold_list, max_entity_list_len=k)
        ent_rows.extend(
            {"src": src, "pred": p, "true": t} for p, t in zip(pred, true)
        )
    pos_pairs = {
        f"{min(a, b)}{_SEP}{max(a, b)}" for a, nb in gold.items() for b in nb
    }
    rel_scorer = MockScorer(kind="relation", kb=pos_pairs, flip_rate=flip_rate)
    chained = [r for r in ent_rows if r["pred"] != "NONE"]
    merged = []
    for r in chained:
        key = f"{r['src']}{_SEP}{r['pred']}"
        rel_pred = parse_choice_response(rel_scorer._respond(key), ["yes", "no"])
        merged.append(
            {"ent_ok": r["pred"] == r["true"], "rel_ok": rel_pred == "yes"}
        )
    m = pd.DataFrame(merged)
    n = len(m)
    n_yes = int(m["rel_ok"].sum()) if n else 0
    agree = (m["ent_ok"] == m["rel_ok"]) if n else pd.Series(dtype=bool)
    sub = m[m["ent_ok"]] if n else m
    flat = {
        "n_pairs": n,
        "n_confirmed": n_yes,
        "agreement": n_yes / n if n else 0.0,
        "joint_accuracy": float(agree.mean()) if n else 0.0,
        "n_joint_agree": int(agree.sum()) if n else 0,
        "joint_micro_f1": float(agree.mean()) if n else 0.0,
        "n_entity_correct": len(sub),
        "entity_correct_accuracy": float(sub["rel_ok"].mean()) if len(sub) else 0.0,
        "entity_correct_micro_f1": float(sub["rel_ok"].mean()) if len(sub) else 0.0,
        "confusion_yes_yes": int(sub["rel_ok"].sum()) if len(sub) else 0,
        "confusion_yes_no": int((~sub["rel_ok"]).sum()) if len(sub) else 0,
        "confusion_no_yes": 0,
        "confusion_no_no": 0,
    }
    return pd.DataFrame([flat])


# The marker lexicons of functions.text.detect_language, rendered as SQL
# VALUES; priority = iteration order (ties resolve to the earliest lang).
def language_id_sql() -> str:
    from .functions.text import _LANG_MARKERS

    markers = ",\n".join(
        f"('{lang}', {prio}, '{w}')"
        for prio, (lang, words) in enumerate(_LANG_MARKERS.items())
        for w in sorted(words)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents),
        m AS (SELECT * FROM (VALUES
{markers}
        ) AS v(lang, prio, token)),
        hits AS (
            SELECT t.doc_id, m.lang, m.prio, count(*) AS n
            FROM toks t JOIN m ON t.token = m.token
            GROUP BY 1, 2, 3),
        best AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY n DESC, prio) AS rk
            FROM hits)
        SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_detected
        FROM documents d
        LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rk = 1
    """


EET_CHOICES = ["plasmid", "promoter", "reporter"]


def entity_and_entity_type_inputs() -> list[dict]:
    """Deterministic (doc_id, text, answer) rows for kg_entity_extraction:
    each fixture protein doc carries 1-3 gold 'Name (type)' mentions."""
    kb = fixtures.make_kb()
    rows = []
    for i, name in enumerate(sorted(kb.adjacency)):
        gold = [
            f"{name} ({EET_CHOICES[i % 3]})",
        ]
        if i % 2 == 0:
            gold.append(f"{name}X ({EET_CHOICES[(i + 1) % 3]})")
        rows.append(
            {
                "doc_id": f"d{i:04d}",
                "text": f"construct report for {name}",
                "answer": gold,
            }
        )
    return rows


def expected_kg_entity_extraction(miss_rate: float = 0.05) -> pd.DataFrame:
    """Serial walk of the kg_entity_extraction query
    (tasks.entity_and_entity_type_task over the fixture docs)."""
    from .functions.parsing import parse_entity_type_pairs

    rows = entity_and_entity_type_inputs()
    kb = {r["doc_id"]: r["answer"] for r in rows}
    scorer = MockScorer(
        kind="entity_and_entity_type",
        kb=kb,
        miss_rate=miss_rate,
        key_col="entity",
    )
    out = []
    for r in rows:
        gold_set = set(r["answer"])
        for name, typ in parse_entity_type_pairs(scorer._respond(r["doc_id"])):
            out.append(
                {
                    "src": r["doc_id"],
                    "pred_entity": name,
                    "pred_type": typ,
                    "hit": f"{name} ({typ})" in gold_set,
                }
            )
    return (
        pd.DataFrame(out)
        .sort_values(["src", "pred_entity"])
        .reset_index(drop=True)
    )


def expected_kg_code_triples(n_docs: int = 200) -> pd.DataFrame:
    """Serial gold for the flagship extraction over the input_hint docs
    table: ``make_docs_table`` derives each row's triples alongside the
    content (fixtures.py), so the expected canonical set is their distinct
    union — no re-parse, a genuinely independent derivation."""
    kb = fixtures.make_kb()
    _, gold = fixtures.make_docs_table(kb, n_rows=n_docs)
    rows = sorted({t for row in gold for t in row})
    return pd.DataFrame(rows, columns=["subj", "pred", "obj"])


def expected_kg_incremental_triples(
    ts_b: int = 2_000_000_000, relation: str = "co_imported_with"
) -> pd.DataFrame:
    """Serial gold for the incremental code-KG refresh: latest snapshot at
    ``ts_b``, each file's ``import X`` lines IN ORDER (first = subject,
    rest = objects), distinct triples.  Independent derivation: it parses
    the import statements structurally — no mention automaton, no Ray."""
    df = fixtures.make_code_repo_table().to_pandas()
    df = (
        df[df["commit_ts"] <= ts_b]
        .sort_values("commit_ts", kind="mergesort")
        .groupby(["repo", "path"], as_index=False)
        .last()
    )
    triples = set()
    for content in df["content"]:
        mods = [
            line[len("import ") :]
            for line in content.splitlines()
            if line.startswith("import ")
        ]
        if len(mods) < 2:
            continue
        for obj in mods[1:]:
            if obj != mods[0]:
                triples.add((mods[0], relation, obj))
    return pd.DataFrame(sorted(triples), columns=["subj", "pred", "obj"])


def values_sql(df: pd.DataFrame) -> str:
    """Render a small DataFrame as a DuckDB VALUES relation (full oracle)."""
    if len(df) == 0:
        cols = ", ".join(f'NULL AS "{c}"' for c in df.columns)
        return f"SELECT {cols} WHERE FALSE"

    def lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, (bool, np.bool_)):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (float, np.floating)):
            return repr(float(v))
        raise TypeError(f"unsupported oracle literal type: {type(v)}")

    rows = ",\n".join(
        "(" + ", ".join(lit(v) for v in rec) + ")"
        for rec in df.itertuples(index=False)
    )
    cols = ", ".join(f'"{c}"' for c in df.columns)  # "true" etc. are reserved
    return f"SELECT * FROM (VALUES\n{rows}\n) AS t({cols})"


# ---------------------------------------------------------------------------
# SQL reimplementations of the md5-derived sketch/dedup kernels.
#
# These are genuinely independent second implementations: the Ray side runs
# vectorized numpy (stages/neardup.SimHasher, stages/sketch.approx_distinct);
# the oracle recomputes the same public algorithms (simhash voting, HLL
# registers, splitmix64 finalizer) in pure DuckDB SQL over the same parquet
# views.  DuckDB UBIGINT multiplication raises on overflow instead of
# wrapping, so the mod-2^64 multiplies are decomposed into 32-bit halves in
# HUGEINT.


def _mulmod64_sql(z: str, c: int) -> str:
    """SQL expr: (z * c) mod 2^64; ``z`` a HUGEINT expr in [0, 2^64)."""
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (
        f"((({z}) % 4294967296) * {cl} + "
        f"(((({z}) % 4294967296) * {ch} + (({z}) // 4294967296) * {cl})"
        f" % 4294967296) * 4294967296) % 18446744073709551616"
    )


def splitmix64_sql(x: str) -> str:
    """SQL expr computing splitmix64(x) for a UBIGINT expr ``x``.

    Mirrors functions/hashing._splitmix64 (public-domain finalizer);
    validated bit-exact against the numpy implementation in
    tests/test_oracle_sql.py.
    """
    s1 = f"((({x})::HUGEINT + 11400714819323198485) % 18446744073709551616)"
    x1 = f"xor(({s1})::UBIGINT, ({s1})::UBIGINT >> 30)"
    s2 = _mulmod64_sql(f"({x1})::HUGEINT", 0xBF58476D1CE4E5B9)
    x2 = f"xor(({s2})::UBIGINT, ({s2})::UBIGINT >> 27)"
    s3 = _mulmod64_sql(f"({x2})::HUGEINT", 0x94D049BB133111EB)
    return f"xor(({s3})::UBIGINT, ({s3})::UBIGINT >> 31)"


# first 8 bytes of md5, big-endian — functions/hashing.stable_hash_u64
_MD5_U64 = "('0x' || substr(md5({v}),1,16))::UBIGINT"


def simhash_sql() -> str:
    """DuckDB oracle for analytics.dedup_simhash.

    Word tokens (whitespace split), 64-bit hash = splitmix64(md5[:8]) per
    occurrence, per-bit +1/-1 votes, fingerprint bit b = (2·ones_b > n);
    keep min doc_id per fingerprint.  The signed BIGINT wrap matches the
    uint64→int64 cast on the Ray side.
    """
    h = splitmix64_sql(_MD5_U64.format(v="w"))
    return f"""
WITH toks AS (
  SELECT doc_id, t.w AS w
  FROM documents, unnest(regexp_split_to_array(text, '\\s+')) AS t(w)
  WHERE t.w <> ''
),
hs AS (SELECT doc_id, {h} AS h FROM toks),
cnt AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
votes AS (
  SELECT doc_id, g.b AS b,
         sum(CASE WHEN ((h >> g.b) & 1) = 1 THEN 1 ELSE 0 END) AS ones
  FROM hs, generate_series(0, 63) AS g(b)
  GROUP BY doc_id, g.b
),
fp AS (
  SELECT votes.doc_id,
         sum(CASE WHEN 2*ones > n AND b < 32 THEN (1::BIGINT << b) ELSE 0 END) AS lo,
         sum(CASE WHEN 2*ones > n AND b >= 32 THEN (1::BIGINT << (b - 32)) ELSE 0 END) AS hi
  FROM votes JOIN cnt USING (doc_id)
  GROUP BY votes.doc_id
)
SELECT min(doc_id) AS doc_id,
       CASE WHEN hi >= 2147483648
            THEN ((hi::HUGEINT * 4294967296 + lo) - 18446744073709551616)::BIGINT
            ELSE (hi::HUGEINT * 4294967296 + lo)::BIGINT END AS simhash
FROM fp
GROUP BY hi, lo
ORDER BY doc_id
"""


def hll_distinct_sql() -> str:
    """DuckDB oracle for analytics.distinct_users_hll (p=14 HyperLogLog).

    Register index = top 14 hash bits; rank = leading zeros of the
    14-left-shifted remainder (guard bits ORed in) + 1, via bit length =
    length(bin(w)); estimate = alpha·m²/Σ2^-r with the standard linear-
    counting small-range branch.  Deterministic because the register
    contents are a pure function of the distinct user set.
    """
    h = _MD5_U64.format(v="v")
    return f"""
WITH vals AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v FROM events),
h AS (SELECT {h} AS h FROM vals),
reg AS (
  SELECT (h >> 50)::BIGINT AS idx,
         max(65 - length(bin(((h % 1125899906842624) * 16384 + 16383)::UBIGINT))) AS r
  FROM h GROUP BY idx
),
allregs AS (
  SELECT coalesce(reg.r, 0) AS r
  FROM generate_series(0, 16383) AS g(i) LEFT JOIN reg ON reg.idx = g.i
),
est0 AS (
  SELECT (0.7213 / (1.0 + 1.079/16384.0)) * 16384.0 * 16384.0
           / sum(power(2.0, -r)) AS raw,
         sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros
  FROM allregs
),
est AS (
  SELECT CASE WHEN raw <= 2.5 * 16384.0 AND zeros > 0
              THEN 16384.0 * ln(16384.0 / zeros)
              ELSE raw END AS estimate
  FROM est0
),
ex AS (SELECT count(DISTINCT user_id) AS exact FROM events)
SELECT round(estimate, 1) AS estimate,
       exact,
       round(abs(estimate - exact) / exact, 6) AS rel_error
FROM est, ex
"""


def pagerank_sql(n_iters: int = 20, damping: float = 0.85) -> str:
    """DuckDB oracle for analytics.kg_pagerank: the power iteration unrolled
    as ``n_iters`` chained CTEs (recursive CTEs restrict aggregates in the
    recursive member; unrolling sidesteps the restriction and keeps each
    step a plain join + group-by).  The bidirectional co-occurrence graph
    has no dangling nodes, so the dangling term is identically zero and is
    omitted on both sides.
    """
    steps = []
    prev = "pr0"
    for i in range(1, n_iters + 1):
        cur = f"pr{i}"
        steps.append(
            f"""{cur} AS MATERIALIZED (
  SELECT e.o AS node,
         (1 - {damping}) / nn.c + {damping} * sum(p.rank * e.w / od.od) AS rank
  FROM edges e
  JOIN {prev} p ON p.node = e.s
  JOIN outdeg od ON od.node = e.s
  CROSS JOIN nn
  GROUP BY e.o, nn.c)"""
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
WITH m AS MATERIALIZED (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token
          FROM documents)
    WHERE token IN ('spark','hash','join','merge','sort','filter','window',
                    'vector','stream','batch')),
und AS MATERIALIZED (
    SELECT a.token AS s, b.token AS o, count(*)::DOUBLE AS w
    FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2),
edges AS MATERIALIZED (SELECT s, o, w FROM und UNION ALL SELECT o, s, w FROM und),
nn AS MATERIALIZED (SELECT count(DISTINCT s) AS c FROM edges),
outdeg AS MATERIALIZED (SELECT s AS node, sum(w) AS od FROM edges GROUP BY s),
pr0 AS MATERIALIZED (SELECT s AS node, 1.0 / nn.c AS rank FROM (SELECT DISTINCT s FROM edges), nn),
{chain}
SELECT node, round(rank, 6) AS rank FROM {prev} ORDER BY node
"""


def stationary_sql(n_iters: int = 8) -> str:
    """DuckDB oracle for analytics.event_type_stationary: the power
    iteration over the event-type Markov chain unrolled as ``n_iters``
    chained CTEs.  Transition probabilities are row-normalized counts from
    the same LAG bigram extraction as ``event_type_transitions``; states
    with no outgoing transitions re-inject their mass uniformly
    (PageRank-style dangling handling), matching the numpy recurrence
    term-for-term."""
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""x{t} AS MATERIALIZED (
  SELECT s.type,
         COALESCE(mv.v, 0) + dg.dm / (SELECT c FROM k) AS v
  FROM states s
  LEFT JOIN (
      SELECT p.j AS type, sum(xp.v * p.pr) AS v
      FROM x{t - 1} xp JOIN p ON p.i = xp.type
      GROUP BY 1) mv ON mv.type = s.type
  CROSS JOIN (
      SELECT COALESCE(sum(xp.v), 0) AS dm
      FROM x{t - 1} xp
      LEFT JOIN outsum o ON o.prev_type = xp.type
      WHERE o.prev_type IS NULL) dg)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH trans AS MATERIALIZED (
    SELECT prev_type, event_type, count(*)::DOUBLE AS n
    FROM (
        SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
               event_type
        FROM events)
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2),
states AS MATERIALIZED (
    SELECT DISTINCT type FROM (
        SELECT prev_type AS type FROM trans
        UNION SELECT event_type FROM trans)),
k AS MATERIALIZED (SELECT count(*)::DOUBLE AS c FROM states),
outsum AS MATERIALIZED (SELECT prev_type, sum(n) AS s FROM trans GROUP BY 1),
p AS MATERIALIZED (
    SELECT t.prev_type AS i, t.event_type AS j, t.n / o.s AS pr
    FROM trans t JOIN outsum o USING (prev_type)),
x0 AS MATERIALIZED (SELECT type, 1.0 / (SELECT c FROM k) AS v FROM states),
{chain}
SELECT type AS event_type, round_even(v, 6) AS stationary
FROM x{n_iters} ORDER BY 1
"""


def hits_sql(n_iters: int = 4) -> str:
    """DuckDB oracle for analytics.kg_hits: Kleinberg's HITS unrolled as
    2·``n_iters`` chained CTEs (auth half-round then hub half-round, each
    L2-normalized over the nodes that received mass, zero elsewhere) over
    the DIRECTED co-occurrence graph (lexically smaller token → larger).
    ``round_even`` matches numpy's half-to-even output rounding."""
    steps = []
    prev_h = "h0"
    for i in range(1, n_iters + 1):
        steps.append(f"""
a{i}r AS MATERIALIZED (
    SELECT e.o AS node, sum(e.w * h.s) AS x
    FROM edges e JOIN {prev_h} h ON h.node = e.s
    GROUP BY 1),
a{i}z AS (SELECT sqrt(sum(x * x)) AS z FROM a{i}r),
a{i} AS MATERIALIZED (
    SELECT n.node, coalesce(r.x, 0) / (SELECT z FROM a{i}z) AS s
    FROM nodes n LEFT JOIN a{i}r r USING (node)),
h{i}r AS MATERIALIZED (
    SELECT e.s AS node, sum(e.w * a.s) AS x
    FROM edges e JOIN a{i} a ON a.node = e.o
    GROUP BY 1),
h{i}z AS (SELECT sqrt(sum(x * x)) AS z FROM h{i}r),
h{i} AS MATERIALIZED (
    SELECT n.node, coalesce(r.x, 0) / (SELECT z FROM h{i}z) AS s
    FROM nodes n LEFT JOIN h{i}r r USING (node))""")
        prev_h = f"h{i}"
    chain = ",".join(steps)
    return f"""
WITH m AS MATERIALIZED (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token
          FROM documents)
    WHERE token IN ('spark','hash','join','merge','sort','filter','window',
                    'vector','stream','batch')),
edges AS MATERIALIZED (
    SELECT a.token AS s, b.token AS o, count(*)::DOUBLE AS w
    FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2),
nodes AS MATERIALIZED (
    SELECT DISTINCT node FROM
        (SELECT s AS node FROM edges UNION ALL SELECT o FROM edges)),
h0 AS (SELECT node, 1.0 AS s FROM nodes),{chain}
SELECT node,
       round_even(h{n_iters}.s, 6) AS hub,
       round_even(a{n_iters}.s, 6) AS authority
FROM h{n_iters} JOIN a{n_iters} USING (node)
ORDER BY node
"""


def _mulmod64_vars_sql(x: str, a: str) -> str:
    """SQL expr: (x * a) mod 2^64 for TWO variable HUGEINT exprs in
    [0, 2^64) — both operands decomposed into 32-bit halves (the
    constant-multiplier form is ``_mulmod64_sql``)."""
    xl, xh = f"(({x}) % 4294967296)", f"(({x}) // 4294967296)"
    al, ah = f"(({a}) % 4294967296)", f"(({a}) // 4294967296)"
    return (
        f"(({xl} * {al} + (({xl} * {ah} + {xh} * {al}) % 4294967296)"
        f" * 4294967296) % 18446744073709551616)"
    )


_POLY_INT = 0x100000001B3  # stages/neardup._POLY
_MERSENNE_INT = (1 << 61) - 1  # stages/neardup._MERSENNE
# md5(b"") first 8 bytes big-endian — _token_hashes('') singleton
_EMPTY_TOKEN_HASH = 0xD41D8CD98F00B204
_M64 = "18446744073709551616"


def minhash_sql(
    threshold: float = 0.5,
    n_perm: int = 64,
    n_bands: int = 16,
    n_shingle: int = 3,
    seed: int = 42,
) -> str:
    """DuckDB oracle for analytics.dedup_minhash — the FULL pipeline
    (shingle hashing → 64-perm MinHash → 16-band LSH buckets → chained
    candidate pairs → exact hash-set Jaccard ≥ threshold) rebuilt in SQL.

    Faithful to stages/neardup.py kernel-for-kernel: word hash =
    md5(word)[:8] big-endian; 3-shingle hash = splitmix64 rolled polynomial
    (acc = sm(acc·POLY + h) per step, one final sm); universal hash =
    ((a·x mod 2^64) + b mod 2^64) mod (2^61−1) with the (a, b) params from
    the same seed inlined as literals; LSH buckets group by the band's
    minhash TUPLE (the Ray side compacts it through md5 — equality of
    tuples ⇔ equality of hashes modulo md5 collision); a bucket of m docs
    chains m−1 (prev, next) pairs in id order.  Verification is Jaccard
    over the DISTINCT shingle-hash sets, exactly `ngram_jaccard`.

    Only deterministic arithmetic crosses the comparison: mod-2^64
    multiplies decompose into 32-bit HUGEINT halves (bit-exactness pinned
    in tests/test_oracle_sql.py), and the jaccard round uses round_even to
    match numpy's half-to-even (tie cases exist: odd/2^k fractions).
    """
    import numpy as np

    assert n_shingle == 3, "SQL oracle is written for the 3-shingle kernel"
    rows_per_band = n_perm // n_bands
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    perm_rows = ",\n        ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
        for i in range(n_perm)
    )

    wh = _MD5_U64.format(v="w")  # md5(word)[:8] big-endian, raw (no splitmix)
    # rolling step exprs; splitmix staged through CTE columns so each
    # splitmix64_sql argument is a short column name (it expands ~200x)
    mul_h1 = _mulmod64_sql("h1", _POLY_INT)
    mul_u1 = _mulmod64_sql("u1", _POLY_INT)
    sm_t1 = splitmix64_sql("t1")
    sm_t2 = splitmix64_sql("t2")
    sm_u2 = splitmix64_sql("u2")
    sm_h1 = splitmix64_sql("(h1)::UBIGINT")
    uhash = (
        f"(({_mulmod64_vars_sql('s.s::HUGEINT', 'perms.a')} + perms.b)"
        f" % {_M64}) % {_MERSENNE_INT}"
    )

    return f"""
WITH arr AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+'),
                       x -> x <> '') AS a
    FROM documents),
toks AS (
    SELECT doc_id, i, a[i] AS w
    FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
hs AS (
    SELECT doc_id, i, ({wh})::HUGEINT AS h,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM toks),
win AS (
    SELECT doc_id, n, h AS h1,
           lead(h, 1) OVER (PARTITION BY doc_id ORDER BY i) AS h2,
           lead(h, 2) OVER (PARTITION BY doc_id ORDER BY i) AS h3
    FROM hs),
-- n >= 3: full 3-shingles (rows with h3 present)
st3a AS (
    SELECT doc_id, ((({mul_h1}) + h2) % {_M64})::UBIGINT AS t1, h3
    FROM win WHERE n >= 3 AND h3 IS NOT NULL),
st3b AS (SELECT doc_id, ({sm_t1})::HUGEINT AS u1, h3 FROM st3a),
st3c AS (
    SELECT doc_id, ((({mul_u1}) + h3) % {_M64})::UBIGINT AS t2 FROM st3b),
st3d AS (SELECT doc_id, ({sm_t2})::UBIGINT AS u2 FROM st3c),
sh3 AS (SELECT doc_id, ({sm_u2})::HUGEINT AS s FROM st3d),
-- n = 2: one 2-shingle
st2a AS (
    SELECT doc_id, ((({mul_h1}) + h2) % {_M64})::UBIGINT AS t1
    FROM win WHERE n = 2 AND h2 IS NOT NULL),
st2b AS (SELECT doc_id, ({sm_t1})::UBIGINT AS u2 FROM st2a),
sh2 AS (SELECT doc_id, ({sm_u2})::HUGEINT AS s FROM st2b),
-- n = 1: splitmix of the single word hash
sh1 AS (
    SELECT doc_id, ({sm_h1})::HUGEINT AS s FROM win WHERE n = 1),
-- n = 0: the md5(b'') singleton
sh0 AS (
    SELECT doc_id, {_EMPTY_TOKEN_HASH}::HUGEINT AS s
    FROM arr WHERE len(a) = 0),
sset AS (
    SELECT DISTINCT doc_id, s
    FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM sh2
          UNION ALL SELECT * FROM sh1 UNION ALL SELECT * FROM sh0)),
perms(p, a, b) AS (
    VALUES {perm_rows}),
uh AS (
    SELECT s.doc_id, perms.p, min({uhash}) AS mh
    FROM sset s, perms GROUP BY 1, 2),
sig AS (
    SELECT doc_id, p // {rows_per_band} AS band_id,
           string_agg(mh::VARCHAR, ',' ORDER BY p) AS bsig
    FROM uh GROUP BY 1, 2),
chain AS (
    SELECT doc_id,
           lag(doc_id) OVER (PARTITION BY band_id, bsig ORDER BY doc_id)
               AS prev
    FROM sig),
pairs AS (
    SELECT DISTINCT prev AS id_a, doc_id AS id_b
    FROM chain WHERE prev IS NOT NULL),
card AS (SELECT doc_id, count(*) AS n FROM sset GROUP BY 1),
inter AS (
    SELECT p.id_a, p.id_b, count(*) AS i
    FROM pairs p
    JOIN sset x ON x.doc_id = p.id_a
    JOIN sset y ON y.doc_id = p.id_b AND y.s = x.s
    GROUP BY 1, 2)
SELECT i.id_a, i.id_b,
       round_even(i.i::DOUBLE / (ca.n + cb.n - i.i), 6) AS jaccard
FROM inter i
JOIN card ca ON ca.doc_id = i.id_a
JOIN card cb ON cb.doc_id = i.id_b
WHERE i.i::DOUBLE / (ca.n + cb.n - i.i) >= {threshold}
ORDER BY i.id_a, i.id_b
"""


def kmeans_sql(k: int = 8, n_iters: int = 3) -> str:
    """DuckDB oracle for analytics.embedding_clusters: Lloyd's k-means
    unrolled as CTE chains (like ``pagerank_sql``) over the embeddings
    table — deterministic init (embeddings of the k smallest vec_ids),
    squared-euclidean argmin with ties to the lowest centroid id, empty
    clusters keeping their previous centroid, cluster sizes of the final
    assignment under the final centroids.

    Float caveat, stated honestly: centroid means and distance sums are
    IEEE doubles accumulated in different orders on the two sides (numpy
    pairwise vs SQL sequential).  Assignments only flip if a vector is
    within ~1 ulp of equidistant between two centroids — far below the
    centroid separation of any real embedding table; the planted-parity
    test in tests/test_oracle_sql.py guards the assumption.
    """
    return f"""
WITH {_kmeans_chain_sql(k, n_iters)}
SELECT cid AS cluster, count(*) AS n_vecs
FROM afin GROUP BY 1 ORDER BY 1
"""


def _kmeans_chain_sql(
    k: int, n_iters: int, sample_pred: str | None = None
) -> str:
    """The shared Lloyd CTE chain: ``ve`` (unnested embeddings) → ``afin``
    (final vec_id → cid assignment).  ``kmeans_sql`` reads cluster sizes
    off it; ``semantic_dedup_sql`` joins pairwise cosine within ``afin``
    clusters.

    ``sample_pred`` (a SQL predicate over ``vec_id``) restricts the
    TRAINING set — init takes the ``k`` smallest sample ids and each
    Lloyd step assigns/averages sample vectors only — while the final
    ``afin`` assignment still covers every vector.  This is the oracle for
    the deterministic hash-sampled quantizer (``knn_ivf``)."""
    src = "ve" if sample_pred is None else "vs"
    steps = []
    prev = "c0"
    for t in range(1, n_iters + 1):
        steps.append(f"""
d{t} AS (
    SELECT {src}.vec_id, c.cid, sum(({src}.x - c.v) * ({src}.x - c.v)) AS d2
    FROM {src} JOIN {prev} c USING (j)
    GROUP BY 1, 2),
a{t} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d{t}) WHERE rn = 1),
c{t} AS (
    SELECT a.cid, {src}.j, avg({src}.x) AS v
    FROM a{t} a JOIN {src} ON {src}.vec_id = a.vec_id
    GROUP BY 1, 2
    UNION ALL
    SELECT p.cid, p.j, p.v FROM {prev} p
    WHERE p.cid NOT IN (SELECT DISTINCT cid FROM a{t}))""")
        prev = f"c{t}"
    chain = ",".join(steps)
    ve = """ve AS (
    SELECT vec_id, i AS j, embedding[i]::DOUBLE AS x
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i))"""
    if sample_pred is None:
        head = f"""{ve},
c0 AS (
    SELECT vec_id AS cid, i AS j, embedding[i]::DOUBLE AS v
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    WHERE vec_id < {k})"""
    else:
        head = f"""{ve},
vs AS (SELECT * FROM ve WHERE {sample_pred}),
c0 AS (
    SELECT vec_id AS cid, j, x AS v FROM vs
    WHERE vec_id IN (
        SELECT DISTINCT vec_id FROM vs ORDER BY vec_id LIMIT {k}))"""
    return f"""{head},{chain},
dfin AS (
    SELECT ve.vec_id, c.cid, sum((ve.x - c.v) * (ve.x - c.v)) AS d2
    FROM ve JOIN {prev} c USING (j)
    GROUP BY 1, 2),
afin AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM dfin) WHERE rn = 1)"""


def semantic_dedup_sql(
    k: int = 8, n_iters: int = 3, threshold: float = 0.4
) -> str:
    """DuckDB oracle for analytics.semantic_dedup: the Lloyd assignment
    chain (shared with ``kmeans_sql``) plus exact within-cluster pairwise
    cosine — a vector is dropped iff SOME lower-id vector in its cluster
    reaches ``threshold`` (SemDeDup's min-id-representative rule).

    Float caveat as in ``kmeans_sql``: a drop decision flips only if a
    pair's cosine sits within ~1 ulp of the threshold; fixture embeddings
    are random floats, nowhere near that knife-edge."""
    return f"""
WITH {_kmeans_chain_sql(k, n_iters)},
norms AS (
    SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ve GROUP BY 1),
cpairs AS (
    SELECT hi.vec_id AS id_hi, lo.vec_id AS id_lo, sum(vh.x * vl.x) AS dot
    FROM afin hi
    JOIN afin lo ON lo.cid = hi.cid AND lo.vec_id < hi.vec_id
    JOIN ve vh ON vh.vec_id = hi.vec_id
    JOIN ve vl ON vl.vec_id = lo.vec_id AND vl.j = vh.j
    GROUP BY 1, 2),
dropped AS (
    SELECT DISTINCT p.id_hi AS vec_id
    FROM cpairs p
    JOIN norms nh ON nh.vec_id = p.id_hi
    JOIN norms nl ON nl.vec_id = p.id_lo
    WHERE p.dot / (nh.nrm * nl.nrm) >= {threshold})
SELECT a.vec_id, a.cid AS cluster, (d.vec_id IS NULL) AS kept
FROM afin a LEFT JOIN dropped d USING (vec_id)
ORDER BY a.vec_id
"""


def code_clone_pairs_expected(
    code_parquet: str,
    k: int = 5,
    w: int = 4,
    max_df: int = 16,
    min_shared: int = 2,
) -> pd.DataFrame:
    """Serial winnowing clone detection (plain loops, no Ray/numpy windows).

    Independent second implementation of ``pipelines/code.clone_pairs``:
    latest snapshot per (repo, path), k-gram hashes, width-``w`` window
    with RIGHTMOST-minimum selection, hub-fingerprint purge (> ``max_df``
    files), pair counting, cross-repo filter.  Shares only the pinned
    ``stable_hash_u64`` kernel with the distributed path."""
    from collections import Counter

    import pyarrow.parquet as pq

    t = (
        pq.read_table(
            code_parquet, columns=["repo", "path", "commit_ts", "content"]
        )
        .to_pandas()
        .sort_values("commit_ts", kind="mergesort")
        .groupby(["repo", "path"], as_index=False)
        .last()
    )
    fps: dict[tuple, set] = {}
    for repo, path, content in zip(t["repo"], t["path"], t["content"]):
        toks = content.split()
        sel: set = set()
        if len(toks) >= k:
            grams = [
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            ]
            hs = [int(x) for x in stable_hash_u64(grams).astype(np.int64)]
            if len(hs) <= w:
                mn = min(hs)
                sel.add(hs[max(i for i, v in enumerate(hs) if v == mn)])
            else:
                for s in range(len(hs) - w + 1):
                    window = hs[s : s + w]
                    mn = min(window)
                    off = max(i for i, v in enumerate(window) if v == mn)
                    sel.add(hs[s + off])
        fps[(repo, path)] = sel

    inv: dict[int, list] = {}
    for fid, s in fps.items():
        for f in s:
            inv.setdefault(f, []).append(fid)
    cnt: Counter = Counter()
    for f, files in inv.items():
        if len(files) > max_df:
            continue
        files = sorted(files)
        for i in range(len(files)):
            for j in range(i + 1, len(files)):
                cnt[(files[i], files[j])] += 1
    rows = [
        (a[0], a[1], b[0], b[1], n)
        for (a, b), n in cnt.items()
        if n >= min_shared and a[0] != b[0]
    ]
    return pd.DataFrame(
        sorted(rows),
        columns=["repo_a", "path_a", "repo_b", "path_b", "n_shared"],
    )


def hll_grouped_sql() -> str:
    """DuckDB oracle for analytics.distinct_users_hll_by_type: the p=14
    register pipeline of ``hll_distinct_sql`` rebuilt PER GROUP (types ×
    generate_series register domain, per-type linear-counting branch)."""
    h = _MD5_U64.format(v="v")
    return f"""
WITH vals AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v FROM events),
h AS (SELECT event_type, {h} AS h FROM vals),
reg AS (
  SELECT event_type, (h >> 50)::BIGINT AS idx,
         max(65 - length(bin(((h % 1125899906842624) * 16384 + 16383)::UBIGINT))) AS r
  FROM h GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM events),
allregs AS (
  SELECT t.event_type, coalesce(reg.r, 0) AS r
  FROM types t
  CROSS JOIN generate_series(0, 16383) AS g(i)
  LEFT JOIN reg ON reg.event_type = t.event_type AND reg.idx = g.i
),
est0 AS (
  SELECT event_type,
         (0.7213 / (1.0 + 1.079/16384.0)) * 16384.0 * 16384.0
           / sum(power(2.0, -r)) AS raw,
         sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros
  FROM allregs GROUP BY 1
),
est AS (
  SELECT event_type,
         CASE WHEN raw <= 2.5 * 16384.0 AND zeros > 0
              THEN 16384.0 * ln(16384.0 / zeros)
              ELSE raw END AS estimate
  FROM est0
),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact
       FROM events GROUP BY 1)
SELECT est.event_type,
       round_even(est.estimate, 1) AS estimate,
       ex.exact,
       round_even(abs(est.estimate - ex.exact) / ex.exact, 6) AS rel_error
FROM est JOIN ex USING (event_type)
ORDER BY 1
"""


def countmin_sql(vocab: list[str], d: int = 4, w: int = 256) -> str:
    """DuckDB oracle for analytics.word_countmin (Count-Min sketch).

    Rebuilds stages/sketch.count_min bit-equal: value hash u = md5[:8]
    big-endian; row-r cell = splitmix64((u + r·GOLD) mod 2^64) mod w;
    sketch cell = occurrence count; estimate = min over the d cells.
    Deterministic, so the estimates (not just counts) hash-match.
    """
    gold = 0x9E3779B97F4A7C15

    def cell(v: str) -> str:
        u = _MD5_U64.format(v=v)
        x = (
            f"((({u})::HUGEINT + (r::HUGEINT * {gold})) "
            f"% 18446744073709551616)::UBIGINT"
        )
        return f"(({splitmix64_sql(x)}) % {w})"

    vocab_values = ", ".join(f"('{v}')" for v in vocab)
    return f"""
WITH toks AS (
  SELECT t.w AS w
  FROM documents,
       unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS t(w)
  WHERE t.w <> ''
),
reps AS (SELECT w, r FROM toks CROSS JOIN range(0, {d}) AS t2(r)),
cells AS (
  SELECT r, {cell("w")} AS b, count(*)::BIGINT AS n
  FROM reps GROUP BY 1, 2
),
q(word) AS (VALUES {vocab_values}),
qcell AS (
  SELECT word, r, {cell("word")} AS b
  FROM q CROSS JOIN range(0, {d}) AS t3(r)
)
SELECT word, min(coalesce(cells.n, 0))::BIGINT AS est
FROM qcell LEFT JOIN cells USING (r, b)
GROUP BY word ORDER BY word
"""


def hll_overlap_sql() -> str:
    """DuckDB oracle for analytics.hll_user_overlap: the p=14 register
    pipeline per audience ('view' / 'purchase'), the union register set as
    the elementwise max, estimates for A, B, A∪B and the
    inclusion–exclusion intersection — every value a deterministic
    function of the register arrays, so the gate compares estimates."""
    h = _MD5_U64.format(v="v")
    est_case = (
        "CASE WHEN raw <= 2.5 * 16384.0 AND zeros > 0 "
        "THEN 16384.0 * ln(16384.0 / zeros) ELSE raw END"
    )
    return f"""
WITH vals AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v FROM events
  WHERE event_type IN ('view', 'purchase')),
h AS (SELECT event_type, {h} AS h FROM vals),
reg AS (
  SELECT event_type, (h >> 50)::BIGINT AS idx,
         max(65 - length(bin(((h % 1125899906842624) * 16384 + 16383)::UBIGINT))) AS r
  FROM h GROUP BY 1, 2
),
dom AS (SELECT g.i FROM generate_series(0, 16383) AS g(i)),
sides AS (
  SELECT dom.i,
         coalesce(max(CASE WHEN event_type = 'view' THEN r END), 0) AS ra,
         coalesce(max(CASE WHEN event_type = 'purchase' THEN r END), 0) AS rb
  FROM dom LEFT JOIN reg ON reg.idx = dom.i
  GROUP BY dom.i
),
est0 AS (
  SELECT s.tag, (0.7213 / (1.0 + 1.079/16384.0)) * 16384.0 * 16384.0
             / sum(power(2.0, -s.r)) AS raw,
         sum(CASE WHEN s.r = 0 THEN 1 ELSE 0 END) AS zeros
  FROM (
    SELECT 'a' AS tag, ra AS r FROM sides
    UNION ALL SELECT 'b', rb FROM sides
    UNION ALL SELECT 'u', greatest(ra, rb) FROM sides
  ) s GROUP BY 1
),
est AS (SELECT tag, {est_case} AS e FROM est0),
ex AS (
  SELECT count(*)::BIGINT AS exact FROM (
    SELECT user_id FROM (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type IN ('view', 'purchase'))
    GROUP BY user_id HAVING count(*) = 2)
)
SELECT round_even((SELECT e FROM est WHERE tag = 'a'), 1) AS est_view,
       round_even((SELECT e FROM est WHERE tag = 'b'), 1) AS est_purchase,
       round_even((SELECT e FROM est WHERE tag = 'u'), 1) AS est_union,
       round_even((SELECT e FROM est WHERE tag = 'a')
                  + (SELECT e FROM est WHERE tag = 'b')
                  - (SELECT e FROM est WHERE tag = 'u'), 1)
           AS est_intersection,
       ex.exact AS exact_intersection,
       CASE WHEN ex.exact > 0 THEN round_even(abs(
                (SELECT e FROM est WHERE tag = 'a')
                + (SELECT e FROM est WHERE tag = 'b')
                - (SELECT e FROM est WHERE tag = 'u')
                - ex.exact) / ex.exact, 6)
            ELSE 0.0 END AS rel_error
FROM ex
"""


# ---------------------------------------------------------------------------
# BPE tokenizer training — independent serial walk (textbook Sennrich loop)


def _bpe_word_counts(n_docs: int = 200) -> dict[str, int]:
    """Distinct-word counts over the fixture docs, tokenized with the SAME
    RE2 kernel the distributed side uses (serial driver-side Arrow calls,
    no Ray) so the tokenization contract is pinned once."""
    import pyarrow.compute as pc

    kb = fixtures.make_kb()
    docs, _ = fixtures.make_docs_table(kb, n_rows=n_docs)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(docs["content"]), pattern=r"\s+"
    )
    counts: dict[str, int] = {}
    for t in pc.list_flatten(toks).to_pylist():
        if t:
            counts[t] = counts.get(t, 0) + 1
    return counts


def _bpe_merge_seq(syms: tuple, left: str, right: str) -> tuple:
    # independent re-statement of the left-to-right non-overlap merge rule
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def expected_bpe_merges(
    n_merges: int = 20, n_docs: int = 200, min_pair_count: int = 2
) -> pd.DataFrame:
    """Serial BPE training (Sennrich et al. 2016 get_stats/merge loop)."""
    wc = _bpe_word_counts(n_docs)
    vocab = {w: (tuple(w) + ("</w>",)) for w in wc}
    rows = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, n in wc.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + n
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        rows.append((rank, left, right, cnt))
        vocab = {w: _bpe_merge_seq(s, left, right) for w, s in vocab.items()}
    return pd.DataFrame(
        rows, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


def expected_bpe_token_counts(
    n_merges: int = 20, n_docs: int = 200, top_n: int = 50
) -> pd.DataFrame:
    """Serial greedy encode with the trained table (lowest rank first)."""
    merges = expected_bpe_merges(n_merges, n_docs)
    ranks = {
        (l, r): k
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    wc = _bpe_word_counts(n_docs)
    counts: dict[str, int] = {}
    for w, n in wc.items():
        syms = list(w) + ["</w>"]
        while len(syms) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
        for t in syms:
            counts[t] = counts.get(t, 0) + n
    df = pd.DataFrame(
        {"token": list(counts.keys()), "n": list(counts.values())}
    ).astype({"n": "int64"})
    df = df.sort_values(["n", "token"], ascending=[False, True], kind="stable")
    return df.head(top_n).reset_index(drop=True)


def lpa_sql(n_iters: int = 4, min_support: int = 326) -> str:
    """DuckDB oracle for analytics.kg_communities: synchronous weighted
    label propagation unrolled as ``n_iters`` chained CTE rounds (the same
    unrolling trick as ``pagerank_sql``).  Each round: votes = incoming
    edge-weight per (node, sender-label); argmax per node with ties to the
    smallest label; nodes without votes keep their label (LEFT JOIN +
    COALESCE).  Integer-valued float64 vote sums are exact, so the match
    is bit-for-bit, not tolerance-based."""
    body, final = _lpa_with_body(n_iters, min_support)
    return f"""
{body}
SELECT node, label AS community FROM {final} ORDER BY node
"""


def _lpa_with_body(n_iters: int, min_support: int) -> "tuple[str, str]":
    """Shared WITH-body of the LPA chain (edge CTEs + unrolled rounds) and
    the name of the final label CTE — composed by ``lpa_sql`` and
    ``modularity_sql``."""
    steps = []
    prev = "l0"
    for i in range(1, n_iters + 1):
        steps.append(
            f"""v{i} AS MATERIALIZED (
  SELECT e.o AS node, p.label, sum(e.w) AS w
  FROM edges e JOIN {prev} p ON p.node = e.s
  GROUP BY 1, 2),
b{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY w DESC, label) AS rn
    FROM v{i})
  WHERE rn = 1),
l{i} AS MATERIALIZED (
  SELECT l.node, COALESCE(b.label, l.label) AS label
  FROM {prev} l LEFT JOIN b{i} b ON b.node = l.node)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(steps)
    return f"""
WITH m AS MATERIALIZED (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token
          FROM documents)
    WHERE token IN ('spark','hash','join','merge','sort','filter','window',
                    'vector','stream','batch')),
und AS MATERIALIZED (
    SELECT a.token AS s, b.token AS o, count(*)::DOUBLE AS w
    FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2
    HAVING count(*) >= {min_support}),
edges AS MATERIALIZED (SELECT s, o, w FROM und UNION ALL SELECT o, s, w FROM und),
l0 AS MATERIALIZED (
    SELECT node, node AS label
    FROM (SELECT s AS node FROM edges UNION SELECT o FROM edges)),
{chain}""", prev


def modularity_sql(n_iters: int = 4, min_support: int = 326) -> str:
    """DuckDB oracle for analytics.kg_modularity: per-community Newman
    modularity contributions over the SAME LPA chain as ``lpa_sql``.
    Over the direction-doubled edge CTE: 2m = sum(w); e_c = intra-
    community doubled weight; d_c = community degree sum — all
    integer-valued float64, cast to exact BIGINTs; the one float
    expression e_c/2m − (d_c/2m)·(d_c/2m) is spelled with explicit
    multiplication on both engines and rounded half-even at 6 dp."""
    body, final = _lpa_with_body(n_iters, min_support)
    return f"""
{body},
tm AS MATERIALIZED (SELECT sum(w) AS t FROM edges),
lab AS MATERIALIZED (SELECT node, label AS community FROM {final}),
intra AS MATERIALIZED (
    SELECT la.community, sum(e.w) AS e_c
    FROM edges e
    JOIN lab la ON la.node = e.s
    JOIN lab lb ON lb.node = e.o
    WHERE la.community = lb.community
    GROUP BY 1),
deg AS MATERIALIZED (
    SELECT la.community, sum(e.w) AS d_c
    FROM edges e JOIN lab la ON la.node = e.s
    GROUP BY 1)
SELECT d.community,
       coalesce(i.e_c, 0)::BIGINT AS intra_w,
       d.d_c::BIGINT AS deg_w,
       round_even(
           coalesce(i.e_c, 0) / tm.t
           - (d.d_c / tm.t) * (d.d_c / tm.t), 6) AS q_term
FROM deg d
LEFT JOIN intra i ON i.community = d.community
CROSS JOIN tm
ORDER BY d.community
"""


def _pq_chain_sql(pfx: str, k: int, n_iters: int, j_lo: int, j_hi: int) -> str:
    """One subspace's Lloyd chain over dims j ∈ [j_lo, j_hi] (1-based),
    same step structure as ``_kmeans_chain_sql``; produces ``{pfx}afin``
    (vec_id → cid)."""
    steps = []
    prev = f"{pfx}c0"
    for t in range(1, n_iters + 1):
        steps.append(f"""
{pfx}d{t} AS (
    SELECT ve.vec_id, c.cid, sum((ve.x - c.v) * (ve.x - c.v)) AS d2
    FROM {pfx}ve ve JOIN {prev} c USING (j)
    GROUP BY 1, 2),
{pfx}a{t} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM {pfx}d{t}) WHERE rn = 1),
{pfx}c{t} AS (
    SELECT a.cid, ve.j, avg(ve.x) AS v
    FROM {pfx}a{t} a JOIN {pfx}ve ve ON ve.vec_id = a.vec_id
    GROUP BY 1, 2
    UNION ALL
    SELECT p.cid, p.j, p.v FROM {prev} p
    WHERE p.cid NOT IN (SELECT DISTINCT cid FROM {pfx}a{t}))""")
        prev = f"{pfx}c{t}"
    chain = ",".join(steps)
    return f"""{pfx}ve AS (
    SELECT vec_id, i AS j, embedding[i]::DOUBLE AS x
    FROM embeddings, unnest(range({j_lo}, {j_hi} + 1)) AS t(i)),
{pfx}c0 AS (
    SELECT vec_id AS cid, i AS j, embedding[i]::DOUBLE AS v
    FROM embeddings, unnest(range({j_lo}, {j_hi} + 1)) AS t(i)
    WHERE vec_id < {k}),{chain},
{pfx}dfin AS (
    SELECT ve.vec_id, c.cid, sum((ve.x - c.v) * (ve.x - c.v)) AS d2
    FROM {pfx}ve ve JOIN {prev} c USING (j)
    GROUP BY 1, 2),
{pfx}afin AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM {pfx}dfin) WHERE rn = 1)"""


def pq_sql(m: int = 4, k: int = 8, n_iters: int = 3, dim: int = 64) -> str:
    """DuckDB oracle for analytics.embedding_pq_codes: ``m`` independent
    subspace Lloyd chains (each the ``kmeans_sql`` recurrence restricted to
    its dim slice) and the final per-vector code per subspace.  Same float
    caveat as ``kmeans_sql``; assignments sit far from the knife-edge."""
    dsub = dim // m
    chains = ",\n".join(
        _pq_chain_sql(f"s{s}_", k, n_iters, s * dsub + 1, (s + 1) * dsub)
        for s in range(m)
    )
    finals = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s}::BIGINT AS sub, cid::BIGINT AS code FROM s{s}_afin"
        for s in range(m)
    )
    return f"""
WITH {chains}
SELECT * FROM ({finals})
ORDER BY vec_id, sub
"""


def pq_adc_sql(
    m: int = 4,
    k: int = 8,
    n_iters: int = 3,
    dim: int = 64,
    n_queries: int = 5,
    topk: int = 5,
) -> str:
    """DuckDB oracle for analytics.knn_pq: the per-subspace Lloyd chains
    (shared recurrence with ``pq_sql``) plus the SAME asymmetric distance —
    each corpus vector scored through its subspace assignment's FINAL
    centroid against raw query dims — ranked per query (d2 asc, id asc),
    self excluded.  This verifies the approximation itself: codes,
    codebooks and ADC arithmetic all recomputed independently."""
    dsub = dim // m
    chains = ",\n".join(
        _pq_chain_sql(f"s{s}_", k, n_iters, s * dsub + 1, (s + 1) * dsub)
        for s in range(m)
    )
    # per-subspace (query, corpus) partial distances against the FINAL
    # centroid table c{n_iters}
    parts = "\nUNION ALL\n".join(
        f"""SELECT q.qid, a.vec_id AS nid,
           sum((q.x - c.v) * (q.x - c.v)) AS d2
    FROM qve q
    JOIN s{s}_c{n_iters} c USING (j)
    JOIN s{s}_afin a ON a.cid = c.cid
    GROUP BY 1, 2"""
        for s in range(m)
    )
    return f"""
WITH {chains},
qve AS (
    SELECT vec_id AS qid, i AS j, embedding[i]::DOUBLE AS x
    FROM embeddings, unnest(range(1, {dim} + 1)) AS t(i)
    WHERE vec_id < {n_queries}),
parts AS (
{parts}),
tot AS (SELECT qid, nid, sum(d2) AS d2 FROM parts GROUP BY 1, 2),
ranked AS (
    SELECT qid AS query_id, nid AS neighbor_id, d2,
           row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
    FROM tot WHERE nid <> qid)
SELECT query_id, neighbor_id, rank, round_even(d2, 6) AS d2
FROM ranked WHERE rank <= {topk}
ORDER BY query_id, rank
"""


def ivf_probed_sql(
    n_centroids: int = 16,
    n_iters: int = 3,
    n_probe: int = 4,
    n_queries: int = 10,
    k: int = 5,
    sample_pred: str | None = None,
) -> str:
    """DuckDB oracle for analytics.knn_ivf_probed: the APPROXIMATE IVF
    search recomputed independently end-to-end — the full-dim Lloyd chain
    (shared ``_kmeans_chain_sql`` recurrence: deterministic lowest-id init,
    d2-argmin ties to the lowest centroid id, empty cells keep their
    previous centroid), each query's ``n_probe`` nearest FINAL centroids
    (d2 asc, cid asc), candidate lists via the final assignment ``afin``,
    exact cosine within probed lists, rank by (cosine desc, id asc) with
    self excluded.  This verifies the approximation itself, not just the
    machinery: a probe set or assignment that differs in one list changes
    the value hash.  Same float caveat as ``kmeans_sql``.

    ``sample_pred`` replays the deterministic hash-sampled quantizer
    (``knn_ivf``): training restricted to the sample, search unchanged."""
    return f"""
WITH {_kmeans_chain_sql(n_centroids, n_iters, sample_pred=sample_pred)},
nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nv FROM ve GROUP BY 1),
qd AS (
    SELECT ve.vec_id AS qid, c.cid, sum((ve.x - c.v) * (ve.x - c.v)) AS d2
    FROM ve JOIN c{n_iters} c USING (j)
    WHERE ve.vec_id < {n_queries}
    GROUP BY 1, 2),
probe AS (
    SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
        FROM qd) WHERE rn <= {n_probe}),
cand AS (
    SELECT p.qid, a.vec_id AS nid
    FROM probe p JOIN afin a USING (cid)
    WHERE a.vec_id <> p.qid),
dots AS (
    SELECT c.qid, c.nid, sum(vq.x * vn.x) AS dp
    FROM cand c
    JOIN ve vq ON vq.vec_id = c.qid
    JOIN ve vn ON vn.vec_id = c.nid AND vn.j = vq.j
    GROUP BY 1, 2),
ranked AS (
    SELECT d.qid AS query_id, d.nid AS neighbor_id,
           d.dp / (nq.nv * nn.nv) AS cosine,
           row_number() OVER (
               PARTITION BY d.qid
               ORDER BY d.dp / (nq.nv * nn.nv) DESC, d.nid) AS rank
    FROM dots d
    JOIN nrm nq ON nq.vec_id = d.qid
    JOIN nrm nn ON nn.vec_id = d.nid)
SELECT query_id, neighbor_id, rank, round_even(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def kcore_sql(k: int = 3, min_support: int = 326, n_rounds: int = 6) -> str:
    """DuckDB oracle for analytics.kg_kcore: the synchronous peeling
    recurrence unrolled as ``n_rounds`` chained CTE rounds over the same
    strong-edge graph CTEs as ``lpa_sql`` — round i keeps nodes whose
    degree within the round-(i-1) survivors is >= k; the final SELECT
    reports survivors with their induced degree.  Integer counts, so the
    match is exact."""
    steps = []
    prev = "a0"
    for i in range(1, n_rounds + 1):
        steps.append(
            f"""d{i} AS MATERIALIZED (
  SELECT e.s AS node, count(*) AS deg
  FROM edges e
  JOIN {prev} x ON x.node = e.s
  JOIN {prev} y ON y.node = e.o
  GROUP BY 1),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k})"""
        )
        prev = f"a{i}"
    chain = ",\n".join(steps)
    return f"""
WITH m AS MATERIALIZED (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token
          FROM documents)
    WHERE token IN ('spark','hash','join','merge','sort','filter','window',
                    'vector','stream','batch')),
und AS MATERIALIZED (
    SELECT a.token AS s, b.token AS o
    FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2
    HAVING count(*) >= {min_support}),
edges AS MATERIALIZED (SELECT s, o FROM und UNION ALL SELECT o, s FROM und),
a0 AS MATERIALIZED (
    SELECT node FROM (SELECT s AS node FROM edges UNION SELECT o FROM edges)),
{chain},
dfin AS (
  SELECT e.s AS node, count(*) AS deg
  FROM edges e
  JOIN {prev} x ON x.node = e.s
  JOIN {prev} y ON y.node = e.o
  GROUP BY 1)
SELECT node AS entity, deg FROM dfin ORDER BY entity
"""


def classifier_score_sql(dim: int = 1024) -> str:
    """DuckDB oracle for analytics.doc_classifier_score.

    Rebuilds the hashed-linear-model inference independently: md5-u64
    token hash % dim → splitmix64 integer weight in [-2^20, 2^20) →
    exact integer per-document sum (order-independent, so SUM() in any
    order matches numpy's bincount) → one final double division.
    """
    idx = f"(({_MD5_U64.format(v='w')}) % {dim})"
    wt = f"(({splitmix64_sql(idx)}) % 2097152)::BIGINT - 1048576"
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS w
            FROM documents
            WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
        h AS (SELECT doc_id, {wt} AS wt FROM toks),
        agg AS (
            SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(wt)::BIGINT AS s
            FROM h GROUP BY doc_id)
        SELECT doc_id, n_tokens,
               s / (n_tokens * 1048576.0) AS clf_score,
               CASE WHEN s >= 0 THEN 'keep' ELSE 'drop' END AS clf_label
        FROM agg
        ORDER BY doc_id
    """


def corpus_report_sql() -> str:
    """DuckDB oracle for analytics.corpus_report — every card metric
    recomputed independently: token counts, alpha-ratio quality gate
    (the curate_corpus expressions), distinct content sha256, and the
    hashed-linear-model keep rule (same integer kernels as
    classifier_score_sql)."""
    idx = f"(({_MD5_U64.format(v='w')}) % 1024)"
    wt = f"(({splitmix64_sql(idx)}) % 2097152)::BIGINT - 1048576"
    return f"""
        WITH base AS (
            SELECT doc_id, lang, text,
                   len(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS n_tok,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                       / length(text) AS alpha_ratio
            FROM documents),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS w
            FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
        clf AS (
            SELECT doc_id FROM (
                SELECT doc_id, sum({wt})::BIGINT AS s
                FROM toks GROUP BY doc_id)
            WHERE s >= 0),
        agg AS (
            SELECT count(*)::BIGINT AS n_docs,
                   sum(n_tok)::BIGINT AS total_tokens,
                   count(DISTINCT sha256(text))::BIGINT AS n_unique,
                   count(DISTINCT lang)::BIGINT AS n_langs,
                   sum(CASE WHEN alpha_ratio >= 0.8175 AND n_tok >= 5
                            THEN 1 ELSE 0 END)::BIGINT AS n_q
            FROM base)
        SELECT n_docs, n_unique,
               round_even(1.0 - n_unique / n_docs::DOUBLE, 6) AS dup_rate,
               n_langs, total_tokens,
               round_even(n_q / n_docs::DOUBLE, 6) AS quality_pass_rate,
               round_even((SELECT count(*) FROM clf) / n_docs::DOUBLE, 6)
                   AS clf_keep_rate
        FROM agg
    """


def clf_calibration_sql() -> str:
    """DuckDB oracle for analytics.clf_calibration.

    Same integer kernels as classifier_score_sql; the duplicate label is
    sha256 multiplicity > 1; binning uses an explicit integer FLOOR
    division (DuckDB's ``//`` truncates toward zero, numpy floors)."""
    idx = f"(({_MD5_U64.format(v='w')}) % 1024)"
    wt = f"(({splitmix64_sql(idx)}) % 2097152)::BIGINT - 1048576"
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS w
            FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
        sc AS (
            SELECT doc_id, sum({wt})::BIGINT AS s, count(*)::BIGINT AS n
            FROM toks GROUP BY doc_id),
        lab AS (
            SELECT doc_id,
                   count(*) OVER (PARTITION BY sha256(text)) > 1 AS dup
            FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
        j AS (
            SELECT sc.s, sc.n, sc.n * 65536 AS d, lab.dup
            FROM sc JOIN lab USING (doc_id)),
        binned AS (
            SELECT least(greatest(
                       CASE WHEN s >= 0 THEN s // d
                            ELSE -((-s + d - 1) // d) END + 4, 0), 7)
                       AS bin,
                   s / (n * 1048576.0) AS score, dup
            FROM j)
        SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n_docs,
               sum(dup::INT)::BIGINT AS n_dup,
               round_even(sum(score) / count(*), 6) AS mean_score,
               round_even(sum(dup::INT) / count(*)::DOUBLE, 6) AS dup_rate
        FROM binned GROUP BY 1 ORDER BY 1
    """


def span_corruption_sql(rate: int = 15) -> str:
    """DuckDB oracle for analytics.doc_span_corruption: the deterministic
    hash coin, run structure, and both rendered strings rebuilt with
    window functions + ordered string_agg."""
    coin = splitmix64_sql("((doc_id::HUGEINT * 1048576 + i))::UBIGINT")
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+') AS arr
            FROM documents WHERE trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' ') <> ''),
        pos AS (
            SELECT doc_id, arr[i + 1] AS tok, i
            FROM toks, unnest(range(0, len(arr))) AS t(i)),
        m AS (
            SELECT doc_id, tok, i,
                   ({coin}) % 100 < {rate} AS mask
            FROM pos),
        sp AS (
            SELECT *, CASE WHEN mask AND NOT coalesce(
                                lag(mask) OVER (PARTITION BY doc_id
                                                ORDER BY i), FALSE)
                           THEN 1 ELSE 0 END AS strt
            FROM m),
        sx AS (
            SELECT *, (sum(strt) OVER (PARTITION BY doc_id ORDER BY i)
                       - 1)::INT AS k
            FROM sp),
        rendered AS (
            SELECT doc_id,
                   CASE WHEN NOT mask THEN tok
                        WHEN strt = 1 THEN '<X' || k || '>'
                        ELSE NULL END AS ie,
                   CASE WHEN mask AND strt = 1
                            THEN '<X' || k || '> ' || tok
                        WHEN mask THEN tok
                        ELSE NULL END AS te,
                   mask, strt, i
            FROM sx)
        SELECT doc_id, count(*)::BIGINT AS n_tokens,
               sum(mask::INT)::BIGINT AS n_masked,
               sum(strt)::BIGINT AS n_spans,
               md5(coalesce(string_agg(ie, ' ' ORDER BY i), ''))
                   AS input_md5,
               md5(coalesce(string_agg(te, ' ' ORDER BY i), ''))
                   AS target_md5
        FROM rendered GROUP BY doc_id ORDER BY doc_id
    """


def lang_confusion_sql() -> str:
    """DuckDB oracle for analytics.doc_lang_confusion: the marker-lexicon
    detector (language_id_sql) joined back to the labeled lang column and
    folded to a (true, detected) count table."""
    base = language_id_sql()
    return f"""
        WITH det AS ({base})
        SELECT d.lang AS true_lang, det.lang_detected AS detected_lang,
               count(*)::BIGINT AS n_docs
        FROM documents d JOIN det USING (doc_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def random_walks_sql(n_walks: int = 2, walk_len: int = 4) -> str:
    """DuckDB oracle for analytics.kg_random_walks: the hash-derandomized
    DeepWalk corpus replayed step by step — next hop from ``u`` at step
    ``h`` in walk ``w`` is the neighbor minimizing md5-u64 of
    ``u|h|w|v`` (ties to the smaller v), exactly the argmin
    ``stages/graph.random_walks`` computes; each step is one chained CTE
    (join current position onto the per-(node, walk) step function)."""
    hk = _MD5_U64.format(v="e.s || '|{h}|' || w.walk || '|' || e.o")
    steps = []
    for h in range(1, walk_len + 1):
        steps.append(
            f"""nxt{h} AS MATERIALIZED (
  SELECT u, walk, v FROM (
    SELECT e.s AS u, w.walk AS walk, e.o AS v,
           row_number() OVER (PARTITION BY e.s, w.walk
               ORDER BY {hk.replace('{h}', str(h))}, e.o) AS rn
    FROM edges e CROSS JOIN walks w) t WHERE rn = 1),
s{h} AS MATERIALIZED (
  SELECT p.start, p.walk, n.v AS cur
  FROM s{h - 1} p JOIN nxt{h} n ON n.u = p.cur AND n.walk = p.walk)"""
        )
    chain = ",\n".join(steps)
    selects = [
        "SELECT start, walk, CAST(0 AS BIGINT) AS step, start AS node FROM s0"
    ] + [
        f"SELECT start, walk, CAST({h} AS BIGINT) AS step, cur AS node FROM s{h}"
        for h in range(1, walk_len + 1)
    ]
    union = "\nUNION ALL ".join(selects)
    return f"""
WITH m AS MATERIALIZED (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text, chr(9)||chr(10)||chr(13)||chr(12)||chr(11)||' '), '\\s+')) AS token
          FROM documents)
    WHERE token IN ('spark','hash','join','merge','sort','filter','window',
                    'vector','stream','batch')),
und AS MATERIALIZED (
    SELECT a.token AS s, b.token AS o
    FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2),
edges AS MATERIALIZED (SELECT s, o FROM und UNION ALL SELECT o, s FROM und),
walks AS MATERIALIZED (SELECT range::BIGINT AS walk FROM range({n_walks})),
s0 AS MATERIALIZED (
    SELECT n.s AS start, w.walk, n.s AS cur
    FROM (SELECT DISTINCT s FROM edges) n CROSS JOIN walks w),
{chain}
{union}
ORDER BY start, walk, step
"""


def label_prop_sql(k: int = 5, n_rounds: int = 3, seed_mod: int = 3) -> str:
    """DuckDB oracle for analytics.embedding_label_prop: the exact-kNN
    edge set (same ranking as the knn_self_join oracle) then the seeded
    synchronous majority rounds unrolled as chained CTEs — unlabeled
    neighbors don't vote, ties break to the smaller label, no labeled
    neighbor keeps the previous state, seeds never change."""
    steps = []
    for h in range(1, n_rounds + 1):
        steps.append(
            f"""v{h} AS MATERIALIZED (
  SELECT e.query_id AS vec_id, p.lab, count(*)::BIGINT AS n
  FROM knn e JOIN l{h - 1} p ON p.vec_id = e.neighbor_id
  WHERE p.lab >= 0 GROUP BY 1, 2),
b{h} AS MATERIALIZED (
  SELECT vec_id, lab FROM (
    SELECT vec_id, lab,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY n DESC, lab) AS rn
    FROM v{h}) t WHERE rn = 1),
l{h} AS MATERIALIZED (
  SELECT p.vec_id,
         CASE WHEN p.vec_id % {seed_mod} = 0 THEN p.lab
              WHEN b.lab IS NOT NULL THEN b.lab
              ELSE p.lab END AS lab
  FROM l{h - 1} p LEFT JOIN b{h} b USING (vec_id))"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH sims AS MATERIALIZED (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(
               CAST(q.embedding AS DOUBLE[]),
               CAST(e.embedding AS DOUBLE[])) AS sim
    FROM embeddings q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.vec_id),
knn AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM sims) t WHERE rnk <= {k}),
l0 AS MATERIALIZED (
    SELECT vec_id,
           CASE WHEN vec_id % {seed_mod} = 0
                THEN label::BIGINT ELSE -1 END AS lab
    FROM embeddings),
{chain}
SELECT vec_id, lab AS label, (vec_id % {seed_mod} = 0) AS is_seed
FROM l{n_rounds} ORDER BY vec_id
"""


def ktruss_sql(
    modulus: int = 97,
    qty_le: int = 5,
    k: int = 4,
    n_rounds: "int | None" = None,
) -> str:
    """DuckDB oracle for analytics.kg_ktruss: synchronous truss peeling
    unrolled as ``n_rounds`` chained CTE blocks (triangles from canonical
    edges, 3 support contributions each, filter at k−2).  The truss
    fixpoint is unique and peeling is monotone, so any ``n_rounds`` ≥ the
    convergence depth yields the fixpoint — extra rounds are no-ops.
    ``n_rounds`` defaults to ``stages.graph.K_TRUSS_MAX_ROUNDS``, the
    exact point where the Ray side raises instead of continuing, so the
    two engines can never silently disagree past the budget."""
    if n_rounds is None:
        from .stages.graph import K_TRUSS_MAX_ROUNDS

        n_rounds = K_TRUSS_MAX_ROUNDS
    rounds = []
    prev = "e0"
    for i in range(1, n_rounds + 1):
        cur = f"e{i}"
        rounds.append(
            f"""tr{i} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS m, e2.v AS c
  FROM {prev} e1 JOIN {prev} e2 ON e2.u = e1.v
  JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v),
sup{i} AS MATERIALIZED (
  SELECT u, v, count(*) AS s FROM (
    SELECT a AS u, m AS v FROM tr{i}
    UNION ALL SELECT m, c FROM tr{i}
    UNION ALL SELECT a, c FROM tr{i})
  GROUP BY u, v),
{cur} AS MATERIALIZED (
  SELECT p.u, p.v FROM {prev} p JOIN sup{i} s ON s.u = p.u AND s.v = p.v
  WHERE s.s >= {k - 2})"""
        )
        prev = cur
    chain = ",\n".join(rounds)
    return f"""
WITH e0 AS MATERIALIZED (
    SELECT DISTINCT least(l_orderkey % {modulus}, l_partkey % {modulus}) AS u,
           greatest(l_orderkey % {modulus}, l_partkey % {modulus}) AS v
    FROM lineitem
    WHERE l_quantity <= {qty_le}
      AND (l_orderkey % {modulus}) <> (l_partkey % {modulus})),
{chain}
SELECT u, v FROM {prev} ORDER BY u, v
"""


def ppr_sql(
    modulus: int = 997, damping: float = 0.85, n_iters: int = 12
) -> str:
    """DuckDB oracle for analytics.kg_personalized_pagerank: random walk
    with restart to the 3 smallest node ids, unrolled as chained CTEs.
    Each round mirrors the Ray recurrence term-for-term:
    rank = ((1−d) + d·dangling)·p + d·Σ rank/outdeg, where dangling is
    the rank mass on nodes with no outgoing edge."""
    steps = []
    prev = "r0"
    for i in range(1, n_iters + 1):
        cur = f"r{i}"
        steps.append(
            f"""{cur} AS MATERIALIZED (
  SELECT p.node,
         ((1 - {damping}) + {damping} * dg{i}.m) * p.pv
         + {damping} * COALESCE(mv{i}.v, 0) AS rank
  FROM p
  LEFT JOIN (
      SELECT e.dst AS node, sum(rp.rank / od.od) AS v
      FROM e JOIN {prev} rp ON rp.node = e.src
             JOIN od ON od.node = e.src
      GROUP BY 1) mv{i} ON mv{i}.node = p.node
  CROSS JOIN (
      SELECT COALESCE(sum(rp.rank), 0) AS m
      FROM {prev} rp LEFT JOIN od ON od.node = rp.node
      WHERE od.node IS NULL) dg{i})"""
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT (l_orderkey % {modulus}) AS src,
           (l_partkey % {modulus}) AS dst
    FROM lineitem
    WHERE l_quantity = 1
      AND (l_orderkey % {modulus}) <> (l_partkey % {modulus})),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
seeds AS MATERIALIZED (SELECT node FROM nodes ORDER BY node LIMIT 3),
ns AS MATERIALIZED (SELECT count(*)::DOUBLE AS c FROM seeds),
od AS MATERIALIZED (
    SELECT src AS node, count(*)::DOUBLE AS od FROM e GROUP BY 1),
p AS MATERIALIZED (
    SELECT n.node,
           CASE WHEN s.node IS NOT NULL THEN 1.0 / (SELECT c FROM ns)
                ELSE 0.0 END AS pv
    FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
r0 AS MATERIALIZED (SELECT node, pv AS rank FROM p),
{chain}
SELECT node, round_even(rank, 6) AS rank FROM {prev} ORDER BY node
"""


def pca_power_sql(n_iters: int = 8) -> str:
    """Unrolled power-iteration SQL for the top principal component of the
    embedding covariance: the long-form (i, j, cov) matrix (same
    double-unnest CTE as the ``embedding_covariance`` oracle) drives
    ``n_iters`` chained matrix-vector CTEs, each a GROUP-BY sum followed by
    an L2 normalization — the identical recurrence
    ``v_{k+1} = C v_k / ||C v_k||`` the Ray side evaluates on its
    driver-folded dim² matrix (iteration drift across engines ~1e-12,
    absorbed by the 6-dp round).  The sign is pinned by the coordinate of
    largest |loading| (smallest i on ties); eigenvalue = ||C v_{last-1}||,
    explained ratio = eigenvalue / trace(C)."""
    chain = []
    prev = "v0"
    for k in range(1, n_iters + 1):
        # every CTE MATERIALIZED: inlining would re-expand the cov
        # subquery once per reference, doubling the plan per iteration
        chain.append(
            f"w{k} AS MATERIALIZED (SELECT cov.i AS i, sum(cov.c * {prev}.v) AS w"
            f"         FROM cov JOIN {prev} ON cov.j = {prev}.i GROUP BY cov.i),"
            f" n{k} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w{k}),"
            f" v{k} AS MATERIALIZED (SELECT i, w / n{k}.nrm AS v FROM w{k}, n{k})"
        )
        prev = f"v{k}"
    last = n_iters
    return f"""
        WITH e AS (
            SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings),
        cov AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j,
                   sum(a.x * b.x) / count(*)
                   - (sum(a.x) / count(*)) * (sum(b.x) / count(*)) AS c
            FROM e a JOIN e b USING (vec_id) GROUP BY a.i, b.i),
        d AS (SELECT count(*)::DOUBLE AS d FROM (SELECT DISTINCT i FROM cov)),
        v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(d.d) AS v
               FROM (SELECT DISTINCT i FROM cov), d),
        {", ".join(chain)},
        sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
                FROM v{last} ORDER BY abs(v) DESC, i LIMIT 1),
        tr AS (SELECT sum(c) AS t FROM cov WHERE i = j)
        SELECT v{last}.i::BIGINT AS i,
               round_even(v{last}.v * sgn.s, 6) AS loading,
               round_even(n{last}.nrm, 6) AS eigenvalue,
               round_even(n{last}.nrm / tr.t, 6) AS explained_ratio
        FROM v{last}, n{last}, sgn, tr
        ORDER BY i
    """


def mis_sql(n_rounds: int = 6, modulus: int = 997) -> str:
    """Unrolled Luby-MIS SQL over the modular-key digraph (symmetrized):
    node priority is splitmix64(node) — the identical bijective
    hash-derandomization ``stages/graph.maximal_independent_set`` uses, so
    each round's winner / removed / alive sets replay exactly.  Every CTE
    is MATERIALIZED (inlining would re-expand the whole previous round per
    reference)."""

    def p(col: str) -> str:
        return splitmix64_sql(f"({col})::UBIGINT")

    parts = []
    prev_e, prev_a = "e0", "a0"
    decided = []
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""
            mn{r} AS MATERIALIZED (
                SELECT u AS node, min({p('v')}) AS m
                FROM {prev_e} GROUP BY u),
            w{r} AS MATERIALIZED (
                SELECT node FROM mn{r} WHERE {p('node')} < m
                UNION ALL
                SELECT node FROM {prev_a}
                WHERE node NOT IN (SELECT node FROM mn{r})),
            rm{r} AS MATERIALIZED (
                SELECT DISTINCT e.v AS node
                FROM {prev_e} e JOIN w{r} w ON e.u = w.node),
            d{r} AS MATERIALIZED (
                SELECT node FROM w{r} UNION ALL SELECT node FROM rm{r}),
            a{r} AS MATERIALIZED (
                SELECT node FROM {prev_a}
                WHERE node NOT IN (SELECT node FROM d{r})),
            e{r} AS MATERIALIZED (
                SELECT u, v FROM {prev_e}
                WHERE u IN (SELECT node FROM a{r})
                  AND v IN (SELECT node FROM a{r}))"""
        )
        decided.append(
            f"SELECT node, 1 AS in_mis, {r} AS round_decided FROM w{r}"
            f" UNION ALL "
            f"SELECT node, 0 AS in_mis, {r} AS round_decided FROM rm{r}"
        )
        prev_e, prev_a = f"e{r}", f"a{r}"
    return f"""
        WITH base AS MATERIALIZED (
            SELECT DISTINCT (l_orderkey % {modulus}) AS src,
                   (l_partkey % {modulus}) AS dst
            FROM lineitem
            WHERE l_quantity = 1
              AND (l_orderkey % {modulus}) <> (l_partkey % {modulus})),
        e0 AS MATERIALIZED (
            SELECT src AS u, dst AS v FROM base
            UNION
            SELECT dst AS u, src AS v FROM base),
        a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM e0),
        {", ".join(parts)},
        dec AS ({" UNION ALL ".join(decided)})
        SELECT a0.node::BIGINT AS node,
               coalesce(dec.in_mis, -1)::BIGINT AS in_mis,
               coalesce(dec.round_decided, -1)::BIGINT AS round_decided
        FROM a0 LEFT JOIN dec ON a0.node = dec.node
        ORDER BY node
    """


def matching_sql(
    n_rounds: int = 6, modulus: int = 997, key_base: int = 1_000_000
) -> str:
    """Unrolled hash-greedy maximal-matching SQL over the canonicalized
    (u < v) modular-key graph: edge priority splitmix64(u·key_base + v),
    per-node arg_min pick, matched iff both endpoints picked (grouped
    count = 2) — the identical recurrence of
    ``stages/graph.maximal_matching``."""
    p0 = splitmix64_sql(f"((u * {key_base} + v))::UBIGINT")
    parts, decided = [], []
    prev = "px0"
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""
            mn{r} AS MATERIALIZED (
                SELECT node, arg_min(ek, p) AS ek
                FROM (SELECT u AS node, p, ek FROM {prev}
                      UNION ALL SELECT v AS node, p, ek FROM {prev})
                GROUP BY node),
            w{r} AS MATERIALIZED (
                SELECT ek FROM mn{r} GROUP BY ek HAVING count(*) = 2),
            g{r} AS MATERIALIZED (
                SELECT ek // {key_base} AS node FROM w{r}
                UNION SELECT ek % {key_base} FROM w{r}),
            px{r} AS MATERIALIZED (
                SELECT u, v, ek, p FROM {prev}
                WHERE u NOT IN (SELECT node FROM g{r})
                  AND v NOT IN (SELECT node FROM g{r}))"""
        )
        decided.append(
            f"SELECT (ek // {key_base})::BIGINT AS u,"
            f" (ek % {key_base})::BIGINT AS v,"
            f" {r}::BIGINT AS round_matched FROM w{r}"
        )
        prev = f"px{r}"
    return f"""
        WITH base AS MATERIALIZED (
            SELECT DISTINCT (l_orderkey % {modulus}) AS src,
                   (l_partkey % {modulus}) AS dst
            FROM lineitem
            WHERE l_quantity = 1
              AND (l_orderkey % {modulus}) <> (l_partkey % {modulus})),
        e0 AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM base),
        px0 AS MATERIALIZED (
            SELECT u, v, (u * {key_base} + v) AS ek, {p0} AS p FROM e0),
        {", ".join(parts)}
        {" UNION ALL ".join(decided)}
        ORDER BY u, v
    """


def join_size_cm_sql(d: int = 4, w: int = 256) -> str:
    """DuckDB oracle for analytics.join_size_countmin: rebuilds the
    Count-Min sketch of events.user_id bit-equal (same md5+splitmix cell
    kernel as ``countmin_sql``) and takes the row-wise minimum of the
    squared-cell inner product, next to the exact Σc² self-join size."""
    gold = 0x9E3779B97F4A7C15

    def cell(v: str) -> str:
        u = _MD5_U64.format(v=v)
        x = (
            f"((({u})::HUGEINT + (r::HUGEINT * {gold})) "
            f"% 18446744073709551616)::UBIGINT"
        )
        return f"(({splitmix64_sql(x)}) % {w})"

    return f"""
        WITH reps AS (
            SELECT user_id::VARCHAR AS v, r
            FROM events CROSS JOIN range(0, {d}) AS t(r)),
        cells AS (
            SELECT r, {cell("v")} AS b, count(*)::BIGINT AS n
            FROM reps GROUP BY 1, 2),
        est AS (
            SELECT min(s)::BIGINT AS est
            FROM (SELECT r, sum(n * n) AS s FROM cells GROUP BY r)),
        ex AS (
            SELECT sum(n * n)::BIGINT AS exact
            FROM (SELECT count(*)::BIGINT AS n FROM events
                  GROUP BY user_id))
        SELECT ex.exact AS exact_pairs, est.est AS cm_estimate,
               round_even(est.est / ex.exact::DOUBLE, 6) AS over_ratio
        FROM est, ex
    """


def lsh_topk_sql(
    n_queries: int = 10,
    k: int = 5,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> str:
    """Full SQL replay of ``stages.similarity.lsh_topk``: the deterministic
    Rademacher planes are regenerated here (pure function of (plane, dim) via
    splitmix64 bit 0) and embedded as DOUBLE[] literals; sign bits, band
    codes, the shared-band candidate rule and the exact cosine ranking all
    re-run in DuckDB, so the approximate result is value-hash exact."""
    from .stages.similarity import lsh_signs

    signs = lsh_signs(n_bits, dim)
    per = n_bits // n_bands
    bit_cols = ",\n                   ".join(
        "CASE WHEN list_dot_product(e, ["
        + ",".join(f"{v:.1f}" for v in signs[j])
        + f"]) > 0 THEN 1 ELSE 0 END AS b{j}"
        for j in range(n_bits)
    )
    band_cols = ",\n                   ".join(
        " + ".join(
            f"b{b * per + i} * {1 << (per - 1 - i)}" for i in range(per)
        )
        + f" AS band{b}"
        for b in range(n_bands)
    )
    band_match = " OR ".join(f"q.band{b} = c.band{b}" for b in range(n_bands))
    qbands = ", ".join(f"band{b}" for b in range(n_bands))
    return f"""
        WITH sig AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        bits AS (
            SELECT vec_id,
                   {bit_cols}
            FROM sig),
        band AS (
            SELECT vec_id,
                   {band_cols}
            FROM bits),
        q AS (
            SELECT vec_id AS query_id, {qbands}
            FROM band WHERE vec_id < {n_queries}),
        cand AS (
            SELECT q.query_id, c.vec_id AS neighbor_id
            FROM q JOIN band c
              ON ({band_match}) AND c.vec_id <> q.query_id),
        sims AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])) AS sim
            FROM cand
            JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.neighbor_id),
        ranked AS (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rnk
            FROM sims)
        SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank,
               round_even(sim * 1000000.0, 0) / 1000000.0 AS cosine
        FROM ranked WHERE rnk <= {k}
    """


def mmr_sql(
    k: int = 8, n_cand: int = 20, lam: float = 0.7, query_id: int = 0
) -> str:
    """SQL replay of ``pipelines.analytics.rag_mmr``: the greedy MMR chain
    unrolled as one single-pick CTE per round (the same unrolled-iteration
    pattern as ``pagerank_sql``); ``(1 - lam)`` is written as the literal
    subtraction so both sides compute the identical double."""
    ctes = [
        f"""q AS MATERIALIZED (
            SELECT CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id = {query_id})""",
        f"""cand AS MATERIALIZED (
            SELECT e.vec_id,
                   list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.e) AS rel,
                   CAST(e.embedding AS DOUBLE[]) AS emb
            FROM embeddings e, q WHERE e.vec_id <> {query_id}
            ORDER BY rel DESC, e.vec_id LIMIT {n_cand})""",
        """ps AS MATERIALIZED (
            SELECT a.vec_id AS ai, b.vec_id AS bi,
                   list_cosine_similarity(a.emb, b.emb) AS sim
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id)""",
        f"""p1 AS MATERIALIZED (
            SELECT vec_id, rel, {lam} * rel AS score
            FROM cand ORDER BY rel DESC, vec_id LIMIT 1)""",
    ]
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM p{i}" for i in range(1, r)
        )
        ctes.append(
            f"""p{r} AS MATERIALIZED (
            SELECT c.vec_id, c.rel,
                   {lam} * c.rel - (1 - {lam}) * (
                       SELECT max(sim) FROM ps
                       WHERE ai = c.vec_id AND bi IN ({prev})) AS score
            FROM cand c WHERE c.vec_id NOT IN ({prev})
            ORDER BY score DESC, c.vec_id LIMIT 1)"""
        )
    sel = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, vec_id,"
        f" round_even(rel, 6) AS relevance,"
        f" round_even(score, 6) AS mmr_score FROM p{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n        ".join(ctes) + "\n        " + sel


def blb_sql(n_subsets: int = 8, n_resamples: int = 20) -> str:
    """SQL replay of ``analytics.value_mean_blb``: the bag hash, per-
    resample integer weights, weighted means and per-bag percentile_cont
    bounds all recomputed in DuckDB (linear interpolation == numpy
    default)."""
    bag = f"({splitmix64_sql('event_id::UBIGINT')}) % {n_subsets}"
    wt = (
        f"(({splitmix64_sql(f'(event_id * {n_resamples} + r + 1)::UBIGINT')})"
        " % 4)::DOUBLE"
    )
    return f"""
        WITH w AS (
            SELECT {bag} AS bag, r, {wt} AS wt, value
            FROM events CROSS JOIN range(0, {n_resamples}) AS t(r)),
        m AS (
            SELECT bag, r, sum(wt * value) / sum(wt) AS mean_jr
            FROM w GROUP BY 1, 2),
        q AS (
            SELECT bag,
                   percentile_cont(0.025)
                       WITHIN GROUP (ORDER BY mean_jr) AS lo,
                   percentile_cont(0.975)
                       WITHIN GROUP (ORDER BY mean_jr) AS hi
            FROM m GROUP BY 1)
        SELECT count(*)::BIGINT AS n_subsets,
               round_even(avg(lo), 6) AS ci_lo,
               round_even(avg(hi), 6) AS ci_hi,
               round_even(avg(hi - lo), 6) AS ci_width
        FROM q
    """


def near_dedup_sql(threshold: float = 0.8) -> str:
    """SQL replay of ``neardup.near_dedup_docs`` — the composed recipe:
    the bit-exact minhash/LSH/Jaccard chain of ``minhash_sql`` at the same
    threshold produces the verified pair graph, a recursive transitive
    closure labels components, and survivorship keeps each component's
    minimum doc_id (plus every document in no component)."""
    return f"""
        WITH RECURSIVE mh AS ({minhash_sql(threshold=threshold)}),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM mh
            UNION SELECT id_b, id_a FROM mh),
        r(n, x) AS (
            SELECT DISTINCT a, a FROM edges
            UNION
            SELECT r.n, e.b FROM r JOIN edges e ON e.a = r.x),
        comp AS (SELECT n AS doc_id, min(x) AS rep FROM r GROUP BY n)
        SELECT d.doc_id
        FROM documents d LEFT JOIN comp USING (doc_id)
        WHERE comp.rep IS NULL OR comp.rep = d.doc_id
        ORDER BY d.doc_id
    """


def pca2d_sql() -> str:
    """SQL replay of ``similarity.pca_project`` over a 2-d embedding slice:
    population covariance from one-pass moments, the CLOSED-FORM 2×2
    symmetric eigendecomposition (λ = (a+c)/2 ± sqrt(((a−c)/2)² + b²);
    the eigenvector from whichever diagonal branch is numerically stable —
    (λ−c, b) when a ≥ c, (b, λ−a) otherwise, both algebraically exact),
    the same largest-|coordinate|-positive sign convention (ties to the
    first coordinate, matching ``np.argmax``), then the per-row projection
    (x − mean)·v.  LAPACK ``eigh`` and the closed form agree to ~1e-12 on
    a well-separated 2×2; the 6-dp round absorbs it."""
    return """
        WITH e AS (
            SELECT vec_id, embedding[1]::DOUBLE AS x,
                   embedding[2]::DOUBLE AS y
            FROM embeddings),
        m AS (
            SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
            FROM e),
        cv AS (
            SELECT sx / n AS mx, sy / n AS my,
                   sxx / n - (sx / n) * (sx / n) AS a,
                   sxy / n - (sx / n) * (sy / n) AS b,
                   syy / n - (sy / n) * (sy / n) AS c
            FROM m),
        eg AS (
            SELECT *,
                   (a + c) / 2
                   + sqrt(((a - c) / 2) * ((a - c) / 2) + b * b) AS l1,
                   (a + c) / 2
                   - sqrt(((a - c) / 2) * ((a - c) / 2) + b * b) AS l2
            FROM cv),
        raw AS (
            SELECT *,
                   CASE WHEN a >= c THEN l1 - c ELSE b END AS r1x,
                   CASE WHEN a >= c THEN b ELSE l1 - a END AS r1y,
                   CASE WHEN a >= c THEN b ELSE l2 - c END AS r2x,
                   CASE WHEN a >= c THEN l2 - a ELSE b END AS r2y
            FROM eg),
        vs AS (
            SELECT *,
                   sqrt(r1x * r1x + r1y * r1y) AS n1,
                   sqrt(r2x * r2x + r2y * r2y) AS n2,
                   CASE WHEN (CASE WHEN abs(r1x) >= abs(r1y)
                              THEN r1x ELSE r1y END) < 0
                        THEN -1.0 ELSE 1.0 END AS s1,
                   CASE WHEN (CASE WHEN abs(r2x) >= abs(r2y)
                              THEN r2x ELSE r2y END) < 0
                        THEN -1.0 ELSE 1.0 END AS s2
            FROM raw),
        v AS (
            SELECT mx, my,
                   s1 * r1x / n1 AS v1x, s1 * r1y / n1 AS v1y,
                   s2 * r2x / n2 AS v2x, s2 * r2y / n2 AS v2y
            FROM vs)
        -- np.round(x, 6) = rint(x * 1e6) / 1e6: replicate the scaled form
        SELECT e.vec_id,
               round_even(((e.x - v.mx) * v.v1x
                           + (e.y - v.my) * v.v1y) * 1000000.0, 0)
                   / 1000000.0 AS pc1,
               round_even(((e.x - v.mx) * v.v2x
                           + (e.y - v.my) * v.v2y) * 1000000.0, 0)
                   / 1000000.0 AS pc2
        FROM e, v
        ORDER BY e.vec_id
    """
