"""Deterministic synthetic fixtures mirroring the reference's input shapes.

Generates (seed-fixed, scale-parameterized) the raw files the reference
consumes (FIXTURES.md) plus the gold knowledge base they encode, so tests and
the parity harness can compare the Ray pipelines against an independently
derived oracle:

- STRING-shaped: ``9606.protein.info.v11.5.txt`` (TSV, header),
  ``9606.protein.links.v11.5.txt`` (space-delimited, header, both directions),
  Negatome CSV (headerless, utf-8-sig) — formats per
  /root/reference/src/data_readers/string_reader.py:82-106.
- KEGG-shaped: ``kegg.pathway.hsa``, ``kegg.hsa.genes``,
  ``kegg.hsa.pathway.genes`` TSVs and dose-ranking line files — formats per
  kegg_reader.py:107-150.
- INDRA-shaped: ``{train,dev,test}.json`` JSONL statements — shape per
  indra_reader.py:38-79, including rows that violate the unique-mention
  filter.
- ``docs`` Parquet per BASELINE.json input_hint: (repo, path, commit, lang,
  content) where content embeds gold mentions, with the reference's
  adversarial boundary cases (EB1/RHEB, PSD/PSD-95,
  base_processor.py:1279-1293).

Everything derives from ``numpy.random.RandomState(seed)`` — no global RNG,
no wall clock.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np

BOUNDARY_NAMES = ["EB1", "RHEB", "PSD", "PSD-95", "GENE_A"]

INDRA_RELATION_TYPES = [
    "Activation",
    "Inhibition",
    "Phosphorylation",
    "Dephosphorylation",
    "Ubiquitination",
    "Deubiquitination",
]

_REL_VERB = {
    "Activation": "activates",
    "Inhibition": "inhibits",
    "Phosphorylation": "phosphorylates",
    "Dephosphorylation": "dephosphorylates",
    "Ubiquitination": "ubiquitinates",
    "Deubiquitination": "deubiquitinates",
}


@dataclass
class FixtureKB:
    """The gold knowledge the fixture files encode (the parity oracle)."""

    proteins: list[str] = field(default_factory=list)
    protein_ids: dict[str, str] = field(default_factory=dict)  # name -> id
    adjacency: dict[str, list[str]] = field(default_factory=dict)  # symmetric
    negatome: list[tuple[str, str]] = field(default_factory=list)
    pathways: dict[str, str] = field(default_factory=dict)  # id -> name
    gene_aliases: dict[str, list[str]] = field(default_factory=dict)  # id -> aliases
    pathway_genes: dict[str, list[str]] = field(default_factory=dict)  # pid -> gene ids
    dose_ranking: dict[str, list[str]] = field(default_factory=dict)  # kind -> pids
    indra: dict[str, list[dict]] = field(default_factory=dict)  # split -> statements


def make_kb(
    n_proteins: int = 60,
    n_pathways: int = 12,
    n_genes: int = 40,
    n_indra_per_class: int = 8,
    n_hubs: int = 2,
    seed: int = 42,
) -> FixtureKB:
    rng = np.random.RandomState(seed)
    kb = FixtureKB()

    names = [f"PROT{i}" for i in range(n_proteins)] + BOUNDARY_NAMES
    kb.proteins = names
    kb.protein_ids = {
        name: f"9606.ENSP{i:011d}" for i, name in enumerate(names)
    }

    # undirected edges: uniform degree plus hub nodes (TP53 analogs) to
    # exercise salted-key skew handling (SURVEY §7.4)
    edges: set[tuple[str, str]] = set()
    n_all = len(names)
    for i, name in enumerate(names):
        deg = rng.randint(3, 8)
        for j in rng.choice(n_all, size=deg, replace=False):
            if int(j) != i:
                a, b = sorted((name, names[int(j)]))
                edges.add((a, b))
    for h in range(n_hubs):
        hub = names[h]
        for j in rng.choice(n_all, size=int(0.6 * n_all), replace=False):
            if names[int(j)] != hub:
                a, b = sorted((hub, names[int(j)]))
                edges.add((a, b))
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    kb.adjacency = {k: sorted(v) for k, v in sorted(adj.items())}

    # negatome: pairs disjoint from the positive edge set
    neg: set[tuple[str, str]] = set()
    while len(neg) < n_proteins:
        i, j = rng.choice(n_all, size=2, replace=False)
        a, b = sorted((names[int(i)], names[int(j)]))
        if (a, b) not in edges and a != b:
            neg.add((a, b))
    kb.negatome = sorted(neg)

    # KEGG: pathways, genes with aliases, membership
    kb.pathways = {
        f"hsa{10000 + i:05d}": f"Pathway {i} signaling" for i in range(n_pathways)
    }
    kb.gene_aliases = {
        f"hsa:{1000 + g}": [f"GENE{g}", f"ALIAS{g}A", f"ALIAS{g}B"]
        for g in range(n_genes)
    }
    gene_ids = list(kb.gene_aliases)
    for pid in kb.pathways:
        size = rng.randint(4, 12)
        members = rng.choice(len(gene_ids), size=size, replace=False)
        kb.pathway_genes[pid] = [gene_ids[int(m)] for m in members]
    pids = list(kb.pathways)
    kb.dose_ranking = {
        "high": [pids[int(i)] for i in rng.permutation(len(pids))],
        "low": [pids[int(i)] for i in rng.permutation(len(pids))],
    }

    # INDRA statements per split, with known labels and exact spans
    for split, mult in [("train", 2), ("dev", 1), ("test", 2)]:
        stmts = []
        sid = 0
        for rel in INDRA_RELATION_TYPES:
            for _ in range(n_indra_per_class * mult):
                i, j = rng.choice(n_proteins, size=2, replace=False)
                e1, e2 = f"PROT{int(i)}", f"PROT{int(j)}"
                text = f"Our data show that {e1} {_REL_VERB[rel]} {e2} in vivo."
                s1 = text.index(e1)
                s2 = text.index(e2)
                stmts.append(
                    {
                        "id": f"{split}-{rel}-{sid}",
                        "text": text,
                        "rel_type": rel,
                        "entity_1": [e1, [s1, s1 + len(e1)]],
                        "entity_2": [e2, [s2, s2 + len(e2)]],
                    }
                )
                sid += 1
        # one violating row per split: entity_1 mentioned twice (filter test,
        # indra_reader.py:72)
        stmts.append(
            {
                "id": f"{split}-dup",
                "text": "PROT0 binds PROT0 and PROT1 here.",
                "rel_type": "Activation",
                "entity_1": ["PROT0", [0, 5]],
                "entity_2": ["PROT1", [22, 27]],
            }
        )
        kb.indra[split] = stmts
    return kb


def write_string_files(kb: FixtureKB, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "protein.info.txt"), "w") as f:
        f.write("#string_protein_id\tpreferred_name\tprotein_size\tannotation\n")
        for name in kb.proteins:
            f.write(f"{kb.protein_ids[name]}\t{name}\t{100 + len(name)}\tsynthetic protein {name}\n")
    # links: both directions, like the real STRING dump
    with open(os.path.join(out_dir, "protein.links.txt"), "w") as f:
        f.write("protein1 protein2 combined_score\n")
        for a, nbrs in kb.adjacency.items():
            for b in nbrs:
                f.write(f"{kb.protein_ids[a]} {kb.protein_ids[b]} {500 + (len(a) + len(b)) % 400}\n")
    with open(os.path.join(out_dir, "negatome.csv"), "w", encoding="utf-8-sig") as f:
        for a, b in kb.negatome:
            f.write(f"{a},{b}\n")


def write_kegg_files(kb: FixtureKB, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "kegg.pathway.hsa"), "w") as f:
        for pid, name in kb.pathways.items():
            f.write(f"path:{pid}\t{name} - Homo sapiens (human)\n")
    with open(os.path.join(out_dir, "kegg.hsa.genes"), "w") as f:
        for gid, aliases in kb.gene_aliases.items():
            f.write(f"{gid}\t{', '.join(aliases)}; synthetic gene description\n")
    with open(os.path.join(out_dir, "kegg.hsa.pathway.genes"), "w") as f:
        for pid, gids in kb.pathway_genes.items():
            for gid in gids:
                f.write(f"{gid}\tpath:{pid}\n")
    for kind, pids in kb.dose_ranking.items():
        with open(os.path.join(out_dir, f"{kind}_dose_pathways.txt"), "w") as f:
            for pid in pids:
                f.write(pid + "\n")


def write_indra_files(kb: FixtureKB, out_dir: str) -> None:
    """JSONL in the reference's *original* shape (indra_reader.py:42-57)."""
    os.makedirs(out_dir, exist_ok=True)
    for split, stmts in kb.indra.items():
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            for s in stmts:
                entry = {
                    "id": s["id"],
                    "text": s["text"],
                    "relation": [
                        {
                            "relation_type": s["rel_type"],
                            "entity_1": s["entity_1"][0],
                            "entity_1_idx": s["entity_1"][1],
                            "entity_2": s["entity_2"][0],
                            "entity_2_idx": s["entity_2"][1],
                        }
                    ],
                }
                f.write(json.dumps(entry) + "\n")


def make_docs_table(kb: FixtureKB, n_rows: int = 200, seed: int = 43):
    """The primary input table (repo, path, commit, lang, content).

    Content sentences embed gold PPI mentions from the adjacency plus
    adversarial boundary sentences; returns a pyarrow Table with the gold
    triples each row encodes kept alongside for oracle checks.
    """
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    queries = list(kb.adjacency)
    langs = ["py", "md", "txt", "rst"]
    rows = {k: [] for k in ["repo", "path", "commit", "lang", "content"]}
    gold: list[list[tuple[str, str, str]]] = []
    for i in range(n_rows):
        q = queries[int(rng.randint(len(queries)))]
        nbrs = kb.adjacency[q]
        take = rng.randint(1, min(len(nbrs), 6) + 1)
        chosen = [nbrs[int(x)] for x in rng.choice(len(nbrs), size=take, replace=False)]
        sentence = f"{q} interacts with {', '.join(chosen)}."
        if rng.rand() < 0.15:
            # adversarial: embed a boundary-violating token (must NOT match)
            sentence += f" See also x{chosen[0]}x variants."
        rows["repo"].append(f"org{i % 7}/repo{i % 13}")
        rows["path"].append(f"src/module_{i}.txt")
        rows["commit"].append(hashlib.sha1(f"c{i}".encode()).hexdigest())
        rows["lang"].append(langs[i % len(langs)])
        rows["content"].append(sentence)
        gold.append([(q, "interacts_with", c) for c in chosen])
    table = pa.table(rows)
    return table, gold


def make_code_repo_table(
    n_files: int = 120,
    n_modules: int = 24,
    n_repos: int = 9,
    seed: int = 47,
    vendored_frac: float = 0.12,
):
    """Versioned source-code repository table (BASELINE.json input_hint).

    Columns: (repo, path, commit, commit_ts, lang, content).  Each logical
    file carries 1–3 commit versions with strictly increasing ``commit_ts``
    (so "latest per (repo, path)" has a unique answer); content is code-like
    with ``import <module>`` statements (only the LATEST version's imports
    belong in the import graph); a ``vendored_frac`` slice of files is
    byte-identical content replicated into a second repo (vendored-library
    detection via the content sha).

    Each file opens with an SPDX license header keyed by its repo (one
    repo in four carries none), so license-policy scans have a signal —
    vendored copies keep the ORIGINAL repo's header verbatim, planting
    realistic license contamination (GPL files inside permissive repos).
    Each file defines a stable ``fn_<i>`` and CALLS two other files'
    functions (``y = fn_<t>()``), giving a resolvable cross-repo call
    graph; the call targets are fixed per file while the return constant
    varies per version, so the latest-snapshot call graph is unambiguous.

    Everything is RandomState(seed)-deterministic — the DuckDB oracles re-run
    the same logic in SQL over the written parquet.
    """
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    langs = ["py", "go", "rs", "js"]
    spdx = ["MIT", "Apache-2.0", "GPL-3.0-only", None]
    modules = [f"module_{i}" for i in range(n_modules)]
    rows: dict[str, list] = {
        k: []
        for k in ["repo", "path", "commit", "commit_ts", "lang", "content"]
    }

    def emit(repo: str, path: str, lang: str, version: int, ts: int, content: str):
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(
            hashlib.sha1(f"{repo}|{path}|{version}".encode()).hexdigest()
        )
        rows["commit_ts"].append(ts)
        rows["lang"].append(lang)
        rows["content"].append(content)

    vendored_every = max(2, int(round(1 / vendored_frac))) if vendored_frac else 0
    for i in range(n_files):
        repo = f"org{i % 3}/repo{i % n_repos}"
        lang = langs[i % len(langs)]
        path = f"src/pkg_{i % 11}/file_{i}.{lang}"
        n_versions = int(rng.randint(1, 4))
        base_ts = 1_600_000_000 + int(rng.randint(0, 10_000)) * 1000
        content = ""
        for v in range(n_versions):
            k = int(rng.randint(1, 5))
            imps = sorted(
                modules[int(x)]
                for x in rng.choice(n_modules, size=k, replace=False)
            )
            body = "".join(f"import {m}\n" for m in imps)
            # decoy that must NOT match the import extractor
            decoy = f"# reimport {modules[int(rng.randint(n_modules))]}x\n"
            # planted leaks for the secret/PII scan: every 5th file carries a
            # per-VERSION api key (so a rotated key disappears from the
            # latest snapshot), every 7th a contact email in all versions
            leak = ""
            if i % 5 == 0:
                tok = hashlib.sha1(f"key|{i}|{v}".encode()).hexdigest()[:12]
                leak += f'API_TOKEN = "sk_live_{tok}"\n'
            if i % 7 == 0:
                leak += f"# contact: dev_{i}@example.com\n"
            lic = spdx[(i % n_repos) % len(spdx)]
            header = (
                f"# SPDX-License-Identifier: {lic}\n" if lic else ""
            )
            t1 = (i * 7 + 1) % n_files
            t2 = (i * 13 + 5) % n_files
            t1 = (t1 + 1) % n_files if t1 == i else t1
            t2 = (t2 + 1) % n_files if t2 == i else t2
            content = (
                header
                + body
                + decoy
                + leak
                + f"def fn_{i}():\n"
                + f"    y = fn_{t1}()\n"
                + f"    z = fn_{t2}()\n"
                + f"    return y + z + {v}\n"
            )
            # 500k-second version spacing: a global as-of cut then lands
            # BETWEEN versions of ~10% of files, so commit_diff's
            # "modified" class is populated (1-second spacing never was)
            emit(repo, path, lang, v, base_ts + v * 500_000, content)
        if vendored_every and i % vendored_every == 0:
            # vendor the file's LATEST content into a sibling repo verbatim
            emit(
                f"org{(i + 1) % 3}/vendor{i % n_repos}",
                f"third_party/file_{i}.{lang}",
                lang,
                0,
                base_ts + 50,
                content,
            )
    return pa.table(
        {
            "repo": pa.array(rows["repo"], type=pa.string()),
            "path": pa.array(rows["path"], type=pa.string()),
            "commit": pa.array(rows["commit"], type=pa.string()),
            "commit_ts": pa.array(rows["commit_ts"], type=pa.int64()),
            "lang": pa.array(rows["lang"], type=pa.string()),
            "content": pa.array(rows["content"], type=pa.string()),
        }
    )


def write_all(base_dir: str, kb: FixtureKB | None = None, n_docs: int = 200) -> FixtureKB:
    """Write every fixture family under ``base_dir``; returns the gold KB."""
    import pyarrow.parquet as pq

    kb = kb or make_kb()
    write_string_files(kb, os.path.join(base_dir, "STRING"))
    write_kegg_files(kb, os.path.join(base_dir, "KEGG"))
    write_indra_files(kb, os.path.join(base_dir, "INDRA"))
    docs, gold = make_docs_table(kb, n_rows=n_docs)
    os.makedirs(os.path.join(base_dir, "docs"), exist_ok=True)
    pq.write_table(docs, os.path.join(base_dir, "docs", "docs.parquet"))
    with open(os.path.join(base_dir, "docs", "gold_triples.json"), "w") as f:
        json.dump(gold, f)
    os.makedirs(os.path.join(base_dir, "code"), exist_ok=True)
    pq.write_table(
        make_code_repo_table(),
        os.path.join(base_dir, "code", "code_repo.parquet"),
    )
    return kb
