"""Very wide content rows (SURVEY §7.5): the pipeline must stream them.

Giant ``content`` strings are the reference corpus's hard case (source files
can be MBs).  The flagship stages must (a) carry the sha invariant, (b) emit
triples, and (c) project the wide column away as early as possible — the
mention/triple outputs carry only the sha, never the content.
"""

import hashlib

import pyarrow as pa
import pytest
import ray

from bioie_llm_ray.functions.hashing import add_sha256_column
from bioie_llm_ray.pipelines.kg import extract_triples


@pytest.fixture(scope="module")
def wide_docs():
    # 24 docs × ~1 MB each: vocab mentions sprinkled through heavy filler
    filler = ("lorem ipsum dolor sit amet " * 8000).strip()  # ~200KB
    rows = {k: [] for k in ["repo", "path", "commit", "lang", "content"]}
    for i in range(24):
        content = (
            f"PROT{i} interacts with PROT{(i + 1) % 24}. "
            + filler
            + f" Additionally PROT{i} interacts with PROT{(i + 2) % 24}. "
            + filler
        )
        rows["repo"].append(f"org/repo{i}")
        rows["path"].append(f"big/file_{i}.txt")
        rows["commit"].append("c" * 40)
        rows["lang"].append("txt")
        rows["content"].append(content)
    return pa.table(rows)


class TestWideRows:
    def test_sha_and_triples_stream(self, wide_docs):
        ds = ray.data.from_arrow(wide_docs).map_batches(
            add_sha256_column, batch_format="pyarrow", batch_size=4
        )
        vocab = [f"PROT{i}" for i in range(24)]
        triples = extract_triples(
            ds, vocab, dedup=True, batch_size=4, n_salt=4
        )
        rows = triples.take_all()
        got = {(r["subj"], r["obj"]) for r in rows}
        # each doc emits (PROTi, PROTi+1) and (PROTi, PROTi+2)
        assert (f"PROT0", f"PROT1") in got and (f"PROT0", f"PROT2") in got
        assert len(got) == 48
        # outputs carry only the sha, not the megabyte content column
        assert set(rows[0].keys()) == {"src_sha", "subj", "pred", "obj"}
        expected_sha = hashlib.sha256(
            wide_docs["content"][0].as_py().encode()
        ).hexdigest()
        assert any(r["src_sha"] == expected_sha for r in rows)


class TestVeryWideRows:
    """10-100 MB content rows (SURVEY §7.5 hardening): the KG and minhash
    paths must stream them under an explicit ``target_max_block_size`` —
    blocks degrade to one-row granularity (a block can never be smaller
    than one row) and nothing OOMs or materializes the corpus."""

    @pytest.fixture(scope="class")
    def huge_docs(self):
        # 2 × ~50 MB + 4 × ~16 MB docs; docs 0/1 are planted near-dups
        sentence = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        )
        big = sentence * (50 * 1024 * 1024 // len(sentence))  # ~50 MB
        mid = sentence * (16 * 1024 * 1024 // len(sentence))  # ~16 MB
        contents = [
            "PROT0 interacts with PROT1. " + big,
            "PROT1 interacts with PROT2. " + big + " tail variation",
            "PROT2 interacts with PROT3. " + mid.replace("alpha", "omega"),
            "PROT3 interacts with PROT4. " + mid.replace("beta", "psi"),
            "PROT4 interacts with PROT5. " + mid.replace("gamma", "chi"),
            "PROT5 interacts with PROT0. " + mid.replace("delta", "phi"),
        ]
        return pa.table(
            {
                "repo": [f"org/r{i}" for i in range(6)],
                "path": [f"wide/f{i}.txt" for i in range(6)],
                "commit": ["c" * 40] * 6,
                "lang": ["txt"] * 6,
                "content": contents,
            }
        )

    def test_block_cap_and_triples(self, huge_docs):
        from ray.data import DataContext

        ctx = DataContext.get_current()
        saved = ctx.target_max_block_size
        try:
            ctx.target_max_block_size = 16 * 1024 * 1024
            ds = ray.data.from_arrow(huge_docs).map_batches(
                add_sha256_column, batch_format="pyarrow", batch_size=1
            )
            mat = ds.materialize()
            sizes = [
                ray.get(ref).nbytes for ref in mat.get_internal_block_refs()
            ]
            # wide rows force one-row blocks: at least one block per doc,
            # and no block beyond one max-row + overhead
            assert len(sizes) >= 6
            assert max(sizes) <= 64 * 1024 * 1024
            vocab = [f"PROT{i}" for i in range(6)]
            triples = extract_triples(
                mat, vocab, dedup=True, batch_size=1, n_salt=2
            )
            rows = triples.take_all()
            got = {(r["subj"], r["obj"]) for r in rows}
            assert ("PROT0", "PROT1") in got and ("PROT5", "PROT0") in got
            assert set(rows[0].keys()) == {"src_sha", "subj", "pred", "obj"}
        finally:
            ctx.target_max_block_size = saved

    def test_minhash_dedup_on_huge_docs(self, huge_docs):
        from ray.data import DataContext

        from bioie_llm_ray.stages.neardup import (
            minhash_lsh_candidates,
            verify_jaccard_pairs_join,
        )

        ctx = DataContext.get_current()
        saved = ctx.target_max_block_size
        try:
            ctx.target_max_block_size = 16 * 1024 * 1024
            docs = pa.table(
                {
                    "doc_id": pa.array(range(6), type=pa.int64()),
                    "text": huge_docs["content"],
                }
            )
            ds = ray.data.from_arrow(docs)
            cand = minhash_lsh_candidates(ds)
            verified = verify_jaccard_pairs_join(
                cand, ds, threshold=0.5
            ).to_pandas()
            pairs = set(zip(verified["id_a"], verified["id_b"]))
            # the planted 50 MB near-dup pair survives candidates + verify
            assert (0, 1) in pairs
        finally:
            ctx.target_max_block_size = saved
