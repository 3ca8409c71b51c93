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
