"""Bit-exactness of the SQL kernel reimplementations in oracle.py.

The DuckDB oracles for dedup_simhash / distinct_users_hll rebuild the
md5+splitmix64 hash kernels in SQL (mod-2^64 multiplies decomposed into
32-bit HUGEINT halves, because DuckDB UBIGINT multiplication raises on
overflow).  These tests pin the SQL expressions bit-exact against the
numpy implementations they mirror.
"""

import hashlib

import duckdb
import numpy as np
import pytest

from bioie_llm_ray import oracle as O
from bioie_llm_ray.functions.hashing import _splitmix64, stable_hash_u64


@pytest.mark.parametrize(
    "x",
    [0, 1, 2**32 - 1, 2**32, 2**63 - 1, 2**63, 2**64 - 1, 123456789012345],
)
def test_splitmix64_sql_bit_exact(x):
    want = int(_splitmix64(np.array([x], dtype=np.uint64))[0])
    got = duckdb.sql(f"SELECT {O.splitmix64_sql(str(x))}").fetchone()[0]
    assert got == want


def test_md5_u64_sql_matches_stable_hash():
    for s in ["", "hello", "user_42", "πρωτεΐνη"]:
        want = int(stable_hash_u64([s])[0])
        lit = "'" + s.replace("'", "''") + "'"
        got = duckdb.sql(
            "SELECT " + O._MD5_U64.format(v=lit)
        ).fetchone()[0]
        assert got == want, s


def test_mulmod64_sql_wraps_like_uint64():
    cases = [(2**64 - 1, 0xBF58476D1CE4E5B9), (2**63, 3), (12345, 67890)]
    for z, c in cases:
        want = (z * c) % (1 << 64)
        got = duckdb.sql(
            f"SELECT {O._mulmod64_sql(f'{z}::HUGEINT', c)}"
        ).fetchone()[0]
        assert int(got) == want


def test_mulmod64_vars_sql_wraps_like_uint64():
    cases = [
        (2**64 - 1, 2**61 - 2),
        (2**63 + 12345, 2**60 + 7),
        (0xD41D8CD98F00B204, 0x100000001B3),
        (1, 2**64 - 1),
    ]
    for x, a in cases:
        want = (x * a) % (1 << 64)
        got = duckdb.sql(
            f"SELECT {O._mulmod64_vars_sql(f'{x}::HUGEINT', f'{a}::HUGEINT')}"
        ).fetchone()[0]
        assert int(got) == want, (x, a)


def test_shingle_hash_sql_matches_token_hashes():
    """The staged splitmix-rolled 3-shingle kernel in minhash_sql must equal
    stages/neardup._token_hashes for every token-count regime (0/1/2/3+)."""
    from bioie_llm_ray.stages.neardup import _token_hashes

    texts = [
        "",
        "one",
        "two words",
        "three word text",
        "a longer text with repeated words repeated words here",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )
    # reuse the oracle's CTE chain up to `sset` by wrapping the full query:
    # pull the distinct shingle sets out via a modified tail
    full = O.minhash_sql()
    head = full[: full.index("perms(p, a, b) AS")]
    q = head + "x AS (SELECT 1)\nSELECT doc_id, s FROM sset ORDER BY doc_id, s"
    got = {}
    for doc_id, s in con.execute(q).fetchall():
        got.setdefault(doc_id, set()).add(int(s))
    for i, t in enumerate(texts):
        want = set(int(v) for v in _token_hashes(t, 3))
        assert got[i] == want, (i, t)


def test_minhash_oracle_matches_pipeline_on_fixture_corpus(tmp_path):
    """End-to-end: planted near-dups through the REAL Ray minhash pipeline
    vs the full SQL oracle — pairs and jaccard bit-equal."""
    import pandas as pd
    import ray

    from bioie_llm_ray.pipelines import analytics as A

    rng = np.random.RandomState(31)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for d in range(40):
        words = list(rng.choice(vocab, 30))
        docs.append(" ".join(words))
        if d % 4 == 0:  # planted near-dup: one word changed
            mut = words[:]
            mut[rng.randint(len(mut))] = "zz"
            docs.append(" ".join(mut))
    df = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs, "lang": "en",
         "source": "t", "n_chars": [len(d) for d in docs]}
    )
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)

    got = A.dedup_minhash(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(O.minhash_sql()).fetchdf()
    g = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    w = want.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(g) > 0  # planted dups must surface
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
