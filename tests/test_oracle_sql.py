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
