"""Property-based tests (hypothesis) for the pure kernels.

These run WITHOUT Ray: they pin the scalar kernels that every distributed
stage builds on — parser parity vs the reference-semantics oracle
(``parity.py``), alignment invariants, hash-sampling determinism.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bioie_llm_ray import parity
from bioie_llm_ray.functions.align import sort_and_pad
from bioie_llm_ray.functions.hashing import (
    hash_bucket_ints,
    hash_sample_mask,
    stable_hash_u64,
)
from bioie_llm_ray.functions.parsing import (
    parse_choice_response,
    parse_entity_response,
)

names = st.text(
    alphabet=st.sampled_from("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"),
    min_size=1,
    max_size=8,
)
sentences = st.text(
    alphabet=st.sampled_from(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_ ,."
    ),
    max_size=120,
)


class TestParserParity:
    @settings(max_examples=300, deadline=None)
    @given(response=sentences, gold=st.lists(names, max_size=6))
    def test_entity_parser_matches_reference(self, response, gold):
        assert parse_entity_response(response, gold) == (
            parity.ref_clean_response_entity(response, gold)
        )

    @settings(max_examples=300, deadline=None)
    @given(
        response=sentences,
        choices=st.lists(names, min_size=1, max_size=5, unique=True),
    )
    def test_choice_parser_matches_reference(self, response, choices):
        got = parse_choice_response(response, choices)
        want = parity.ref_clean_response_choice(response, choices)
        # repo normalizes the miss sentinel to lower-case 'none'
        # (documented divergence in parity.py)
        assert got == (want.lower() if want == "None" else want)


class TestAlignmentInvariants:
    @settings(max_examples=200, deadline=None)
    @given(
        true=st.lists(names, min_size=1, max_size=12, unique=True),
        k=st.integers(min_value=1, max_value=10),
        data=st.data(),
    )
    def test_sort_and_pad_shape_and_membership(self, true, k, data):
        # domain contract: pred is what parse_entity_response returns — a
        # subset of gold, in some order (possibly with repeats upstream)
        pred = data.draw(
            st.lists(st.sampled_from(true), max_size=len(true) * 2)
        )
        p, t = sort_and_pad(pred, true, max_entity_list_len=k)
        assert len(p) == len(t)
        assert len(p) <= min(k, len(set(true))) or len(p) == len(t) <= k
        assert all(x == "NONE" or x in pred for x in p)
        assert all(x in true for x in t)
        # matched positions come first and agree
        matched = [i for i, (a, b) in enumerate(zip(p, t)) if a == b != "NONE"]
        assert matched == list(range(len(matched)))
        # every matched name is genuinely common to pred and gold
        assert all(p[i] in pred and p[i] in true for i in matched)


class TestHashDeterminism:
    @settings(max_examples=100, deadline=None)
    @given(keys=st.lists(names, min_size=1, max_size=50))
    def test_stable_hash_is_order_and_partition_invariant(self, keys):
        h1 = stable_hash_u64(keys)
        h2 = np.concatenate(
            [stable_hash_u64(keys[:3]), stable_hash_u64(keys[3:])]
        ) if len(keys) > 3 else stable_hash_u64(keys)
        assert (h1 == h2).all()

    @settings(max_examples=100, deadline=None)
    @given(
        keys=st.lists(names, min_size=1, max_size=50),
        num=st.integers(min_value=0, max_value=10),
    )
    def test_sample_mask_subset_monotone(self, keys, num):
        m1 = hash_sample_mask(keys, num, 10)
        m2 = hash_sample_mask(keys, min(num + 1, 10), 10)
        assert (m1 <= m2).all()  # larger keep-rate only adds rows

    @settings(max_examples=100, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50
        ),
        b=st.integers(min_value=1, max_value=64),
    )
    def test_int_buckets_in_range_and_stable(self, vals, b):
        ids = hash_bucket_ints(np.array(vals, dtype=np.int64), b)
        assert ((ids >= 0) & (ids < b)).all()
        assert (ids == hash_bucket_ints(np.array(vals, dtype=np.int64), b)).all()


class TestBloomFilterProperties:
    @given(
        st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=500)
    )
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives_ints(self, keys):
        from bioie_llm_ray.functions.hashing import BloomFilter

        bf = BloomFilter.build(np.array(keys, dtype=np.int64), fpp=0.01)
        assert bf.contains_many(np.array(keys, dtype=np.int64)).all()

    @given(st.lists(names, min_size=1, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives_strings(self, keys):
        from bioie_llm_ray.functions.hashing import BloomFilter

        bf = BloomFilter.build(keys, fpp=0.01)
        assert bf.contains_many(keys).all()

    @given(
        st.lists(st.integers(min_value=0, max_value=10**9), min_size=2, max_size=400),
        st.integers(min_value=1, max_value=5),
    )
    @settings(max_examples=30, deadline=None)
    def test_partial_merge_equals_whole_build(self, keys, n_parts):
        from bioie_llm_ray.functions.hashing import BloomFilter

        arr = np.array(keys, dtype=np.int64)
        whole = BloomFilter.build(arr, m_bits=4096, k=5)
        parts = np.array_split(arr, n_parts)
        merged = BloomFilter.build(parts[0], m_bits=4096, k=5)
        for p in parts[1:]:
            if len(p):
                merged = merged.merge(BloomFilter.build(p, m_bits=4096, k=5))
        assert (merged.words == whole.words).all()


class TestBatchShingleProperties:
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FFF
                ),
                max_size=60,
            ),
            min_size=0,
            max_size=25,
        ),
        st.integers(min_value=1, max_value=5),
    )
    @settings(max_examples=60, deadline=None)
    def test_batch_shingles_equal_per_doc(self, docs, n_shingle):
        """The batch-vectorized shingle builder equals the per-doc kernel
        element-for-element on ARBITRARY unicode text (whitespace runs,
        empty docs, short docs, every shingle width)."""
        import pyarrow as pa

        from bioie_llm_ray.stages.neardup import (
            _batch_shingle_hashes,
            _token_hashes,
        )

        S, soff = _batch_shingle_hashes(pa.array(docs, type=pa.string()), n_shingle)
        assert len(soff) == len(docs) + 1
        for d, t in enumerate(docs):
            want = _token_hashes(t, n_shingle)
            got = S[soff[d] : soff[d + 1]]
            assert np.array_equal(got, want), (d, repr(t))

    @given(
        st.lists(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            min_size=1,
            max_size=200,
        ),
        st.integers(min_value=1, max_value=64),
    )
    @settings(max_examples=40, deadline=None)
    def test_composite_bucket_deterministic_and_in_range(self, keys, nb):
        """bucket_ids_for_columns on int columns (nulls included) is
        deterministic, in range, and equal to the null→0 pinned form."""
        import pyarrow as pa

        from bioie_llm_ray.functions.hashing import bucket_ids_for_columns

        col = pa.array(keys, type=pa.int64())
        ids = bucket_ids_for_columns([col, col], nb)
        assert ((0 <= ids) & (ids < nb)).all()
        pinned = pa.array([0 if k is None else k for k in keys], type=pa.int64())
        assert (bucket_ids_for_columns([pinned, pinned], nb) == ids).all()
