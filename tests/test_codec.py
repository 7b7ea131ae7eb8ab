"""Varbyte/delta codec: round-trip property tests (SURVEY.md §5.5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from document_retrieval_system_spark.operators.codec import (
    delta_decode,
    delta_encode,
    decode_positions,
    encode_positions,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert vb_decode(vb_encode(arr)).tolist() == values


def test_varbyte_edges():
    for edge in ([], [0], [1], [127], [128], [2**32], [2**63 - 1], [0, 0, 0]):
        arr = np.asarray(edge, dtype=np.uint64)
        assert vb_decode(vb_encode(arr)).tolist() == edge


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200)
    .map(lambda xs: sorted(set(xs)))
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.asarray(ids, dtype=np.uint64)
    assert delta_decode(delta_encode(arr)).tolist() == ids


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10000), max_size=50)
        .map(lambda xs: sorted(set(xs))),
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(pos_lists):
    buf = encode_positions(pos_lists)
    out = decode_positions(buf, len(pos_lists))
    assert [p.tolist() for p in out] == pos_lists


def test_compression_ratio_dense_ids():
    """Dense sorted docIDs must compress to ~1 byte/posting."""
    ids = np.arange(0, 100000, 3, dtype=np.uint64)
    encoded = vb_encode(delta_encode(ids))
    assert len(encoded) <= ids.size + 2  # delta=3 -> 1 byte each


def test_split_position_payloads_inverts_concatenation():
    """Byte-slicing a block payload must recover exactly the per-doc
    segments whose concatenation built it (the re-blocking identity that
    shard rewrites and compaction rely on)."""
    import random

    from document_retrieval_system_spark.operators.codec import (
        encode_position_payloads,
        encode_positions,
        split_position_payloads,
    )

    rng = random.Random(13)
    for trial in range(25):
        lists = []
        for _ in range(rng.randint(1, 40)):
            n = rng.randint(1, 30)
            pos = sorted(rng.sample(range(100000), n))
            lists.append(pos)
        per_doc = encode_position_payloads(lists)
        block = b"".join(per_doc)
        assert block == encode_positions(lists)
        assert split_position_payloads(block, len(lists)) == per_doc
    assert split_position_payloads(b"", 0) == []


# --------------------------------------------------------------------------
# Simple8b
# --------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
                max_size=600))
@settings(max_examples=200, deadline=None)
def test_s8b_roundtrip(values):
    from document_retrieval_system_spark.operators.codec import (
        s8b_decode,
        s8b_encode,
    )

    arr = np.asarray(values, dtype=np.uint64)
    got = s8b_decode(s8b_encode(arr))
    assert got.dtype == np.uint64
    assert np.array_equal(got, arr)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
                max_size=400))
@settings(max_examples=100, deadline=None)
def test_s8b_agrees_with_varbyte(values):
    from document_retrieval_system_spark.operators.codec import (
        s8b_decode,
        s8b_encode,
        vb_decode,
        vb_encode,
    )

    arr = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(s8b_decode(s8b_encode(arr)),
                          vb_decode(vb_encode(arr)))


def test_s8b_edges_and_packing_density():
    from document_retrieval_system_spark.operators.codec import (
        s8b_decode,
        s8b_encode,
    )

    assert s8b_encode(np.empty(0, dtype=np.uint64)) == b""
    assert s8b_decode(b"").size == 0
    # 240 zeros pack into ONE 8-byte word (selector 0)
    assert len(s8b_encode(np.zeros(240, dtype=np.uint64))) == 8
    # 60 one-bit values pack into one word
    assert len(s8b_encode(np.ones(60, dtype=np.uint64))) == 8
    # max 60-bit value round-trips alone
    big = np.asarray([(1 << 60) - 1], dtype=np.uint64)
    assert np.array_equal(s8b_decode(s8b_encode(big)), big)
    # dense docID deltas (all 1s, the sorted-dense-corpus case) cost
    # well under 1 byte/posting — the win over varbyte's 1-byte floor
    deltas = np.ones(1200, dtype=np.uint64)
    assert len(s8b_encode(deltas)) / deltas.size < 0.2


def test_s8b_rejects_values_over_60_bits():
    import pytest

    from document_retrieval_system_spark.operators.codec import s8b_encode

    with pytest.raises(ValueError, match="60 bits"):
        s8b_encode(np.asarray([1 << 60], dtype=np.uint64))


def test_s8b_mixed_width_tail():
    from document_retrieval_system_spark.operators.codec import (
        s8b_decode,
        s8b_encode,
    )

    # widths forcing several selector classes + a partial tail window
    arr = np.asarray([0] * 300 + [1] * 61 + [2 ** 30] * 3 + [5],
                     dtype=np.uint64)
    assert np.array_equal(s8b_decode(s8b_encode(arr)), arr)
