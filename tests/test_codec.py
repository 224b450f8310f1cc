"""Varint/delta codec roundtrips (posting compression, SURVEY.md §2.3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stractt_spark.functions.codec import (
    decode_posting_block,
    delta_decode,
    delta_encode,
    encode_posting_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == vals


def test_varint_known_bytes():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert list(varint_decode(b"")) == []


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert list(delta_decode(delta_encode(arr))) == list(arr)


def test_posting_block_roundtrip():
    ids = np.array([3, 9, 10, 500, 501, 70000], dtype=np.uint64)
    tfs = np.array([1, 2, 1, 9, 1, 300], dtype=np.uint64)
    ib, tb = encode_posting_block(ids, tfs)
    # dense deltas compress to ~1 byte each
    assert len(ib) <= 9
    did, dtf = decode_posting_block(ib, tb)
    assert list(did) == list(ids)
    assert list(dtf) == list(tfs)


def test_truncated_stream_raises():
    import pytest

    with pytest.raises(ValueError):
        varint_decode(b"\x80")
