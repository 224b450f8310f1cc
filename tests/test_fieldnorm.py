"""Fieldnorm byte-codec properties (tantivy contract; bm25.rs:18-29)."""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from stractt_spark.functions.fieldnorm import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
    quantize_length,
)


def test_table_monotone_and_exact_small():
    assert FIELD_NORMS_TABLE.shape == (256,)
    assert np.all(np.diff(FIELD_NORMS_TABLE.astype(np.int64)) >= 0)
    # exact for 0..=15 (3 mantissa bits + implicit leading bit)
    assert [int(id_to_fieldnorm(i)) for i in range(16)] == list(range(16))


def test_roundtrip_on_table_values():
    for b in range(256):
        v = int(FIELD_NORMS_TABLE[b])
        assert int(id_to_fieldnorm(fieldnorm_to_id(v))) == v


@given(st.integers(min_value=0, max_value=2**31))
def test_floor_quantization(dl):
    q = int(quantize_length(dl))
    b = int(fieldnorm_to_id(dl))
    assert q <= dl
    # next table entry (if any) must exceed dl
    if b < 255:
        assert int(FIELD_NORMS_TABLE[b + 1]) > dl
    # 3 mantissa bits → octave step is value/8, so floor error < 12.5%
    if dl > 15:
        assert (dl - q) / dl < 0.125


def test_vectorized_matches_scalar():
    xs = np.array([0, 1, 7, 8, 15, 16, 17, 100, 1000, 123456], dtype=np.uint64)
    ids = fieldnorm_to_id(xs)
    assert list(ids) == [int(fieldnorm_to_id(int(x))) for x in xs]
    assert list(id_to_fieldnorm(ids)) == [int(id_to_fieldnorm(int(i))) for i in ids]
