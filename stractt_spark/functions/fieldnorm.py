"""Byte-quantized fieldnorm codec (tantivy contract).

The reference's BM25 ``dl`` (document length) is not the exact token count:
tantivy stores one byte per doc per field and decodes it back through a
256-entry table before the tf-norm is computed
(``FieldNormReader::id_to_fieldnorm``; reference usage at
``/root/reference/src/ranking/bm25.rs:18-29,119-129``).  Reproducing this
quantization is required for score-identity (SURVEY.md §2.5, §7 hard parts).

The codec is the classic Lucene ``SmallFloat`` 3-mantissa-bit scheme that
tantivy ports: a byte ``b`` encodes exponent ``e = b >> 3`` and mantissa
``m = b & 7``::

    decode(b) = m                    if e == 0      (0..7 exact)
              = (m | 8) << (e - 1)   otherwise

which is exact for lengths 0..=15 and then keeps 8 steps per octave
(≤ ~6% relative error).  ``encode`` maps a length to the largest id whose
decoded value does not exceed it (floor quantization), i.e. a binary search
over the monotone 256-entry table — identical to
``fieldnorm_to_id``'s ``binary_search(...).unwrap_or(idx - 1)``.

Values are clamped to the table maximum (``decode(255) = 15 << 30``).
All functions are numpy-vectorized for use inside Arrow UDF kernels.
"""

from __future__ import annotations

import numpy as np

_ids = np.arange(256, dtype=np.uint64)
_e = _ids >> 3
_m = _ids & 7
FIELD_NORMS_TABLE: np.ndarray = np.where(_e == 0, _m, (_m | 8) << (_e - 1)).astype(
    np.uint64
)
del _ids, _e, _m

_MAX_NORM = int(FIELD_NORMS_TABLE[-1])


def id_to_fieldnorm(ids: np.ndarray | int) -> np.ndarray | int:
    """Decode byte id(s) → quantized length (the ``dl`` used in BM25)."""
    if np.isscalar(ids):
        return int(FIELD_NORMS_TABLE[int(ids)])
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.int64)]


def fieldnorm_to_id(lengths: np.ndarray | int) -> np.ndarray | int:
    """Encode exact length(s) → byte id (floor to nearest table entry)."""
    scalar = np.isscalar(lengths)
    arr = np.atleast_1d(np.asarray(lengths, dtype=np.uint64))
    arr = np.minimum(arr, _MAX_NORM)
    # searchsorted 'right' - 1 == largest idx with table[idx] <= value
    ids = np.searchsorted(FIELD_NORMS_TABLE, arr, side="right") - 1
    ids = ids.astype(np.int64)
    return int(ids[0]) if scalar else ids


def quantize_length(lengths: np.ndarray | int) -> np.ndarray | int:
    """Round-trip: exact length → quantized dl (decode(encode(x)))."""
    return id_to_fieldnorm(fieldnorm_to_id(lengths))
