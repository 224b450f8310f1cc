"""Delta + LEB128-varint posting compression, numpy-vectorized.

The reference's posting lists are 128-doc blocks of delta-encoded,
bit-packed doc ids with a VInt tail block ([tantivy contract]; usage at
``/root/reference/src/schema.rs:117-122``, ``src/inverted_index.rs:166-170``,
SURVEY.md §2.3).  We keep the same information layout — ascending doc ids
per term, delta-encoded, variable-byte packed, 128-doc blocks with
per-block skip metadata — but use LEB128 varints for both ids and tfs
(simpler than PFOR bit-packing, still ~1 byte/delta for dense lists).

Both directions are fully vectorized over numpy arrays: encode does ≤10
shift/mask passes regardless of input size; decode reconstructs value
boundaries with flatnonzero + reduceat.  No per-element Python.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK = np.uint64(0x7F)
_CONT = np.uint64(0x80)


def varint_encode(
    values: np.ndarray, return_lengths: bool = False
) -> bytes | tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array (little-endian 7-bit groups).

    With ``return_lengths=True`` also returns the per-value byte count —
    lets a caller encode one long concatenated stream and slice it at
    arbitrary value boundaries (the segment encoder slices per block).

    Construction is a dense (n × max_bytes) byte matrix + boolean mask
    compress, with a zero-copy fast path when every value fits one byte
    (the common case for doc-id deltas and tfs).  The former
    repeat/arange construction allocated four total-bytes-sized
    intermediates and was the single hottest piece of the segment encode
    kernel (profiled: ~1.3 s of a 4.2 s 16k-doc segment)."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    if arr.size == 0:
        return (b"", np.zeros(0, dtype=np.int64)) if return_lengths else b""
    nbytes = np.ones(arr.shape, dtype=np.int64)
    v = arr >> _SEVEN
    while v.any():
        nbytes += (v > 0).astype(np.int64)
        v >>= _SEVEN
    width = int(nbytes.max())
    if width == 1:
        # every value < 128: the stream IS the values
        out_b = arr.astype(np.uint8).tobytes()
        return (out_b, nbytes) if return_lengths else out_b
    # byte j of value i = (v >> 7j) & 0x7F, continuation bit set for
    # j < nbytes_i - 1; row-major boolean compress preserves the
    # little-endian byte order of each value
    shifts = (np.arange(width, dtype=np.uint64) * _SEVEN)[None, :]
    mat = ((arr[:, None] >> shifts) & _MASK).astype(np.uint8)
    col = np.arange(width, dtype=np.int64)[None, :]
    keep = col < nbytes[:, None]
    mat[col < (nbytes - 1)[:, None]] |= np.uint8(0x80)
    out = mat[keep]
    return (out.tobytes(), nbytes) if return_lengths else out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varint stream")
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # group index of each byte within its value
    val_idx = np.cumsum(np.concatenate(([False], is_last[:-1])))
    group = np.arange(b.size, dtype=np.int64) - starts[val_idx]
    contrib = (b.astype(np.uint64) & _MASK) << (group.astype(np.uint64) * _SEVEN)
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Ascending uint64 array → first value + successive gaps."""
    arr = np.asarray(sorted_values, dtype=np.uint64)
    if arr.size == 0:
        return arr
    out = np.empty_like(arr)
    out[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    arr = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(arr, dtype=np.uint64)


def encode_posting_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) → (delta+varint id bytes, varint tf bytes)."""
    return varint_encode(delta_encode(doc_ids)), varint_encode(tfs)


def decode_posting_block(id_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(varint_decode(id_bytes)), varint_decode(tf_bytes)
