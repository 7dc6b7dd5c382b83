"""Zero-boxing sha256 column hashing — the one shared kernel behind
every SQL-reproducible hash in the engine (sampling filters, distinct
sketches, exact dedup, document fingerprints).

The digests are bit-identical to the previous per-row
``hashlib.sha256(str(v).encode())`` loops (so every DuckDB oracle keeps
matching), but the hot path never boxes a value through a Python string:
it walks the Arrow string column's own offsets+data buffers and feeds
``memoryview`` slices straight into hashlib. At 100 TB a *sampling
filter* must not cost more than the scan it guards — dropping the
``to_pylist()`` round-trip (Python str alloc + UTF-8 re-encode per row)
is the difference (reference analogue: the reference keeps its hot
loops allocation-free inside the C extension,
`/root/reference/src/lib/ppmd/Ppmd7.c`).

Fast path: ``string``/``large_string`` columns directly; integer
columns via a vectorized Arrow cast-to-string (identical text to
``str(int)``). Other types (floats, bools, timestamps — where Arrow's
cast text differs from Python ``str()``) fall back to the exact legacy
loop so digests never change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SHA = hashlib.sha256


def _as_utf8_array(col) -> pa.Array | None:
    """Resolve a column to a single flat string Array whose UTF-8 bytes
    equal ``str(v)`` row-wise, or None when no safe vectorized cast
    exists. Nulls are rendered as ``"None"`` — exactly what the legacy
    ``str(v)`` loop produced for ``None``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        arr = col
    elif pa.types.is_integer(t):
        # Arrow renders integers identically to Python str()
        arr = pc.cast(col, pa.string())
    else:
        return None
    if arr.null_count:
        arr = pc.fill_null(arr, "None")
    if isinstance(arr, pa.ChunkedArray):  # fill_null may re-chunk
        arr = arr.combine_chunks()
    return arr


def _buffers(arr: pa.Array):
    """(offsets list, data bytes) for a flat string array. Python-list
    offsets + a bytes data buffer slice fastest in the hot loop (numpy
    scalar indexing into a memoryview costs ~2× the sha call itself)."""
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].tolist()
    data = bytes(memoryview(arr.buffers()[2]))
    return offs, data


def sha256_prefix_u64(col) -> np.ndarray:
    """First 8 bytes of sha256(str(v)) per row, big-endian → uint64
    ndarray. Matches the oracle's
    ``('0x' || substr(sha256(CAST(v AS VARCHAR)), 1, 16))::UBIGINT``."""
    arr = _as_utf8_array(col)
    if arr is None:  # exact legacy loop for unvectorizable dtypes
        vals = (col.to_pylist() if isinstance(col, (pa.Array, pa.ChunkedArray))
                else list(col))
        return np.array(
            [int.from_bytes(_SHA(str(v).encode()).digest()[:8], "big")
             for v in vals],
            dtype=np.uint64,
        )
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offs, data = _buffers(arr)
    sha = _SHA
    packed = b"".join(
        [sha(data[s:e]).digest()[:8] for s, e in zip(offs, offs[1:])]
    )
    return np.frombuffer(packed, dtype=">u8").astype(np.uint64)


def sha256_hex(col, *, null_as_empty: bool = True) -> pa.Array:
    """Full sha256 hex digest per row → string Array. With
    ``null_as_empty`` (the text-column convention) nulls hash as ``""``
    — matching the legacy ``(t or "")`` loops and DuckDB's
    ``sha256(coalesce(text, ''))``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        raise TypeError(f"sha256_hex expects a string column, got {t}")
    if col.null_count:
        col = pc.fill_null(col, "" if null_as_empty else "None")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string())
    offs, data = _buffers(col)
    sha = _SHA
    return pa.array(
        [sha(data[s:e]).hexdigest() for s, e in zip(offs, offs[1:])],
        type=pa.string(),
    )
