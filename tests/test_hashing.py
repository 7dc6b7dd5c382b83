"""Bit-parity of the zero-boxing sha256 helpers with the legacy
``hashlib.sha256(str(v).encode())`` loops they replaced — the digests
feed SQL-reproducible filters (sampling, distinct, dedup, fingerprints),
so any drift would silently break every hash-keyed oracle."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from pyppmd_ray.functions.hashing import sha256_hex, sha256_prefix_u64


def _legacy_u64(vals):
    return np.array(
        [
            int.from_bytes(hashlib.sha256(str(v).encode()).digest()[:8], "big")
            for v in vals
        ],
        dtype=np.uint64,
    )


@pytest.mark.parametrize(
    "arr",
    [
        pa.array(["hello", "", "a" * 300, None, "über🦄"]),
        pa.chunked_array([pa.array(["x", "y"]), pa.array(["z"])]),
        pa.array(["abc", "de", None], type=pa.large_string()),
        pa.array([0, -5, 2**62, None, 123], type=pa.int64()),
        pa.array([0, 2**64 - 1], type=pa.uint64()),
        pa.array([7, 8], type=pa.int16()),
        pa.array([1.5, 1e-07, float("nan")]),  # float → legacy fallback
        pa.array([], type=pa.string()),
    ],
)
def test_prefix_u64_matches_legacy(arr):
    vals = arr.to_pylist()
    got = sha256_prefix_u64(arr)
    assert got.dtype == np.uint64
    assert (got == _legacy_u64(vals)).all()


def test_prefix_u64_sliced_array():
    sl = pa.array(["q", "w", "e", "r"]).slice(1, 2)
    assert (sha256_prefix_u64(sl) == _legacy_u64(["w", "e"])).all()


def test_sha256_hex_matches_legacy_null_as_empty():
    vals = ["x", None, "", "yy", "ü" * 100]
    got = sha256_hex(pa.array(vals)).to_pylist()
    assert got == [hashlib.sha256((t or "").encode()).hexdigest() for t in vals]


def test_sha256_hex_rejects_non_string():
    with pytest.raises(TypeError):
        sha256_hex(pa.array([1, 2, 3]))
