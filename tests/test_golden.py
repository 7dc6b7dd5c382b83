"""Golden-vector format-stability tests (FIXTURES.md F3).

Translation of the reference's byte-exact golden tests
(`/root/reference/tests/test_ppmd7.py:10-37`: fixed sentence → pinned
compressed bytes). Pinned blobs guard the wire format: resume depends on
re-encoded blocks being byte-identical across engine versions, so any
intentional format change must bump the blob VERSION and re-pin here.
"""

from __future__ import annotations

import numpy as np

from pyppmd_ray.codecs import decode_blob, encode_fsst, encode_lz
from pyppmd_ray.codecs.numeric import encode_constant, encode_delta, encode_for, encode_rle
from pyppmd_ray.codecs.rans import encode_rans0

# the reference's golden sentence (tests/test_ppmd7.py:10)
SENTENCE = b"This file is located in a folder.This file is located in the root."

# re-pinned at blob VERSION 2 (u16-renorm rANS round; int-codec payloads
# unchanged apart from the version byte)
GOLDEN = {
    "for": b'PR\x02\x04\x1b{"n":5,"ref":1,"s":1,"w":3}\xc2@',
    "delta": b'PR\x02\x05\'{"first":0,"m":"c","n":10,"s":1,"v":10}',
    "rle": b'PR\x02\x06\r{"n":7,"s":1}"PR\x02\x04\x1c{"n":2,"ref":-2,"s":1,"w":4}\tPR\x02\x04\x1b{"n":2,"ref":3,"s":1,"w":1}\x01',
    "const": b'PR\x02\x02\x14{"n":9,"s":1,"v":42}',
}


def test_int_codec_golden_bytes():
    assert encode_for(np.array([3, 1, 4, 1, 5], dtype=np.int64)) == GOLDEN["for"]
    assert encode_delta(np.arange(0, 50, 5, dtype=np.int64)) == GOLDEN["delta"]
    assert (
        encode_rle(np.repeat(np.array([7, -2], dtype=np.int64), [4, 3])) == GOLDEN["rle"]
    )
    assert encode_constant(9, 42, True) == GOLDEN["const"]


def test_byte_codec_golden_shape():
    """Entropy/lz blobs: pin the prefix (magic, version, codec id, meta) and
    full determinism (same input → same bytes), not the whole payload —
    tuning freq quantization may move payload bytes behind a VERSION bump."""
    for enc in (encode_rans0, encode_fsst, encode_lz):
        a = enc(SENTENCE)
        b = enc(SENTENCE)
        assert a == b, "non-deterministic encode"
        assert a[:2] == b"PR" and a[2] == 2
        assert decode_blob(a) == SENTENCE


def test_decode_golden_blobs():
    np.testing.assert_array_equal(
        decode_blob(GOLDEN["for"]), np.array([3, 1, 4, 1, 5], dtype=np.int64)
    )
    np.testing.assert_array_equal(
        decode_blob(GOLDEN["delta"]), np.arange(0, 50, 5, dtype=np.int64)
    )
    np.testing.assert_array_equal(
        decode_blob(GOLDEN["rle"]), np.repeat(np.array([7, -2], dtype=np.int64), [4, 3])
    )
    np.testing.assert_array_equal(
        decode_blob(GOLDEN["const"]), np.full(9, 42, dtype=np.int64)
    )


def test_v1_blob_rejected_loudly():
    """v1 archives (byte-renorm rANS) must raise, not decode garbage."""
    import pytest

    from pyppmd_ray.codecs.base import CodecError

    v1_blob = b'PR\x01\x02\x14{"n":9,"s":1,"v":42}'
    with pytest.raises(CodecError, match="version"):
        decode_blob(v1_blob)
