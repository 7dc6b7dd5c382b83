"""High-level API parity tests, modeled on the reference's
`tests/test_highlevel_api.py` and the chunking tests in
`tests/test_ppmd7.py:23-53` (split points leave no trace in the decoded
output) and the sha256 corpus round-trip (`tests/test_ppmd7.py:56-92`)."""

from __future__ import annotations

import hashlib

import pytest

import pyppmd_ray as ppr

SENTENCE = "This file is located in a folder.This file is located in the root."


@pytest.mark.parametrize("codec", ["lz", "rans0", "fsst", "raw"])
def test_oneshot_roundtrip(codec):
    data = (SENTENCE * 50).encode()
    assert ppr.decompress(ppr.compress(data, codec=codec)) == data


def test_str_roundtrip():
    assert ppr.decompress_str(ppr.compress(SENTENCE)) == SENTENCE
    assert ppr.decompress_str(ppr.compress_str("héllo ✓ 🎈")) == "héllo ✓ 🎈"


def test_unknown_codec_raises():
    with pytest.raises(ppr.CodecError):
        ppr.compress(b"x", codec="nope")


def test_streaming_chunked_roundtrip():
    # translation of the reference's 16 KB block loop w/ checksum,
    # tests/test_ppmd7.py:56-92
    data = (SENTENCE * 2000).encode()
    comp = ppr.BlockCompressor(codec="lz", block_size=16 << 10)
    out = bytearray()
    for i in range(0, len(data), 1000):
        out += comp.compress(data[i : i + 1000])
    out += comp.flush()
    assert comp.eof
    dec = ppr.BlockDecompressor()
    recon = bytearray()
    for i in range(0, len(out), 777):  # arbitrary decode-side split points
        recon += dec.decompress(bytes(out[i : i + 777]))
    assert hashlib.sha256(recon).hexdigest() == hashlib.sha256(data).hexdigest()
    assert not dec.needs_input and dec.unused_data == b""


def test_stream_split_points_do_not_change_output():
    data = (SENTENCE * 300).encode()

    def run(chunks):
        c = ppr.BlockCompressor(codec="rans0", block_size=4096)
        out = b"".join(c.compress(ch) for ch in chunks) + c.flush()
        return out

    a = run([data])
    b = run([data[:33], data[33:1000], data[1000:]])
    assert a == b  # block framing is deterministic, split-invariant


def test_decompressor_eof_flips_exactly_at_stream_end():
    """Chunked-decode protocol mirroring /root/reference/tests/
    test_ppmd7.py:40-53: eof must be False while framed bytes remain,
    flip True exactly when the flush()-written terminator is consumed,
    and trailing bytes must land in unused_data."""
    data = (SENTENCE * 500).encode()
    c = ppr.BlockCompressor(codec="lz", block_size=8 << 10)
    stream = c.compress(data) + c.flush()
    trailer = b"EXTRA-BYTES-AFTER-STREAM"
    d = ppr.BlockDecompressor()
    recon = bytearray()
    step = 509  # prime split so frame boundaries never align with chunks
    full = stream + trailer
    for i in range(0, len(full), step):
        chunk = full[i : i + step]
        recon += d.decompress(chunk)
        consumed_through = i + len(chunk)
        assert d.eof == (consumed_through >= len(stream)), consumed_through
    assert bytes(recon) == data
    assert d.eof
    assert not d.needs_input
    assert d.unused_data == trailer
    # post-eof feeds return nothing and accumulate as unused_data
    assert d.decompress(b"more") == b""
    assert d.unused_data == trailer + b"more"


def test_empty_stream_eof():
    c = ppr.BlockCompressor()
    stream = c.flush()  # no data: terminator only
    d = ppr.BlockDecompressor()
    assert not d.eof
    assert d.decompress(stream) == b""
    assert d.eof and d.unused_data == b""


def test_flush_twice_raises():
    c = ppr.BlockCompressor()
    c.flush()
    with pytest.raises(ppr.CodecError):
        c.flush()


def test_block_size_clamped_like_reference():
    # the reference silently clamps mem_size (/root/reference/src/ext/
    # _ppmdmodule.c:157-174); block_size behaves the same
    from pyppmd_ray.codecs.bytesapi import (
        MAX_BLOCK_SIZE,
        MIN_BLOCK_SIZE,
        BlockCompressor,
        clamp_block_size,
    )

    assert BlockCompressor(block_size=1).block_size == MIN_BLOCK_SIZE
    assert BlockCompressor(block_size=1 << 40).block_size == MAX_BLOCK_SIZE
    assert clamp_block_size(8 << 20) == 8 << 20
    with pytest.raises(ppr.CodecError):
        clamp_block_size("big")


def test_unknown_codec_and_bad_hints_raise():
    from pyppmd_ray.codecs.select import validate_hints

    with pytest.raises(ppr.CodecError):
        ppr.compress(b"x", codec="ppmd9")
    with pytest.raises(ppr.CodecError):
        validate_hints({"content": {"layout": "zipped"}})
    with pytest.raises(ppr.CodecError):
        validate_hints({"content": {"data_codec": "bzip2"}})
    with pytest.raises(ppr.CodecError):
        validate_hints({"content": {"extra_knob": 1}})
    assert validate_hints({"content": {"layout": "strs", "data_codec": "lz"}})
    assert validate_hints(None) is None
