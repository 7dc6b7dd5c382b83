"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The payload container is REAL: :func:`to_payload_table` wraps each
document as a structurally-valid PNG (signature, IHDR, one ancillary text
chunk holding the UTF-8 bytes, IEND — correct lengths and CRC32s), and
:class:`MediaDecoder` is a real pure-Python binary parser that walks the
chunk stream and extracts IHDR metadata (width/height/bit depth/color
type). Only PIXEL decoding is stubbed (``NotImplementedError`` — the
image codecs aren't in this container); the Ray-side plumbing — binary
schema, actor-pool map_batches, byte-sized batches, output layout — is
real and oracle-checked (width/height are deterministic functions of
n_chars, so DuckDB can verify the generator→parser loop end-to-end).

At scale: binary columns stay in ``batch_format="pyarrow"`` end-to-end
(zero-copy Arrow buffers; pandas would copy to object dtype), and
``batch_size`` must be sized in BYTES not rows — pass small row counts for
MB-scale payloads.
"""

from __future__ import annotations

import struct
import zlib

import pyarrow as pa

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# container overhead: 8 sig + 25 IHDR + 12 chunk framing + 12 IEND
PNG_OVERHEAD = 8 + 25 + 12 + 12


def png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, payload: bytes) -> bytes:
    """Structurally-valid grayscale-8 PNG carrying ``payload`` in an
    ancillary ``teXt`` chunk (no pixel data — parsers that stop at IHDR,
    like MediaDecoder, read it like any real PNG header)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"teXt", payload)
        + png_chunk(b"IEND", b"")
    )


def parse_png_header(data: bytes) -> dict:
    """Parse signature + IHDR (+ verify the IHDR CRC). Raises ValueError
    on malformed input — a poison-row decode failure at pipeline level."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    if len(data) < 33:  # sig + IHDR chunk; short unpacks would raise
        raise ValueError("truncated PNG: no complete IHDR")  # struct.error otherwise
    (length,) = struct.unpack(">I", data[8:12])
    typ = data[12:16]
    if typ != b"IHDR" or length != 13:
        raise ValueError("first chunk is not a 13-byte IHDR")
    body = data[16:29]
    (crc,) = struct.unpack(">I", data[29:33])
    if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
        raise ValueError("IHDR CRC mismatch")
    width, height, bit_depth, color_type, _comp, _filt, _inter = struct.unpack(
        ">IIBBBBB", body
    )
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


def to_payload_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adapter: wrap a documents batch as PNG payloads with metadata —
    the multimodal input shape (payload, media_type, n_bytes). Width and
    height derive deterministically from n_chars (oracle-checkable)."""
    texts = [(t or "") for t in batch[text_col].to_pylist()]
    payloads = []
    for t in texts:
        n_chars = len(t)
        payloads.append(
            make_png(16 + n_chars % 1024, 16 + (7 * n_chars) % 1024, t.encode("utf-8"))
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(["image/png"] * len(payloads)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature-extract stage for binary media columns.

    Header metadata extraction is REAL (pure-Python PNG chunk walker);
    pixel decoding needs image codecs absent from this container and is
    the marked stub: construct with ``decode_pixels=True`` to hit the
    ``NotImplementedError`` integration point."""

    def __init__(self, decode_pixels: bool = False):
        self.decode_pixels = decode_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_pixels:
            raise NotImplementedError(
                "pixel decoding needs PIL/libpng — not available in this "
                "container; header metadata extraction runs without it"
            )
        ids, widths, heights, depths, ctypes, sizes = [], [], [], [], [], []
        for doc_id, p in zip(batch["doc_id"].to_pylist(), batch["payload"]):
            data = p.as_py() or b""
            hdr = parse_png_header(data)
            ids.append(doc_id)
            widths.append(hdr["width"])
            heights.append(hdr["height"])
            depths.append(hdr["bit_depth"])
            ctypes.append(hdr["color_type"])
            sizes.append(len(data))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "bit_depth": pa.array(depths, type=pa.int32()),
                "color_type": pa.array(ctypes, type=pa.int32()),
                "n_bytes": pa.array(sizes, type=pa.int64()),
            }
        )


def frame_sample_plan(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Frame-sampling stage shape for video payloads: emits (doc_id,
    frame_idx) rows for every n-th frame of a fake per-payload frame count
    (deterministic from payload size). flat_map-style via map_batches."""
    ids, frames = [], []
    for doc_id, n_bytes in zip(batch["doc_id"].to_pylist(), batch["n_bytes"].to_pylist()):
        n_frames = max(1, int(n_bytes) // 100)
        for f in range(0, n_frames, every_n):
            ids.append(doc_id)
            frames.append(f)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(frames, type=pa.int64()),
        }
    )
