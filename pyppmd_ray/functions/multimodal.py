"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The payload container AND the pixel codec are REAL: :func:`to_payload_table`
wraps each document as a structurally-valid PNG (signature, IHDR, optional
zlib-compressed IDAT with per-row filters 0-4, one ancillary text chunk
holding the UTF-8 bytes, IEND — correct lengths and CRC32s), and
:class:`MediaDecoder` is a pure-Python decoder: a chunk walker that
CRC-verifies every chunk, plus (``decode_pixels=True``) a full grayscale-8
pixel decode — zlib inflate + scanline unfilter (None/Sub/Up/Average/
Paeth, the five PNG filter types, RFC 2083 §6). Pixels are a deterministic
function of the text length, so DuckDB can verify the whole
generate→compress→filter→inflate→unfilter loop end-to-end by value.

At scale: binary columns stay in ``batch_format="pyarrow"`` end-to-end
(zero-copy Arrow buffers; pandas would copy to object dtype), and
``batch_size`` must be sized in BYTES not rows — pass small row counts for
MB-scale payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
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


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    if pb_ <= pc_:
        return b
    return c


def filter_scanlines(px: np.ndarray) -> bytes:
    """Grayscale-8 rows → PNG-filtered raw scanline stream. Filter type
    cycles r % 5 so every filter (None/Sub/Up/Average/Paeth) is exercised
    on every image taller than 4 rows."""
    h, w = px.shape
    out = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        row = px[r].astype(np.int32)
        ftype = r % 5
        left = np.concatenate(([0], row[:-1]))
        upleft = np.concatenate(([0], prev[:-1]))
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - (left + prev) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)),
                dtype=np.int32,
                count=w,
            )
            filt = row - pred
        out.append(ftype)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def unfilter_scanlines(raw: bytes, width: int, height: int) -> np.ndarray:
    """Inverse of :func:`filter_scanlines` for any valid filter sequence
    (not just the r%5 cycle) — a real PNG unfilter for grayscale-8."""
    if len(raw) != height * (width + 1):
        raise ValueError(
            f"scanline stream is {len(raw)} bytes, expected {height * (width + 1)}"
        )
    px = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    pos = 0
    for r in range(height):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=width, offset=pos).astype(np.int32)
        pos += width
        if ftype == 0:
            cur = row
        elif ftype == 2:
            cur = (row + prev) % 256
        elif ftype in (1, 3, 4):
            cur = np.zeros(width, dtype=np.int32)
            for c in range(width):
                left = int(cur[c - 1]) if c else 0
                up = int(prev[c])
                ul = int(prev[c - 1]) if c else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[c] = (row[c] + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        px[r] = cur.astype(np.uint8)
        prev = cur
    return px


def make_png(width: int, height: int, payload: bytes, pixels: np.ndarray | None = None) -> bytes:
    """Structurally-valid grayscale-8 PNG carrying ``payload`` in an
    ancillary ``teXt`` chunk. ``pixels`` (a (height, width) uint8 array)
    adds a REAL zlib-compressed IDAT with per-row filters — decodable by
    any PNG reader; without it the container has no pixel data (parsers
    that stop at IHDR read it like any real PNG header)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    body = PNG_SIG + png_chunk(b"IHDR", ihdr)
    if pixels is not None:
        if pixels.shape != (height, width):
            raise ValueError(f"pixels shape {pixels.shape} != ({height}, {width})")
        body += png_chunk(b"IDAT", zlib.compress(filter_scanlines(pixels), 6))
    return body + png_chunk(b"teXt", payload) + png_chunk(b"IEND", b"")


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


def iter_png_chunks(data: bytes):
    """Walk the full chunk stream, CRC-verifying every chunk. Raises
    ValueError on malformed input (poison-row policy)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(data):
            raise ValueError(f"truncated {typ!r} chunk")
        body = data[pos + 8 : end]
        (crc,) = struct.unpack(">I", data[end : end + 4])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"{typ!r} CRC mismatch")
        yield typ, body
        pos = end + 4
        if typ == b"IEND":
            return
    raise ValueError("no IEND chunk")


def deterministic_pixels(width: int, height: int, n_chars: int) -> np.ndarray:
    """pixel[r, c] = (r*31 + c*7 + n_chars) % 256 — SQL-reproducible, so
    a DuckDB oracle can verify the decoded pixels by value."""
    r = np.arange(height, dtype=np.int64)[:, None]
    c = np.arange(width, dtype=np.int64)[None, :]
    return ((r * 31 + c * 7 + n_chars) % 256).astype(np.uint8)


# pixel-variant dimensions stay small (≤ 23×23) so the SQL oracle's
# per-pixel unnest stays cheap at test scale
def _pixel_dims(n_chars: int) -> tuple[int, int]:
    return 8 + n_chars % 16, 8 + (3 * n_chars) % 16


def to_payload_table(
    batch: pa.Table, text_col: str = "text", pixels: bool = False
) -> pa.Table:
    """Adapter: wrap a documents batch as PNG payloads with metadata —
    the multimodal input shape (payload, media_type, n_bytes). Width and
    height derive deterministically from n_chars (oracle-checkable).
    ``pixels=True`` embeds a real IDAT with deterministic pixel content
    (small dims; see :func:`deterministic_pixels`)."""
    texts = [(t or "") for t in batch[text_col].to_pylist()]
    payloads = []
    for t in texts:
        n_chars = len(t)
        if pixels:
            w, h = _pixel_dims(n_chars)
            payloads.append(
                make_png(w, h, t.encode("utf-8"), deterministic_pixels(w, h, n_chars))
            )
        else:
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

    Default: header metadata extraction (pure-Python CRC-checked PNG
    chunk walker). ``decode_pixels=True``: full grayscale-8 pixel decode
    — concatenated IDAT → zlib inflate → scanline unfilter (all five PNG
    filter types) — emitting per-image pixel summaries (n_px, px_sum)
    that a SQL oracle can verify by value."""

    def __init__(self, decode_pixels: bool = False):
        self.decode_pixels = decode_pixels

    def decode_image(self, data: bytes) -> np.ndarray:
        """One PNG payload → (height, width) uint8 pixel array. Raises
        ValueError on malformed containers or non-grayscale-8 images."""
        hdr = parse_png_header(data)
        if hdr["bit_depth"] != 8 or hdr["color_type"] != 0:
            raise ValueError(
                f"only grayscale-8 supported (got depth={hdr['bit_depth']}, "
                f"color_type={hdr['color_type']})"
            )
        idat = b"".join(body for typ, body in iter_png_chunks(data) if typ == b"IDAT")
        if not idat:
            raise ValueError("no IDAT chunk: container carries no pixel data")
        raw = zlib.decompress(idat)
        return unfilter_scanlines(raw, hdr["width"], hdr["height"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_pixels:
            ids, widths, heights, n_px, px_sum = [], [], [], [], []
            for doc_id, p in zip(batch["doc_id"].to_pylist(), batch["payload"]):
                data = p.as_py() or b""
                px = self.decode_image(data)
                ids.append(doc_id)
                heights.append(px.shape[0])
                widths.append(px.shape[1])
                n_px.append(px.size)
                px_sum.append(int(px.astype(np.int64).sum()))
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "width": pa.array(widths, type=pa.int32()),
                    "height": pa.array(heights, type=pa.int32()),
                    "n_px": pa.array(n_px, type=pa.int64()),
                    "px_sum": pa.array(px_sum, type=pa.int64()),
                }
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


class ImageResizer:
    """Actor-pool resize stage: PNG payload → full pixel decode (inflate
    + unfilter) → nearest-neighbor resample to (target_w, target_h) →
    per-image summary (out dims + resized px_sum, SQL-verifiable by
    value since resized[r,c] = orig[r·h//th, c·w//tw]). The
    thumbnail / vision-preprocessing shape: decode state per actor,
    small batches for large payloads, map-side only."""

    def __init__(self, target_w: int = 8, target_h: int = 8):
        if target_w < 1 or target_h < 1:
            raise ValueError("target dims must be >= 1")
        self.tw, self.th = target_w, target_h
        self._dec = MediaDecoder(decode_pixels=True)

    def resize(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape
        ri = (np.arange(self.th, dtype=np.int64) * h) // self.th
        ci = (np.arange(self.tw, dtype=np.int64) * w) // self.tw
        return px[ri][:, ci]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, sums = [], [], [], []
        for doc_id, p in zip(batch["doc_id"].to_pylist(), batch["payload"]):
            px = self.resize(self._dec.decode_image(p.as_py() or b""))
            ids.append(doc_id)
            heights.append(px.shape[0])
            widths.append(px.shape[1])
            sums.append(int(px.astype(np.int64).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "out_w": pa.array(widths, type=pa.int64()),
                "out_h": pa.array(heights, type=pa.int64()),
                "px_sum": pa.array(sums, type=pa.int64()),
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


# ------------------------------------------------------------- audio (WAV)

WAV_HEADER_BYTES = 44  # RIFF(12) + fmt(24) + data header(8)


def make_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 mono WAV (RIFF little-endian, spec-complete 44-byte header) —
    a REAL audio container any player/parser reads; pure struct+numpy."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def parse_wav(data: bytes) -> tuple[dict, np.ndarray]:
    """Parse + validate a PCM16 mono WAV; returns (meta, samples).
    Raises ValueError on malformed input (poison-row policy)."""
    if len(data) < WAV_HEADER_BYTES or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    if data[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    fmt_len, audio_fmt, channels, rate, _brate, _align, bits = struct.unpack(
        "<IHHIIHH", data[16:36]
    )
    if fmt_len != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (fmt_len={fmt_len}, fmt={audio_fmt}, "
            f"ch={channels}, bits={bits}); PCM16 mono only"
        )
    if data[36:40] != b"data":
        raise ValueError("missing data chunk")
    (dlen,) = struct.unpack("<I", data[40:44])
    if 44 + dlen > len(data):
        raise ValueError("truncated data chunk")
    samples = np.frombuffer(data, dtype="<i2", count=dlen // 2, offset=44)
    return {"sample_rate": rate, "n_samples": int(samples.size)}, samples


def deterministic_samples(n_chars: int) -> np.ndarray:
    """sample[i] = ((i*2654435761 + n_chars) mod 65536) − 32768 —
    SQL-reproducible PCM content; length 64 + n_chars % 256."""
    n = 64 + n_chars % 256
    i = np.arange(n, dtype=np.int64)
    return ((i * 2654435761 + n_chars) % 65536 - 32768).astype(np.int16)


def to_audio_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """documents batch → WAV payloads (doc_id, payload, media_type,
    n_bytes); PCM content derives deterministically from n_chars."""
    texts = [(t or "") for t in batch[text_col].to_pylist()]
    payloads = [make_wav(deterministic_samples(len(t))) for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(["audio/wav"] * len(payloads)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class AudioDecoder:
    """Actor-pool feature-extract stage for WAV payloads: validates the
    container, decodes PCM16, emits per-clip features (n_samples,
    sample_rate, peak = max |s|, sum_abs = Σ|s|)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_s, rates, peaks, sums = [], [], [], [], []
        for doc_id, p in zip(batch["doc_id"].to_pylist(), batch["payload"]):
            meta, samples = parse_wav(p.as_py() or b"")
            a = np.abs(samples.astype(np.int64))
            ids.append(doc_id)
            n_s.append(meta["n_samples"])
            rates.append(meta["sample_rate"])
            peaks.append(int(a.max()) if a.size else 0)
            sums.append(int(a.sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_samples": pa.array(n_s, type=pa.int64()),
                "sample_rate": pa.array(rates, type=pa.int64()),
                "peak": pa.array(peaks, type=pa.int64()),
                "sum_abs": pa.array(sums, type=pa.int64()),
            }
        )


# ------------------------------------------------------------ video (Y4M)

Y4M_RATE = "25:1"


def make_y4m(frames: np.ndarray) -> bytes:
    """YUV4MPEG2 clip, mono (YUV with Cb=Cr=128 omitted via C420? no —
    plain 'Cmono' grayscale planes): a REAL, player-readable container.
    ``frames``: (n_frames, height, width) uint8 luma planes."""
    nf, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{Y4M_RATE} Ip A1:1 Cmono\n".encode()
    parts = [head]
    for f in range(nf):
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(frames[f]).tobytes())
    return b"".join(parts)


def parse_y4m(data: bytes) -> tuple[dict, np.ndarray]:
    """Parse + validate a mono Y4M clip → (meta, (n, h, w) uint8 frames).
    Raises ValueError on malformed input (poison-row policy)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    head = data[:nl].decode("ascii", "replace").split(" ")
    w = h = None
    for tokn in head[1:]:
        if tokn.startswith("W"):
            w = int(tokn[1:])
        elif tokn.startswith("H"):
            h = int(tokn[1:])
        elif tokn.startswith("C") and tokn != "Cmono":
            raise ValueError(f"unsupported colorspace {tokn}; mono only")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    fsize = w * h
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME header")
        pos = fnl + 1
        if pos + fsize > len(data):
            raise ValueError("truncated frame plane")
        frames.append(np.frombuffer(data, dtype=np.uint8, count=fsize, offset=pos).reshape(h, w))
        pos += fsize
    return {"width": w, "height": h, "n_frames": len(frames)}, (
        np.stack(frames) if frames else np.zeros((0, h, w), dtype=np.uint8)
    )


def deterministic_frames(n_chars: int) -> np.ndarray:
    """(n_frames, 8, 8) uint8 with frame[f][r][c] = (f*131 + r*17 + c*5 +
    n_chars) % 256; n_frames = 2 + n_chars % 14 — SQL-reproducible."""
    nf = 2 + n_chars % 14
    f = np.arange(nf, dtype=np.int64)[:, None, None]
    r = np.arange(8, dtype=np.int64)[None, :, None]
    c = np.arange(8, dtype=np.int64)[None, None, :]
    return ((f * 131 + r * 17 + c * 5 + n_chars) % 256).astype(np.uint8)


def to_video_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """documents batch → Y4M payloads (doc_id, payload, media_type,
    n_bytes); frames derive deterministically from n_chars."""
    texts = [(t or "") for t in batch[text_col].to_pylist()]
    payloads = [make_y4m(deterministic_frames(len(t))) for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(["video/x-yuv4mpeg"] * len(payloads)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class VideoFrameSampler:
    """Actor-pool frame-sampling stage: validates + decodes the Y4M clip,
    keeps every ``every_n``-th frame, emits one row per SAMPLED frame
    with its luma sum (flat_map shape — the per-frame fan-out a training
    pipeline feeds to an image model)."""

    def __init__(self, every_n: int = 2):
        self.every_n = int(every_n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, sums = [], [], []
        for doc_id, p in zip(batch["doc_id"].to_pylist(), batch["payload"]):
            meta, frames = parse_y4m(p.as_py() or b"")
            for f in range(0, meta["n_frames"], self.every_n):
                ids.append(doc_id)
                fidx.append(f)
                sums.append(int(frames[f].astype(np.int64).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int64()),
                "luma_sum": pa.array(sums, type=pa.int64()),
            }
        )
