"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The image/audio libraries are not in this container, so the DECODE step is
stubbed (deterministic fake features behind ``decode_stub=True``, or
``NotImplementedError`` without it) — but the Ray-side plumbing is real
and tested: schema (binary payload + metadata columns), actor-pool
map_batches signature, small batch sizes for large binaries, output
layout.

At scale: binary columns stay in ``batch_format="pyarrow"`` end-to-end
(zero-copy Arrow buffers; pandas would copy to object dtype), and
``batch_size`` must be sized in BYTES not rows — pass small row counts for
MB-scale payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def to_payload_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adapter: wrap a text column as an opaque binary payload column with
    metadata — the multimodal input shape (payload, media_type, n_bytes)."""
    payloads = [(t or "").encode("utf-8") for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(["application/octet-stream"] * len(payloads)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature-extract stage for binary media columns.

    Real libraries absent in this container: with ``decode_stub=True`` it
    emits deterministic fake features (hash-derived width/height/duration);
    with ``decode_stub=False`` it raises NotImplementedError — the marked
    integration point for PIL/ffmpeg-style decoders.
    """

    def __init__(self, decode_stub: bool = True, feature_dim: int = 8):
        self.decode_stub = decode_stub
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes) -> dict:
        if not self.decode_stub:
            raise NotImplementedError(
                "real media decoding needs PIL/av — not available in this "
                "container; run with decode_stub=True"
            )
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        return {
            "width": 16 + int.from_bytes(h[8:10], "little") % 4080,
            "height": 16 + int.from_bytes(h[10:12], "little") % 4080,
            "feature": rng.standard_normal(self.feature_dim).round(6).tolist(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for p in batch["payload"]:
            d = self._decode(p.as_py() or b"")
            widths.append(d["width"])
            heights.append(d["height"])
            feats.append(d["feature"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "feature": pa.array(feats, type=pa.list_(pa.float64())),
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
