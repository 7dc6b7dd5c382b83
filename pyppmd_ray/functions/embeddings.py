"""Embedding-column utilities for training-data pipelines.

Vectorized map_batches stages over the ``embeddings`` table shape
(vec_id, embedding list<float>, ...). Arithmetic is arranged to be
bit-reproducible in DuckDB (float64 ops in identical order; ``floor(x +
0.5)`` instead of round(), whose half-tie behavior differs between
numpy's banker's rounding and SQL round-half-away)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class EmbeddingQuantizer:
    """Symmetric int8-style quantization per vector: amax = max(|x|),
    q_i = floor(x_i * 127 / amax + 0.5) ∈ [-127, 127] (0-vector → zeros).
    Returns (vec_id, amax, qvec) — amax is the dequantization scale."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"]
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        amax = np.abs(m).max(axis=1)
        scale = np.where(amax > 0, 127.0 / np.where(amax > 0, amax, 1.0), 0.0)
        q = np.floor(m * scale[:, None] + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": ids,
                "amax": pa.array(amax, type=pa.float64()),
                "qvec": pa.array(q.tolist(), type=pa.list_(pa.int64())),
            }
        )


def normalize_batch(batch: pa.Table) -> pa.Table:
    """L2-normalize the embedding column (float64; 0-vectors unchanged)."""
    m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    out = m / norms[:, None]
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "embedding": pa.array(out.tolist(), type=pa.list_(pa.float64())),
        }
    )
