"""Approximate nearest-neighbor search over an embedding column.

- :func:`brute_force_topk` — the exactness baseline: per-batch float64
  numpy matmul against a broadcast (ray.put) query matrix. Scale shape:
  the query side is small and broadcast ONCE; each batch computes local
  top-k; the driver merges k×num_blocks candidates (tiny).
- :class:`LshIndexActor` / :func:`lsh_topk` — the scale path: random
  hyperplane LSH buckets (sign bits) restrict candidates to matching /
  near buckets before exact re-scoring.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _topk_merge(parts: list[tuple[np.ndarray, np.ndarray]], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-block (ids, scores) candidate lists into global top-k
    (score desc, id asc tie-break)."""
    ids = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, dtype=np.int64)
    sc = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0)
    order = np.lexsort((ids, -sc))[:k]
    return ids[order], sc[order]


class BruteForceScorer:
    """Actor: holds the normalized query matrix (fetched from the object
    store once per worker in __init__)."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        q = np.asarray(q, dtype=np.float64)
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0] = 1.0
        self.q = q / qn[:, None]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m / norms[:, None]) @ self.q.T  # (n, nq)
        out_q, out_id, out_s = [], [], []
        k = min(self.k, ids.size)
        for qi in range(self.q.shape[0]):
            s = cos[:, qi]
            part = np.argpartition(-s, k - 1)[:k] if k < ids.size else np.arange(ids.size)
            for j in part:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_s.append(float(s[j]))
        return pa.table(
            {
                "q": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_topk(
    ds: rd.Dataset, queries: np.ndarray, k: int = 10, concurrency=None
) -> pa.Table:
    """Exact cosine top-k per query row → (q, rank, vec_id).

    Scores stay float64 end-to-end so ordering matches a double-precision
    SQL oracle; the returned table carries ints only (rank, ids)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cand = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency or 2,
    )
    tbl = pa.concat_tables(cand.iter_batches(batch_size=None, batch_format="pyarrow"))
    out_q, out_rank, out_id = [], [], []
    nq = int(np.asarray(queries).shape[0])
    for qi in range(nq):
        mask = np.asarray(tbl["q"].to_pylist()) == qi
        ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)[mask]
        sc = np.asarray(tbl["score"].to_pylist())[mask]
        top_ids, _ = _topk_merge([(ids, sc)], k)
        for r, vid in enumerate(top_ids):
            out_q.append(qi)
            out_rank.append(r)
            out_id.append(int(vid))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.int32()),
            "rank": pa.array(out_rank, type=pa.int32()),
            "vec_id": pa.array(out_id, type=pa.int64()),
        }
    )


class LshBucketer:
    """Random-hyperplane LSH: bucket = sign-bit prefix of projections.
    Deterministic planes from a fixed seed; same planes on query side."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(n_bits, dim))

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(m).astype(np.int64), type=pa.int64())
        )


def lsh_topk(
    ds: rd.Dataset, queries: np.ndarray, k: int = 10, n_bits: int = 8,
    probe_hamming: int = 1, concurrency=None,
) -> pa.Table:
    """LSH-bucketed ANN: bucket the corpus (map_batches), probe only
    buckets within ``probe_hamming`` of each query's bucket, exact-score
    inside. Returns (q, rank, vec_id) like brute_force_topk — recall < 1
    by design; the bucketing keys are the partition keys at scale."""
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    bucketer = LshBucketer(dim, n_bits=n_bits)
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits},
        batch_format="pyarrow",
        concurrency=concurrency or 2,
    )
    tbl = pa.concat_tables(bucketed.iter_batches(batch_size=None, batch_format="pyarrow"))
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    buckets = np.asarray(tbl["bucket"].to_pylist(), dtype=np.int64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qnorm = q / qn[:, None]
    qb = bucketer.bucket_of(q)
    out_q, out_rank, out_id = [], [], []
    all_buckets = np.arange(1 << n_bits, dtype=np.int64)
    for qi in range(q.shape[0]):
        ham = np.array([bin(int(b) ^ int(qb[qi])).count("1") for b in all_buckets])
        probe = set(all_buckets[ham <= probe_hamming].tolist())
        mask = np.isin(buckets, list(probe))
        if not mask.any():
            mask = np.ones_like(mask)
        s = mn[mask] @ qnorm[qi]
        cids = ids[mask]
        order = np.lexsort((cids, -s))[:k]
        for r, j in enumerate(order):
            out_q.append(qi)
            out_rank.append(r)
            out_id.append(int(cids[j]))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.int32()),
            "rank": pa.array(out_rank, type=pa.int32()),
            "vec_id": pa.array(out_id, type=pa.int64()),
        }
    )
