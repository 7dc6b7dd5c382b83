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
    if concurrency:
        cand = ds.map_batches(
            BruteForceScorer,
            fn_constructor_kwargs={"query_ref": qref, "k": k},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    else:
        # instance = task mode: no actor-pool spin-up; the broadcast state
        # is fetched per task via the same ray.put ref (tiny for queries)
        cand = ds.map_batches(BruteForceScorer(query_ref=qref, k=k), batch_format="pyarrow")
    tbl = pa.concat_tables(cand.iter_batches(batch_size=None, batch_format="pyarrow"))
    out_q, out_rank, out_id = [], [], []
    nq = int(np.asarray(queries).shape[0])
    qcol = np.asarray(tbl["q"].to_pylist(), dtype=np.int64)
    icol = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    scol = np.asarray(tbl["score"].to_pylist(), dtype=np.float64)
    for qi in range(nq):
        mask = qcol == qi
        top_ids, _ = _topk_merge([(icol[mask], scol[mask])], k)
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


class IvfScorer:
    """Actor: holds normalized centroids + queries + per-query probe sets
    (one ray.get in __init__). Each batch assigns its rows to their
    nearest centroid locally and scores only rows whose list is probed."""

    def __init__(self, ref, k: int):
        cents, qnorm, probe_mask = ray.get(ref)
        self.cents = cents          # (C, dim), L2-normalized
        self.qnorm = qnorm          # (nq, dim), L2-normalized
        self.probe_mask = probe_mask  # (nq, C) bool
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        # nearest centroid by cosine; argmax ties → lowest centroid index
        assign = np.argmax(mn @ self.cents.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(self.qnorm.shape[0]):
            mask = self.probe_mask[qi][assign]
            if not mask.any():
                continue
            s = mn[mask] @ self.qnorm[qi]
            cids = ids[mask]
            top = np.lexsort((cids, -s))[: self.k]
            out_q.extend([qi] * len(top))
            out_id.extend(cids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "q": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def ivf_topk(
    ds: rd.Dataset, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
    nprobe: int = 4, concurrency=None,
) -> pa.Table:
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    centroid lists; queries probe only the ``nprobe`` nearest lists and
    exact-score inside — the inverted-file shape (centroid id is the
    partition key at scale). Centroids here are the ``n_centroids``
    lowest-vec_id vectors, L2-normalized (deterministic seeding instead of
    k-means, so the partition assignment is SQL-reproducible; classic IVF
    trains centroids offline — the Ray dataflow is identical either way).
    Recall < 1 by design. Returns (q, rank, vec_id)."""
    q = np.asarray(queries, dtype=np.float64)
    seed_tbl = pa.concat_tables(
        ds.sort("vec_id").limit(n_centroids).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    cents = np.array(seed_tbl["embedding"].to_pylist(), dtype=np.float64)
    cn = np.linalg.norm(cents, axis=1)
    cn[cn == 0] = 1.0
    cents = cents / cn[:, None]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qnorm = q / qn[:, None]
    # probe sets: top-nprobe centroids per query (ties → lowest index)
    qc = qnorm @ cents.T  # (nq, C)
    order = np.lexsort((np.broadcast_to(np.arange(cents.shape[0]), qc.shape), -qc), axis=1)
    probe_mask = np.zeros(qc.shape, dtype=bool)
    for qi in range(q.shape[0]):
        probe_mask[qi, order[qi, :nprobe]] = True
    ref = ray.put((cents, qnorm, probe_mask))
    if concurrency:
        cand = ds.map_batches(
            IvfScorer,
            fn_constructor_kwargs={"ref": ref, "k": k},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    else:
        # instance = task mode: no actor-pool spin-up; the broadcast state
        # is fetched per task via the same ray.put ref (tiny for queries)
        cand = ds.map_batches(IvfScorer(ref=ref, k=k), batch_format="pyarrow")
    tbl = pa.concat_tables(cand.iter_batches(batch_size=None, batch_format="pyarrow"))
    out_q, out_rank, out_id = [], [], []
    qcol = np.asarray(tbl["q"].to_pylist(), dtype=np.int64)
    icol = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    scol = np.asarray(tbl["score"].to_pylist(), dtype=np.float64)
    for qi in range(q.shape[0]):
        mask = qcol == qi
        top_ids, _ = _topk_merge([(icol[mask], scol[mask])], k)
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


class LshScorer:
    """Actor: holds planes + normalized queries + per-query probe-bucket
    masks (one ray.get in __init__). Each batch computes its rows' buckets
    locally, scores ONLY rows falling in a query's probe buckets, and
    emits that batch's top-k candidates per query — the corpus never
    leaves the workers."""

    def __init__(self, ref, k: int):
        planes, qnorm, probe_mask = ray.get(ref)
        self.planes = planes            # (n_bits, dim)
        self.qnorm = qnorm              # (nq, dim), L2-normalized
        self.probe_mask = probe_mask    # (nq, 2**n_bits) bool
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        bits = (m @ self.planes.T) > 0
        buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1).astype(np.int64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        out_q, out_id, out_s = [], [], []
        for qi in range(self.qnorm.shape[0]):
            mask = self.probe_mask[qi][buckets]
            if not mask.any():
                continue
            s = mn[mask] @ self.qnorm[qi]
            cids = ids[mask]
            top = np.lexsort((cids, -s))[: self.k]
            out_q.extend([qi] * len(top))
            out_id.extend(cids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "q": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def lsh_topk(
    ds: rd.Dataset, queries: np.ndarray, k: int = 10, n_bits: int = 8,
    probe_hamming: int = 1, seed: int = 42, concurrency=None,
) -> pa.Table:
    """LSH-bucketed ANN: each worker buckets its own rows, probes only
    buckets within ``probe_hamming`` of each query's bucket and
    exact-scores inside — one map_batches pass, query side broadcast once
    via ray.put, driver merges k×num_blocks candidates (tiny). Returns
    (q, rank, vec_id) like brute_force_topk; recall < 1 by design (a query
    with zero in-probe candidates yields < k rows, same as the SQL
    oracle). Bucket ids are the partition keys at scale."""
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    bucketer = LshBucketer(dim, n_bits=n_bits, seed=seed)
    qb = bucketer.bucket_of(q)
    all_buckets = np.arange(1 << n_bits, dtype=np.uint64)
    # popcount via uint8 bit tricks: hamming(bucket, qb) <= probe_hamming
    xor = all_buckets[None, :] ^ qb[:, None].astype(np.uint64)
    ham = np.zeros(xor.shape, dtype=np.int64)
    x = xor.copy()
    while x.any():
        ham += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    probe_mask = ham <= probe_hamming
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qnorm = q / qn[:, None]
    ref = ray.put((bucketer.planes, qnorm, probe_mask))
    if concurrency:
        cand = ds.map_batches(
            LshScorer,
            fn_constructor_kwargs={"ref": ref, "k": k},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    else:
        # instance = task mode: no actor-pool spin-up; the broadcast state
        # is fetched per task via the same ray.put ref (tiny for queries)
        cand = ds.map_batches(LshScorer(ref=ref, k=k), batch_format="pyarrow")
    tbl = pa.concat_tables(cand.iter_batches(batch_size=None, batch_format="pyarrow"))
    out_q, out_rank, out_id = [], [], []
    qcol = np.asarray(tbl["q"].to_pylist(), dtype=np.int64)
    icol = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    scol = np.asarray(tbl["score"].to_pylist(), dtype=np.float64)
    for qi in range(q.shape[0]):
        mask = qcol == qi
        top_ids, _ = _topk_merge([(icol[mask], scol[mask])], k)
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
