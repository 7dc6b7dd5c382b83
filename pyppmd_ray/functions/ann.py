"""Approximate nearest-neighbor search over an embedding column.

- :func:`brute_force_topk` — the exactness baseline: per-batch float64
  numpy matmul against a broadcast (ray.put) query matrix. Scale shape:
  the query side is small and broadcast ONCE; each batch computes local
  top-k; the driver merges k×num_blocks candidates (tiny).
- :class:`LshBucketer` / :func:`lsh_topk` — the scale path: random
  hyperplane LSH buckets (sign bits) restrict candidates to matching /
  near buckets before exact re-scoring.
- :func:`ivf_topk` — inverted-file shape: coarse quantizer partitions the
  corpus into centroid lists, queries probe the ``nprobe`` nearest lists.
  Optional ``train=True`` runs a distributed k-means refinement
  (:func:`train_centroids`) — per-batch partial sums, driver reduces only
  a (C, dim) matrix per round.

Broadcast discipline (all scorer stages): the class instance pickles ONLY
the ObjectRef; the state is fetched lazily on first batch in the worker
(cached per process). This makes task mode (`map_batches(instance)`) a
true object-store broadcast — constructing the instance on the driver does
NOT bake the state into the serialized UDF.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .embeddings import embedding_matrix, int64_column


from .broadcast import LazyBroadcast as _LazyBroadcast  # shared discipline


def _topk_merge(parts: list[tuple[np.ndarray, np.ndarray]], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-block (ids, scores) candidate lists into global top-k
    (score desc, id asc tie-break)."""
    ids = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, dtype=np.int64)
    sc = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0)
    order = np.lexsort((ids, -sc))[:k]
    return ids[order], sc[order]


def _rank_table(cand: rd.Dataset, nq: int, k: int) -> pa.Table:
    """Driver-side merge of per-batch candidates → (q, rank, vec_id).
    The candidate set is k×num_blocks rows — tiny by construction."""
    from pyppmd_ray.functions.collect import collect_table

    tbl = collect_table(
        cand,
        empty=pa.table(
            {
                "q": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        ),
    )
    out_q, out_rank, out_id = [], [], []
    qcol = int64_column(tbl["q"])
    icol = int64_column(tbl["vec_id"])
    scol = tbl["score"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
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


def _candidate_table(ids: np.ndarray, cos: np.ndarray, k: int) -> pa.Table:
    """(n, nq) score matrix → per-query local top-k candidate rows,
    vectorized (single argpartition, no per-query Python loop)."""
    n, nq = cos.shape
    kk = min(k, n)
    if kk <= 0:
        return pa.table(
            {
                "q": pa.array([], type=pa.int32()),
                "vec_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    if kk < n:
        part = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, nq)
    else:
        part = np.broadcast_to(np.arange(n)[:, None], (n, nq))
    qidx = np.broadcast_to(np.arange(nq)[None, :], part.shape)
    return pa.table(
        {
            "q": pa.array(qidx.ravel(order="F").astype(np.int32), type=pa.int32()),
            "vec_id": pa.array(ids[part.ravel(order="F")], type=pa.int64()),
            "score": pa.array(cos[part.ravel(order="F"), qidx.ravel(order="F")], type=pa.float64()),
        }
    )


class BruteForceScorer(_LazyBroadcast):
    """Scorer over a broadcast normalized query matrix. State = raw query
    matrix ref; normalization happens at resolve time in the worker."""

    def __init__(self, query_ref, k: int):
        super().__init__(query_ref)
        self.k = k

    def _qnorm(self) -> np.ndarray:
        q = np.asarray(self.state, dtype=np.float64)
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0] = 1.0
        return q / qn[:, None]

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = self._qnorm()
        ids = int64_column(batch["vec_id"])
        m = embedding_matrix(batch["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m / norms[:, None]) @ q.T  # (n, nq)
        return _candidate_table(ids, cos, self.k)


def brute_force_topk(
    ds: rd.Dataset, queries: np.ndarray, k: int = 10, concurrency=None
) -> pa.Table:
    """Exact cosine top-k per query row → (q, rank, vec_id).

    Scores stay float64 end-to-end so ordering matches a double-precision
    SQL oracle; the returned table carries ints only (rank, ids)."""
    q = np.asarray(queries, dtype=np.float64)
    qref = ray.put(q)
    scorer = BruteForceScorer(query_ref=qref, k=k)
    if concurrency:
        cand = ds.map_batches(
            BruteForceScorer,
            fn_constructor_kwargs={"query_ref": qref, "k": k},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    else:
        # task mode: the instance pickles only the ObjectRef (lazy fetch
        # per worker) — a true object-store broadcast
        cand = ds.map_batches(scorer, batch_format="pyarrow")
    return _rank_table(cand, int(q.shape[0]), k)


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
        m = embedding_matrix(batch["embedding"])
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(m).astype(np.int64), type=pa.int64())
        )


# ----------------------------------------------------------------- IVF


def _seed_centroid_table(ds: rd.Dataset, n_centroids: int) -> pa.Table:
    """The ``n_centroids`` lowest-vec_id rows WITHOUT a global sort: each
    block emits its local bottom-k by id (map_batches), the driver merges
    k×num_blocks rows (tiny) — zero shuffle, same rows as
    sort("vec_id").limit(k)."""

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = int64_column(batch["vec_id"])
        kk = min(n_centroids, ids.size)
        if kk == 0:
            return batch
        part = np.argpartition(ids, kk - 1)[:kk] if kk < ids.size else np.arange(ids.size)
        return batch.take(pa.array(part))

    from pyppmd_ray.functions.collect import collect_table

    cand = ds.map_batches(local_bottomk, batch_format="pyarrow")
    tbl = collect_table(cand)
    if tbl.num_rows == 0:
        raise ValueError("cannot seed centroids from an empty dataset")
    ids = int64_column(tbl["vec_id"])
    order = np.argsort(ids, kind="stable")[:n_centroids]
    return tbl.take(pa.array(order))


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


class _KmeansPartial(_LazyBroadcast):
    """Per-batch k-means partial sums: assign rows to the nearest
    (broadcast) centroid by cosine, emit C rows of (cid, count, vec_sum).
    The shuffle volume is C×dim per batch — independent of corpus size."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cents = self.state  # (C, dim) L2-normalized
        m = embedding_matrix(batch["embedding"])
        mn = _normalize_rows(m)
        assign = np.argmax(mn @ cents.T, axis=1)
        C, d = cents.shape
        counts = np.bincount(assign, minlength=C).astype(np.int64)
        sums = np.zeros((C, d), dtype=np.float64)
        np.add.at(sums, assign, mn)
        return pa.table(
            {
                "cid": pa.array(np.arange(C), type=pa.int64()),
                "count": pa.array(counts, type=pa.int64()),
                "vec_sum": pa.array(sums.tolist(), type=pa.list_(pa.float64())),
            }
        )


def train_centroids(
    ds: rd.Dataset, n_centroids: int = 16, n_iters: int = 3
) -> np.ndarray:
    """Distributed k-means (cosine / spherical): seed from the bottom-k
    ids (deterministic), then ``n_iters`` rounds of map_batches partial
    sums + a driver-side (C, dim) reduce. The corpus never concentrates
    anywhere; the driver holds only C×dim floats per round."""
    seed_tbl = _seed_centroid_table(ds, n_centroids)
    cents = _normalize_rows(embedding_matrix(seed_tbl["embedding"]))
    for _ in range(n_iters):
        ref = ray.put(cents)
        from pyppmd_ray.functions.collect import collect_table

        parts = ds.map_batches(_KmeansPartial(ref), batch_format="pyarrow")
        tbl = collect_table(parts)
        cids = int64_column(tbl["cid"])
        counts = int64_column(tbl["count"])
        sums = embedding_matrix(tbl["vec_sum"])
        C, d = cents.shape
        tot = np.zeros(C, dtype=np.int64)
        acc = np.zeros((C, d), dtype=np.float64)
        np.add.at(tot, cids, counts)
        np.add.at(acc, cids, sums)
        nonempty = tot > 0
        new = cents.copy()
        new[nonempty] = _normalize_rows(acc[nonempty] / tot[nonempty, None])
        cents = new
    return cents


class IvfScorer(_LazyBroadcast):
    """Scorer over broadcast (centroids, queries, probe masks). Each batch
    assigns its rows to their nearest centroid locally and scores only
    rows whose list is probed."""

    def __init__(self, ref, k: int):
        super().__init__(ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cents, qnorm, probe_mask = self.state
        ids = int64_column(batch["vec_id"])
        m = embedding_matrix(batch["embedding"])
        mn = _normalize_rows(m)
        # nearest centroid by cosine; argmax ties → lowest centroid index
        assign = np.argmax(mn @ cents.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(qnorm.shape[0]):
            mask = probe_mask[qi][assign]
            if not mask.any():
                continue
            s = mn[mask] @ qnorm[qi]
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
    nprobe: int = 4, concurrency=None, train: bool = False, train_iters: int = 3,
) -> pa.Table:
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    centroid lists; queries probe only the ``nprobe`` nearest lists and
    exact-score inside — the inverted-file shape (centroid id is the
    partition key at scale). Default centroids are the ``n_centroids``
    lowest-vec_id vectors, L2-normalized, found via per-block bottom-k +
    driver merge — NO global sort (deterministic seeding keeps the
    partition assignment SQL-reproducible). ``train=True`` refines them
    with :func:`train_centroids` (distributed spherical k-means) for
    better recall; the seeded variant remains the oracle path.
    Recall < 1 by design. Returns (q, rank, vec_id)."""
    q = np.asarray(queries, dtype=np.float64)
    if train:
        cents = train_centroids(ds, n_centroids, n_iters=train_iters)
    else:
        seed_tbl = _seed_centroid_table(ds, n_centroids)
        cents = _normalize_rows(embedding_matrix(seed_tbl["embedding"]))
    qnorm = _normalize_rows(q)
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
        # task mode: instance pickles only the ref (lazy per-worker fetch)
        cand = ds.map_batches(IvfScorer(ref=ref, k=k), batch_format="pyarrow")
    return _rank_table(cand, int(q.shape[0]), k)


class LshScorer(_LazyBroadcast):
    """Scorer over broadcast (planes, queries, probe-bucket masks). Each
    batch computes its rows' buckets locally, scores ONLY rows falling in
    a query's probe buckets, and emits that batch's top-k candidates per
    query — the corpus never leaves the workers."""

    def __init__(self, ref, k: int):
        super().__init__(ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        planes, qnorm, probe_mask = self.state
        ids = int64_column(batch["vec_id"])
        m = embedding_matrix(batch["embedding"])
        bits = (m @ planes.T) > 0
        buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1).astype(np.int64)
        mn = _normalize_rows(m)
        out_q, out_id, out_s = [], [], []
        for qi in range(qnorm.shape[0]):
            mask = probe_mask[qi][buckets]
            if not mask.any():
                continue
            s = mn[mask] @ qnorm[qi]
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
    qnorm = _normalize_rows(q)
    ref = ray.put((bucketer.planes, qnorm, probe_mask))
    if concurrency:
        cand = ds.map_batches(
            LshScorer,
            fn_constructor_kwargs={"ref": ref, "k": k},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    else:
        # task mode: instance pickles only the ref (lazy per-worker fetch)
        cand = ds.map_batches(LshScorer(ref=ref, k=k), batch_format="pyarrow")
    return _rank_table(cand, int(q.shape[0]), k)
