"""Deduplication operators for training-data pipelines, Ray-Data-first.

Scale shapes (documented per operator):
- exact: content-hash column added in map_batches (vectorized sha256),
  then groupby(hash) keeps the min doc_id — the hash column keeps the
  shuffle narrow (64-hex strings instead of full documents);
- MinHash+LSH: per-batch shingle→minhash signatures (numpy), explode to
  (band_id, band_hash, doc_id) rows, groupby the band key → candidate
  pairs, verify by signature agreement. All-to-all volume is
  O(docs × bands), never O(docs²);
- SimHash: 64-bit hyperplane sketch per doc (vectorized), near-dup =
  hamming distance ≤ t within bucket prefixes;
- embedding cosine: brute-force per-batch numpy matmul against a
  broadcast (ray.put) matrix — for the testdata scale; the IVF/LSH
  bucketed path is in functions/ann.py.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

_M61 = (1 << 61) - 1


def add_text_sha(batch: pa.Table, column: str = "text") -> pa.Table:
    shas = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
        for t in batch[column].to_pylist()
    ]
    return batch.append_column("text_sha", pa.array(shas, type=pa.string()))


def dedup_exact(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Keep the min-id row per distinct text. Shuffle key = sha256(text)
    (hash-partitioned groupby; full text never shuffled twice)."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_text_sha, batch_format="pyarrow")
    keep = hashed.groupby("text_sha").aggregate(Min(id_col, alias_name="keep_id"))
    keep_ids = {r["keep_id"] for r in keep.take_all()}  # ids only — small
    ref = ray.put(keep_ids)

    def filt(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        mask = np.array([i in ids for i in batch[id_col].to_pylist()])
        return batch.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow")


# ------------------------------------------------------------- MinHash/LSH

class MinHasher:
    """Word-shingle MinHash signatures. Stateful: the (a,b) hash params
    are built once per actor."""

    def __init__(self, num_hashes: int = 128, shingle: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _M61, size=num_hashes, dtype=np.int64).astype(np.uint64)
        self.num_hashes = num_hashes
        self.shingle = shingle

    def _shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        k = self.shingle
        if len(toks) < k:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        return np.array(
            [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
             for s in set(shingles)],
            dtype=np.uint64,
        )

    def signature(self, text: str) -> np.ndarray:
        h = self._shingle_hashes(text)
        if h.size == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        # (a*x + b) mod M61, vectorized over shingles × hashes
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_M61)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.astype(np.int64).tolist() for s in sigs],
                                type=pa.list_(pa.int64())),
            }
        )


def minhash_bands(batch: pa.Table, bands: int = 16, rows: int = 8) -> pa.Table:
    """Explode signatures → (band_id, band_hash, doc_id) rows (the LSH
    shuffle key)."""
    out_band, out_hash, out_id = [], [], []
    for doc_id, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        s = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = s[b * rows : (b + 1) * rows]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            out_band.append(b)
            out_hash.append(int.from_bytes(h, "little") >> 1)
            out_id.append(doc_id)
    return pa.table(
        {
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
            "doc_id": pa.array(out_id, type=pa.int64()),
        }
    )


def candidate_pairs_from_bands(bands_tbl: pa.Table) -> set[tuple[int, int]]:
    """Groupby (band_id, band_hash) → all intra-bucket pairs."""
    import pandas as pd

    df = bands_tbl.to_pandas()
    pairs: set[tuple[int, int]] = set()
    for _, g in df.groupby(["band_id", "band_hash"]):
        ids = sorted(g["doc_id"].tolist())
        if len(ids) > 1:
            pairs.update(combinations(ids, 2))
    return pairs


def minhash_lsh_pairs(
    ds: rd.Dataset, *, num_hashes: int = 128, bands: int = 16, rows: int = 8,
    shingle: int = 3, threshold: float = 0.5, concurrency=None,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline → (doc_id_a, doc_id_b, jaccard_est).

    Dataflow: map_batches(MinHasher actor pool) → band explode →
    groupby(band key) buckets → candidate pairs → verify by signature
    agreement ≥ threshold. At scale the candidate-pair verify joins
    signatures by doc_id partition; here signatures are broadcast
    (testdata ≤ 10^4 docs)."""
    conc = concurrency or 2
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes, "shingle": shingle},
        batch_format="pyarrow",
        concurrency=conc,
    )
    sig_tbl = pa.concat_tables(sigs.iter_batches(batch_size=None, batch_format="pyarrow"))
    bands_tbl = minhash_bands(sig_tbl, bands=bands, rows=rows)
    pairs = candidate_pairs_from_bands(bands_tbl)
    sig_map = {
        d: np.asarray(s, dtype=np.int64)
        for d, s in zip(sig_tbl["doc_id"].to_pylist(), sig_tbl["sig"].to_pylist())
    }
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(pairs):
        est = float(np.mean(sig_map[a] == sig_map[b]))
        if est >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(est, 4))
    return pa.table(
        {
            "doc_id_a": pa.array(out_a, type=pa.int64()),
            "doc_id_b": pa.array(out_b, type=pa.int64()),
            "jaccard_est": pa.array(out_j, type=pa.float64()),
        }
    )


# ---------------------------------------------------------------- SimHash

class SimHasher:
    """64-bit SimHash over word features (Charikar 2002)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            toks = (t or "").split()
            if not toks:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for w in set(toks):
                h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits.astype(bool), 1, -1)
            sh = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(sh & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, type=pa.int64())}
        )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard (the verify step after LSH candidates)."""
    def grams(t: str) -> set[str]:
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)


def embedding_neardup_pairs(tbl: pa.Table, threshold: float = 0.9) -> pa.Table:
    """(vec_id_a, vec_id_b) with cosine > threshold, a < b — brute-force
    float64 numpy matmul (matches DuckDB list_cosine_similarity doubles)."""
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    cos = mn @ mn.T
    ia, ib = np.where(np.triu(cos > threshold, k=1))
    order = np.lexsort((ids[ib], ids[ia]))
    return pa.table(
        {
            "vec_id_a": pa.array(ids[ia][order], type=pa.int64()),
            "vec_id_b": pa.array(ids[ib][order], type=pa.int64()),
        }
    )
