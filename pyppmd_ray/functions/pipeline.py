"""Composed training-data curation pipeline.

The canonical chain a 100 TB corpus goes through before tokenization:
exact dedup → quality gate → per-doc stats. Each stage is one of the
engine's existing Ray-Data-native operators; this module just wires them
into a single streaming Dataset (no driver materialization anywhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def prepare_corpus(
    ds: rd.Dataset,
    *,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
) -> rd.Dataset:
    """documents → deduplicated, quality-gated (doc_id, n_chars, n_tokens).

    Stages: exact dedup (groupby(sha).map_groups min-id) → QualityScorer
    metrics per batch → vectorized filter on (n_tokens, alpha_ratio).
    Thresholds use >=/<‐free comparisons identical to the SQL oracle."""
    from .dedup import dedup_exact
    from .text import QualityScorer

    deduped = dedup_exact(ds)
    scorer = QualityScorer()

    def gate(batch: pa.Table) -> pa.Table:
        m = scorer(batch)
        mask = pc.and_(
            pc.greater_equal(m["n_tokens"], min_tokens),
            pc.greater(m["alpha_ratio"], min_alpha_ratio),
        )
        return pa.table(
            {
                "doc_id": m["doc_id"].filter(mask),
                "n_chars": m["n_chars"].filter(mask),
                "n_tokens": m["n_tokens"].filter(mask),
            }
        )

    return deduped.map_batches(gate, batch_format="pyarrow")


def prepare_corpus_neardup(
    ds: rd.Dataset,
    *,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
    lsh_threshold: float = 0.3,
) -> rd.Dataset:
    """The full curation chain with NEAR-dup removal: exact dedup →
    MinHash-LSH pairs → connected components → keep each cluster's min-id
    representative → quality gate. Every stage is one of the engine's own
    distributed operators (LSH banding, label propagation, anti-join) —
    no driver materialization beyond per-round scalar fixpoint checks."""
    import pyarrow.compute as pc

    from .dedup import dedup_exact, minhash_lsh_pairs
    from .graph import connected_components
    from .relational import hash_join
    from .text import QualityScorer

    deduped = dedup_exact(ds).materialize()  # reused: pairs + final filter
    pairs = minhash_lsh_pairs(deduped, threshold=lsh_threshold)
    cc = connected_components(pairs)
    # non-representative = a node whose component label differs from it
    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["node"], batch["lbl"])
        return pa.table({"drop_id": batch["node"].filter(keep)})

    drop = cc.map_batches(losers, batch_format="pyarrow")
    # broadcast the drop list only while it is small (it scales with the
    # number of near-duplicates); cc is materialized → count() is cheap
    kept = hash_join(
        deduped, drop, on="doc_id", right_on="drop_id", how="anti",
        broadcast=cc.count() <= 5_000_000,
    )
    scorer = QualityScorer()

    def gate(batch: pa.Table) -> pa.Table:
        m = scorer(batch)
        mask = pc.and_(
            pc.greater_equal(m["n_tokens"], min_tokens),
            pc.greater(m["alpha_ratio"], min_alpha_ratio),
        )
        return pa.table(
            {
                "doc_id": m["doc_id"].filter(mask),
                "n_chars": m["n_chars"].filter(mask),
                "n_tokens": m["n_tokens"].filter(mask),
            }
        )

    return kept.map_batches(gate, batch_format="pyarrow")


def prepare_training_corpus(
    ds: rd.Dataset,
    benchmark: rd.Dataset,
    *,
    contam_ngram: int = 5,
    max_dup_token_frac: float = 0.6,
    chunk_tokens: int = 64,
    pack_budget: int = 256,
    uid_stride: int = 1_000_000,
) -> rd.Dataset:
    """The full pre-tokenization chain, end to end: decontaminate +
    repetition-gate (ONE map-side pass) → exact dedup → token-budget
    chunking → sequence packing → (doc_id, chunk_id, n_tokens, pack_id).

    Shuffle budget for the whole pipeline: ONE ``groupby(sha)`` (dedup)
    + ONE range-shuffle sort (packing). Everything else is map-side:
    the benchmark n-gram set broadcasts once (eval suites are MBs), and
    contamination + repetition are computed together per batch so the
    corpus is tokenized once for both gates.

    ``uid_stride`` must exceed the max chunks per document
    (ceil(longest_doc_tokens / chunk_tokens)); chunk uid =
    doc_id·stride + chunk_id must also fit int64.
    """
    from .dedup import dedup_exact
    from .sequence import pack_sequences
    from .text import (
        _dup_stats,
        _flat_tokens,
        _ngrams_from_tokens,
        benchmark_gram_broadcast,
        chunk_documents,
    )

    bcast = benchmark_gram_broadcast(benchmark, contam_ngram)

    def gate(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        contaminated = np.zeros(n_rows, dtype=bool)
        # tokenize ONCE; contamination windows and repetition stats both
        # derive from the same flat token array
        flat, row_idx = _flat_tokens(batch["text"])
        grams, widx = _ngrams_from_tokens(flat, row_idx, contam_ngram)
        if len(grams) and len(bcast.state):
            hit = np.asarray(pc.is_in(grams, value_set=bcast.state), dtype=bool)
            contaminated[np.unique(widx[hit])] = True
        total, distinct, _ = _dup_stats(flat, row_idx, n_rows)
        dup_frac = np.zeros(n_rows, dtype=np.float64)
        nz = total > 0
        dup_frac[nz] = 1.0 - distinct[nz].astype(np.float64) / total[nz].astype(
            np.float64
        )
        keep = ~contaminated & (dup_frac <= max_dup_token_frac)
        return batch.select(["doc_id", "text"]).filter(pa.array(keep))

    gated = ds.map_batches(gate, batch_format="pyarrow")
    deduped = dedup_exact(gated)
    chunks = chunk_documents(deduped, max_tokens=chunk_tokens)

    def add_uid(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            max_chunk = pc.max(batch["chunk_id"]).as_py()
            if max_chunk >= uid_stride:
                raise ValueError(
                    f"chunk_id {max_chunk} >= uid_stride {uid_stride}; raise "
                    f"uid_stride above max chunks per document"
                )
        # checked kernels: doc_id*stride near int64 max must error loudly,
        # not wrap into another document's uid range
        uid = pc.add_checked(
            pc.multiply_checked(
                batch["doc_id"], pa.scalar(uid_stride, type=pa.int64())
            ),
            batch["chunk_id"],
        )
        return batch.append_column("chunk_uid", uid)

    packed = pack_sequences(
        chunks.map_batches(add_uid, batch_format="pyarrow"),
        id_col="chunk_uid",
        text_col="text",
        budget=pack_budget,
    )

    def finish(batch: pa.Table) -> pa.Table:
        uid = batch["chunk_uid"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(uid // uid_stride, type=pa.int64()),
                "chunk_id": pa.array(uid % uid_stride, type=pa.int64()),
                "n_tokens": batch["n_tokens"],
                "pack_id": batch["pack_id"],
            }
        )

    return packed.map_batches(finish, batch_format="pyarrow")
