"""Composed training-data curation pipeline.

The canonical chain a 100 TB corpus goes through before tokenization:
exact dedup → quality gate → per-doc stats. Each stage is one of the
engine's existing Ray-Data-native operators; this module just wires them
into a single streaming Dataset (no driver materialization anywhere).
"""

from __future__ import annotations

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
