"""Sequence packing for training pipelines: assign each document to a
fixed-token-budget pack (the pre-tokenization step that turns a corpus
into ~equal training sequences).

Semantics (deterministic, SQL-mirrorable): documents ordered by
``doc_id``; pack_id = floor(tokens_before / budget) where tokens_before
is the running token total of all PRECEDING documents. A document that
straddles a boundary belongs to the pack it starts in (packs can exceed
the budget by at most one document's tokens — the standard
contiguous-chunking definition).

Dataflow — a distributed PREFIX SUM:
1. ``sort(doc_id)`` (one range shuffle; blocks become disjoint id ranges)
2. pass 1: per-batch (min_id, token_sum) partials — tiny driver table
3. driver: sort partials by min_id → exclusive prefix offsets (a dict of
   batch-min-id → tokens_before, broadcast via closure; its size is the
   number of batches, not rows)
4. pass 2: per-batch local cumsum + the batch's offset → pack ids.

Correctness relies on sorted-range batches being id-disjoint, which
Ray's range-partitioned sort guarantees for a unique key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .text import token_counts


def pack_sequences(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
) -> rd.Dataset:
    """documents → (doc_id, n_tokens, pack_id). See module docstring for
    the exact pack semantics and the two-pass prefix-sum dataflow."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "n_tokens": pa.array(token_counts(batch[text_col]), type=pa.int64()),
            }
        )

    ordered = (
        ds.map_batches(project, batch_format="pyarrow").sort(id_col).materialize()
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"min_id": pa.array([], type=pa.int64()),
                 "tok_sum": pa.array([], type=pa.int64())}
            )
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        toks = batch["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_id": pa.array([int(ids.min())], type=pa.int64()),
                "tok_sum": pa.array([int(toks.sum())], type=pa.int64()),
            }
        )

    # batch_size=None in BOTH passes: one batch per block of the same
    # materialized dataset → identical boundaries, so pass 2's lookup by
    # batch min_id cannot miss (a mismatch raises KeyError loudly)
    parts = pa.concat_tables(
        ordered.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    mins = parts["min_id"].combine_chunks().to_numpy(zero_copy_only=False)
    sums = parts["tok_sum"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(mins, kind="stable")
    mins, sums = mins[order], sums[order]
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offset_of = {int(m): int(o) for m, o in zip(mins, offsets)}

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "pack_id": pa.array([], type=pa.int64()),
                }
            )
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        toks = batch["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        base = offset_of[int(ids.min())]
        before = base + np.concatenate(([0], np.cumsum(toks)[:-1]))
        return batch.append_column(
            "pack_id", pa.array(before // budget, type=pa.int64())
        )

    # batch_size=None: one batch per block, matching the pass-1 partials
    return ordered.map_batches(assign, batch_format="pyarrow", batch_size=None)
