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

    from pyppmd_ray.functions.collect import collect_table

    # batch_size=None in BOTH passes: one batch per block of the same
    # materialized dataset → identical boundaries, so pass 2's lookup by
    # batch min_id cannot miss (a mismatch raises KeyError loudly)
    parts = collect_table(
        ordered.map_batches(partial, batch_format="pyarrow", batch_size=None),
        empty=pa.table(
            {"min_id": pa.array([], type=pa.int64()),
             "tok_sum": pa.array([], type=pa.int64())}
        ),
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


def token_budget_sample(
    ds: rd.Dataset,
    *,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Corpus mixing to per-group token quotas: within each group, keep
    documents in deterministic pseudo-random order (sha256(doc_id) — the
    engine's rerun-stable sampling hash) until the group's running token
    total reaches ``budget`` → Dataset(doc_id, group, n_tokens,
    tokens_before). A document is kept iff the tokens BEFORE it are
    < budget (greedy fill: the last kept doc may overflow the quota) —
    how a training mix caps each language/domain at a token share
    rather than a row count.

    Dataflow — the GROUPED distributed prefix sum (pack_sequences'
    two-pass pattern, keyed): one ``sort((group, h, id))`` range
    shuffle, then per-block per-group (block_key, group, token_sum)
    partials (≤ blocks×groups tiny rows) scanned on the driver into
    exclusive per-(block, group) offsets, then a map-side pass adding
    block offset + local segment cumsum and filtering. Sorted-range
    blocks are key-disjoint, so segment arithmetic never crosses
    blocks.
    """
    from pyppmd_ray.functions.hashing import sha256_prefix_u64

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                group_col: batch[group_col],
                "n_tokens": pa.array(token_counts(batch[text_col]), type=pa.int64()),
                "h": pa.array(sha256_prefix_u64(batch[id_col]), type=pa.uint64()),
            }
        )

    ordered = (
        ds.map_batches(project, batch_format="pyarrow")
        .sort([group_col, "h", id_col])
        .materialize()
    )

    def _segments(batch: pa.Table):
        """Contiguous group segments of a sorted block: (names, starts,
        codes-of-rows)."""
        garr = batch[group_col].combine_chunks()
        d = garr.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        names = [garr[int(s)].as_py() for s in starts]
        return names, starts

    def _block_key(batch: pa.Table):
        return (
            batch[group_col][0].as_py(),
            int(batch["h"][0].as_py()),
            int(batch[id_col][0].as_py()),
        )

    empty_partial = pa.table(
        {
            "bg": pa.array([], type=pa.string()),
            "bh": pa.array([], type=pa.uint64()),
            "bi": pa.array([], type=pa.int64()),
            "grp": pa.array([], type=pa.string()),
            "tok_sum": pa.array([], type=pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_partial
        names, starts = _segments(batch)
        toks = batch["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(toks, starts)
        g0, h0, i0 = _block_key(batch)
        k = len(names)
        return pa.table(
            {
                "bg": pa.array([g0] * k, type=pa.string()),
                "bh": pa.array([h0] * k, type=pa.uint64()),
                "bi": pa.array([i0] * k, type=pa.int64()),
                "grp": pa.array(names, type=pa.string()),
                "tok_sum": pa.array(sums, type=pa.int64()),
            }
        )

    from pyppmd_ray.functions.collect import collect_table

    parts = collect_table(
        ordered.map_batches(partial, batch_format="pyarrow", batch_size=None),
        empty=empty_partial,
    )
    # driver scan: order blocks by their min composite key, accumulate
    # per-group exclusive offsets across blocks
    order = pc.sort_indices(
        parts, sort_keys=[("bg", "ascending"), ("bh", "ascending"), ("bi", "ascending")]
    )
    parts = parts.take(order)
    offset_of: dict[tuple, int] = {}
    running: dict[str, int] = {}
    for bg, bh, bi, grp, s in zip(
        parts["bg"].to_pylist(),
        parts["bh"].to_pylist(),
        parts["bi"].to_pylist(),
        parts["grp"].to_pylist(),
        parts["tok_sum"].to_pylist(),
    ):
        offset_of[(bg, int(bh), int(bi), grp)] = running.get(grp, 0)
        running[grp] = running.get(grp, 0) + int(s)

    out_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            group_col: pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
            "tokens_before": pa.array([], type=pa.int64()),
        }
    )

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_empty
        names, starts = _segments(batch)
        toks = batch["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        n = toks.size
        seg_lens = np.diff(np.append(starts, n))
        seg_of_row = np.repeat(np.arange(starts.size, dtype=np.int64), seg_lens)
        before_global = np.cumsum(toks) - toks
        local_before = before_global - before_global[starts][seg_of_row]
        g0, h0, i0 = _block_key(batch)
        offs = np.array(
            [offset_of[(g0, h0, i0, name)] for name in names], dtype=np.int64
        )
        before = local_before + offs[seg_of_row]
        out = pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "n_tokens": batch["n_tokens"],
                "tokens_before": pa.array(before, type=pa.int64()),
            }
        )
        return out.filter(pa.array(before < budget))

    return ordered.map_batches(keep, batch_format="pyarrow", batch_size=None)
