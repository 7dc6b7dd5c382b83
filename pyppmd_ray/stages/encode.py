"""Stateful encode/decode stages for Ray Data actor pools.

The reference's codec objects refuse pickling
(`/root/reference/src/ext/_ppmdmodule.c:617-634`) — codec state must be
constructed inside each worker. These callable classes are the Ray Data
translation: construct in ``__init__`` (once per actor), encode per batch
in ``__call__``; pass to ``ds.map_batches(Cls, concurrency=N,
batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa

from .blocks import BLOCK_SCHEMA, decode_block, encode_block, split_by_bytes

DEFAULT_BLOCK_BYTES = 16 << 20


class EncoderActor:
    """pa.Table batch → table of encoded block rows (BLOCK_SCHEMA).

    ``hints``: optional per-column codec pins ({col: {"layout":...,
    "data_codec":...}}); when absent the sampling selector runs per block
    (deterministic, so retries produce identical bytes).
    """

    def __init__(
        self,
        target_block_bytes: int = DEFAULT_BLOCK_BYTES,
        hints: dict | None = None,
        columns: list[str] | None = None,
    ):
        self.target_block_bytes = int(target_block_bytes)
        self.hints = hints
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.columns:
            batch = batch.select(self.columns)
        subs = split_by_bytes(batch, self.target_block_bytes)
        if not subs:
            return BLOCK_SCHEMA.empty_table()
        # plan once per batch (deterministic: derived from the batch's own
        # first sub-block), reuse across its sub-blocks
        hints = self.hints
        if hints is None:
            from ..codecs.select import plan_table

            hints = plan_table(subs[0])
        rows = [encode_block(sub, hints=hints) for sub in subs]
        return pa.Table.from_pylist(rows, schema=BLOCK_SCHEMA)


class DecoderActor:
    """table of encoded block rows → original pa.Table slices.

    Generator UDF: yields one decoded table per block so downstream stages
    stream block-by-block instead of waiting on a concat."""

    def __call__(self, batch: pa.Table):
        for p in batch["payload"]:
            yield decode_block(p.as_py())
