"""Relational operators Ray Data lacks, composed from its primitives.

Per the engine's custom-operator policy (SURVEY.md §2.6): express the
semantics as map_batches + groupby().map_groups + sort where possible,
and document the partitioning assumption each relies on.

- :func:`windowed_agg` — tumbling-window aggregate over a timestamp
  column. Shape: map_batches computes the window id (pure projection, no
  shuffle), then one groupby((keys, window)) whose map-side combine does
  the heavy lifting — the pre-aggregate-before-shuffle pattern.
- :func:`asof_join` — for each left row, the latest right row with
  right_ts <= left_ts within the same key. Shape: tag + union + one
  hash-partitioned groupby(key) + a vectorized per-group merge
  (searchsorted). Partitioning assumption: one KEY's rows fit in a
  worker (keys here are users/customers — bounded); a hot key would need
  time-range salting on top.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def windowed_agg(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    width_s: int = 3600,
) -> rd.Dataset:
    """Tumbling windows of ``width_s`` seconds → per (keys, window_start):
    n_events + total value in integer cents (float sums are
    order-dependent; cents are exact and SQL-reproducible)."""
    from ray.data.aggregate import Count, Sum

    width_us = int(width_s) * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch[ts_col], pa.int64())
        # floor division (epochs here are positive; pc.divide truncates,
        # which equals floor for non-negative values)
        w = pc.multiply(pc.divide(epoch, width_us), width_us)
        # floor(x*100 + 0.5), NOT round(): pc.round is half-to-even while
        # SQL round() is half-away — floor(+0.5) is bit-identical on both
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch[value_col], 100.0), 0.5)), pa.int64()
        )
        return batch.append_column(
            "window_start", pc.cast(w, batch[ts_col].type)
        ).append_column("value_cents", cents)

    agg = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby([*keys, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="total_value_cents"),
        )
    )

    def fix_ts(batch: pa.Table) -> pa.Table:
        # whole-second window keys come back as timestamp[s] from the
        # aggregate; restore the input's unit so schemas stay stable
        i = batch.schema.get_field_index("window_start")
        return batch.set_column(
            i, "window_start", batch["window_start"].cast(pa.timestamp("us"))
        )

    return agg.map_batches(fix_ts, batch_format="pyarrow")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
) -> rd.Dataset:
    """As-of join: for each left row, the right row of the same key with
    the greatest ``right_ts`` <= ``left_ts`` (ties on ts broken by max
    right id). Returns (left_id, right_id-or-null).

    Dataflow: both sides project to a common (key, t, id, side) schema,
    union (no shuffle), then ONE hash-partitioned groupby(key) where each
    group runs a vectorized sorted-merge (np.searchsorted) — the classic
    union-repartition-merge as-of shape."""

    def tag(side: int, key: str, ts: str, idc: str):
        def fn(batch: pa.Table) -> pa.Table:
            # normalize BOTH sides to microseconds before the int64 view —
            # mixed units (e.g. timestamp[us] vs date32) would otherwise
            # compare raw numbers across different scales
            tcol = batch[ts]
            if not pa.types.is_timestamp(tcol.type) or tcol.type.unit != "us":
                tcol = pc.cast(tcol, pa.timestamp("us"))
            return pa.table(
                {
                    "k": pc.cast(batch[key], pa.int64()),
                    "t": pc.cast(tcol, pa.int64()),
                    "rid": pc.cast(batch[idc], pa.int64()),
                    "side": pa.array([side] * batch.num_rows, type=pa.int8()),
                }
            )

        return fn

    unioned = left.map_batches(tag(0, left_key, left_ts, left_id), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_key, right_ts, right_id), batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"].to_pylist(), dtype=np.int8)
        t = np.asarray(group["t"].to_pylist(), dtype=np.int64)
        rid = np.asarray(group["rid"].to_pylist(), dtype=np.int64)
        lmask = side == 0
        lt, lid = t[lmask], rid[lmask]
        rt, rrid = t[~lmask], rid[~lmask]
        if rt.size == 0:
            match = np.full(lid.size, -1, dtype=np.int64)
        else:
            order = np.lexsort((rrid, rt))  # by (ts, id): last = max id at ts
            rt, rrid = rt[order], rrid[order]
            idx = np.searchsorted(rt, lt, side="right") - 1
            match = np.where(idx >= 0, rrid[np.maximum(idx, 0)], -1)
        return pa.table(
            {
                "left_id": pa.array(lid, type=pa.int64()),
                "right_id": pa.array(
                    match, type=pa.int64(), mask=(match < 0)
                ),
            }
        )

    return unioned.groupby("k").map_groups(merge, batch_format="pyarrow")
