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
  worker (keys here are users/customers — bounded); ``salt_shards=S``
  opts into time-range salting for hot keys (group key becomes
  (key, shard); only per-shard boundary rows are replicated).
- :func:`hash_join` — general equi-join (inner/left). Two shapes:
  ``broadcast=True`` ships the (small) right side once via the object
  store and each left batch joins locally with an Arrow hash join — zero
  shuffle, the 100 TB shape for dimension tables; the default shuffle
  path tags + unions both sides (null-padded common schema) and
  cross-products inside one hash-partitioned groupby(key).map_groups —
  for two large sides. Partitioning assumption (shuffle path): one
  key's rows from BOTH sides fit in a worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def windowed_agg(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    width_s: int = 3600,
    hop_s: int | None = None,
    watermark_s: int | None = None,
) -> rd.Dataset:
    """Windowed aggregate → per (keys, window_start): n_events + total
    value in integer cents (float sums are order-dependent; cents are
    exact and SQL-reproducible).

    ``hop_s`` (default = ``width_s`` → tumbling): hopping/sliding
    windows — each event lands in ceil(width/hop) windows; the explode is
    a pure per-batch projection (replication factor is the bounded
    width/hop ratio), then the SAME single pre-aggregated groupby — no
    extra shuffle vs tumbling.

    ``watermark_s``: batch-engine watermark semantics — events older than
    (max event time − watermark_s) are LATE and dropped before
    windowing, mirroring a streaming job that closes windows once the
    watermark passes them. The max is one streamed aggregate (a scalar on
    the driver), broadcast into the filter."""
    from ray.data.aggregate import Count, Max, Sum

    width_us = int(width_s) * 1_000_000
    hop_us = int(hop_s or width_s) * 1_000_000
    n_windows = -(-width_us // hop_us)  # ceil: replication factor

    def _epoch(batch: pa.Table) -> pa.Array:
        tcol = batch[ts_col]
        if not pa.types.is_timestamp(tcol.type) or tcol.type.unit != "us":
            tcol = pc.cast(tcol, pa.timestamp("us"))
        return pc.cast(tcol, pa.int64())

    wm_us = None
    if watermark_s is not None:
        def local_max(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"t": pa.array([], type=pa.int64())})
            return pa.table(
                {"t": pa.array([pc.max(_epoch(batch)).as_py()], type=pa.int64())}
            )

        mx = ds.map_batches(local_max, batch_format="pyarrow").aggregate(
            Max("t", alias_name="t")
        )
        wm_us = int(mx["t"]) - int(watermark_s) * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        t = _epoch(batch).to_numpy(zero_copy_only=False)
        if wm_us is not None:
            keep = t >= wm_us
            batch = batch.filter(pa.array(keep))
            t = t[keep]
        # floor division (epochs here are positive)
        base = (t // hop_us) * hop_us
        # floor(x*100 + 0.5), NOT round(): pc.round is half-to-even while
        # SQL round() is half-away — floor(+0.5) is bit-identical on both
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch[value_col], 100.0), 0.5)), pa.int64()
        )
        if n_windows == 1:
            if hop_us > width_us:
                # sampling windows (hop > width): events in the gap
                # between windows belong to NO window and are dropped
                keep = (t - base) < width_us
                batch = batch.filter(pa.array(keep))
                base = base[keep]
                cents = cents.filter(pa.array(keep)) if len(cents) else cents
            out = batch.append_column(
                "window_start",
                pa.array(base, type=pa.int64()).cast(pa.timestamp("us")),
            )
            return out.append_column("value_cents", cents)
        # hopping: event at t belongs to starts {base - i*hop | i<R,
        # start + width > t}; build the exploded index once per batch
        idx_parts, start_parts = [], []
        rows = np.arange(t.size)
        for i in range(n_windows):
            s = base - i * hop_us
            valid = s + width_us > t
            idx_parts.append(rows[valid])
            start_parts.append(s[valid])
        idx = np.concatenate(idx_parts) if idx_parts else rows[:0]
        starts = np.concatenate(start_parts) if start_parts else base[:0]
        out = batch.append_column("value_cents", cents).take(pa.array(idx))
        return out.append_column(
            "window_start", pa.array(starts, type=pa.int64()).cast(pa.timestamp("us"))
        )

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
    salt_shards: int | None = None,
) -> rd.Dataset:
    """As-of join: for each left row, the right row of the same key with
    the greatest ``right_ts`` <= ``left_ts`` (ties on ts broken by max
    right id). Returns (left_id, right_id-or-null).

    Dataflow: both sides project to a common (key, t, id, side) schema,
    union (no shuffle), then ONE hash-partitioned groupby(key) where each
    group runs a vectorized sorted-merge (np.searchsorted) — the classic
    union-repartition-merge as-of shape.

    ``salt_shards=S``: hot-key remedy — the group key becomes
    (key, time_shard) with S equal-width shards over the LEFT ts range,
    so one key's rows split across S workers. Correctness is preserved by
    replicating only per-(key, shard) BOUNDARY rows: the right side is
    first reduced to its latest (t, id) per (key, shard) (a tiny
    pre-aggregate), then each later shard receives the prefix-latest row
    — ≤ S extra rows per key, never the key's history. Results are
    identical to the unsalted path."""

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

    lt_ds = left.map_batches(tag(0, left_key, left_ts, left_id), batch_format="pyarrow")
    rt_ds = right.map_batches(tag(1, right_key, right_ts, right_id), batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        side = group["side"].combine_chunks().to_numpy(zero_copy_only=False)
        t = group["t"].combine_chunks().to_numpy(zero_copy_only=False)
        rid = group["rid"].combine_chunks().to_numpy(zero_copy_only=False)
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

    if not salt_shards:
        return lt_ds.union(rt_ds).groupby("k").map_groups(merge, batch_format="pyarrow")

    # ---- salted path: (k, shard) group key + boundary-row replication
    S = int(salt_shards)
    from ray.data.aggregate import Max, Min

    rng = lt_ds.aggregate(Min("t", alias_name="tmin"), Max("t", alias_name="tmax"))
    tmin, tmax = int(rng["tmin"]), int(rng["tmax"])
    width = max(1, (tmax - tmin) // S + 1)

    def add_shard(batch: pa.Table) -> pa.Table:
        t = batch["t"].combine_chunks().to_numpy(zero_copy_only=False)
        # right rows outside the left range clip into the edge shards;
        # eligibility (rt <= lt) is still enforced by the merge
        sh = np.clip((t - tmin) // width, 0, S - 1).astype(np.int32)
        return batch.append_column("shard", pa.array(sh, type=pa.int32()))

    lt_s = lt_ds.map_batches(add_shard, batch_format="pyarrow")
    rt_s = rt_ds.map_batches(add_shard, batch_format="pyarrow")

    def latest_per_shard(group: pa.Table) -> pa.Table:
        t = group["t"].combine_chunks().to_numpy(zero_copy_only=False)
        rid = group["rid"].combine_chunks().to_numpy(zero_copy_only=False)
        i = int(np.lexsort((rid, t))[-1])  # max (t, rid)
        return group.take([i]).select(["k", "shard", "t", "rid"])

    latest = rt_s.groupby(["k", "shard"]).map_groups(
        latest_per_shard, batch_format="pyarrow"
    )

    _UNION_SCHEMA = ["k", "t", "rid", "side", "shard"]

    def fill_boundaries(group: pa.Table) -> pa.Table:
        """One key's per-shard latest rows → prefix-latest boundary row
        for every LATER shard (≤ S-1 rows per key)."""
        sh = group["shard"].combine_chunks().to_numpy(zero_copy_only=False)
        t = group["t"].combine_chunks().to_numpy(zero_copy_only=False)
        rid = group["rid"].combine_chunks().to_numpy(zero_copy_only=False)
        k = group["k"][0].as_py()
        order = np.argsort(sh)
        sh, t, rid = sh[order], t[order], rid[order]
        out_t, out_rid, out_sh = [], [], []
        best: tuple[int, int] | None = None
        ptr = 0
        for target in range(1, S):
            while ptr < sh.size and sh[ptr] < target:
                cand = (int(t[ptr]), int(rid[ptr]))
                if best is None or cand > best:
                    best = cand
                ptr += 1
            if best is not None:
                out_t.append(best[0])
                out_rid.append(best[1])
                out_sh.append(target)
        n = len(out_t)
        return pa.table(
            {
                "k": pa.array([k] * n, type=pa.int64()),
                "t": pa.array(out_t, type=pa.int64()),
                "rid": pa.array(out_rid, type=pa.int64()),
                "side": pa.array([1] * n, type=pa.int8()),
                "shard": pa.array(out_sh, type=pa.int32()),
            }
        )

    boundary = latest.groupby("k").map_groups(fill_boundaries, batch_format="pyarrow")

    def reorder(batch: pa.Table) -> pa.Table:
        return batch.select(_UNION_SCHEMA)

    unioned = (
        lt_s.map_batches(reorder, batch_format="pyarrow")
        .union(rt_s.map_batches(reorder, batch_format="pyarrow"))
        .union(boundary.map_batches(reorder, batch_format="pyarrow"))
    )
    return unioned.groupby(["k", "shard"]).map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------- equi-join

# rows per yielded cross-product chunk in the shuffle join's merge — caps
# a hot key's peak in-worker table at ~chunk_rows regardless of how many
# matching row pairs the key owns
JOIN_CHUNK_ROWS = 1 << 20


def _streaming_map_groups(
    ds: rd.Dataset, keys: list[str], gen_udf, empty_table: pa.Table | None = None
) -> rd.Dataset:
    """``groupby(keys).map_groups`` variant whose UDF is a GENERATOR
    yielding zero or more tables per group, so a single group's output
    streams to the object store in bounded chunks instead of
    materializing at once. Mirrors Ray's own map_groups plumbing
    (grouped_data.py: shuffle → per-block sorted-group slicing) — Ray's
    public map_groups validates the UDF return and rejects generators."""
    from ray.data.context import ShuffleStrategy

    ctx = ds.context
    if ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
        shuffled = ds.repartition(
            ctx.default_hash_shuffle_parallelism, keys=keys, sort=True
        )
    else:
        shuffled = ds.sort(keys)

    def flatten_groups(block: pa.Table):
        emitted = False
        if block.num_rows:
            from ray.data.block import BlockAccessor

            acc = BlockAccessor.for_block(block)
            bounds = acc._get_group_boundaries_sorted(keys)
            for start, end in zip(bounds[:-1], bounds[1:]):
                for out in gen_udf(block.slice(start, end - start)):
                    emitted = True
                    yield out
        if not emitted and empty_table is not None:
            # keep the result TYPED even when no group produced rows
            yield empty_table

    return shuffled.map_batches(
        flatten_groups, batch_size=None, batch_format="pyarrow"
    )


@ray.remote
def _concat_remote(*tables: pa.Table) -> pa.Table:
    """Worker-side concat for the broadcast side — the table goes straight
    into the object store; the driver only handles refs. Zero-column
    placeholder blocks (Ray emits schema-less empties from some operator
    chains) are dropped; empty-but-typed blocks are kept for the schema."""
    typed = [t for t in tables if t.num_columns > 0]
    if not typed:
        raise ValueError("broadcast side has no typed blocks (empty dataset?)")
    nonempty = [t for t in typed if t.num_rows > 0]
    return (
        pa.concat_tables(nonempty, promote_options="default")
        if nonempty
        else typed[0]
    )


from .broadcast import LazyBroadcast as _LazyBC


class _BroadcastJoiner(_LazyBC):
    """Per-batch Arrow hash join against a broadcast right table. The
    instance pickles only the ObjectRef; the table is fetched lazily once
    per worker process (:class:`..broadcast.LazyBroadcast`)."""

    def __init__(self, ref, keys, right_keys, join_type, empty_out, right_suffix="_r"):
        super().__init__(ref)
        self.keys = keys
        self.right_keys = right_keys
        self.join_type = join_type
        self.right_suffix = right_suffix
        # precomputed typed-empty OUTPUT table: zero-column placeholder
        # blocks (Ray emits schema-less empties from some operator
        # chains) can't go through batch.join — map them to this instead
        self.empty_out = empty_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return self.empty_out
        return batch.join(
            self.state,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
            right_suffix=self.right_suffix,
        )


def _join_untyped_empty(
    left, right, lschema, rschema, lkeys, rkeys, how, left_columns, right_columns
):
    """Resolve a join where one side is a schema-less EMPTY dataset (all
    blocks are zero-column placeholders). The empty side contributes no
    rows and no knowable column types, so the result is derived from the
    typed side alone; if the caller requested value columns from the
    untyped side we cannot type the output and fail loudly."""
    if lschema is None and rschema is None:
        raise ValueError(
            "hash_join: both inputs are schema-less empty datasets; "
            "materialize at least one side as a typed empty (e.g. "
            "ray.data.from_arrow(schema.empty_table()))"
        )
    if lschema is None:
        if left_columns:
            raise ValueError(
                "hash_join: left side is a schema-less empty dataset, so "
                f"left_columns={left_columns!r} cannot be typed; pass a "
                "typed empty left dataset instead"
            )
        # empty left → empty result for every `how`; schema = keys (typed
        # from the right side's key columns) + right value columns
        rfield = dict(zip(rschema.names, rschema.types))
        rval = right_columns if right_columns is not None else [
            n for n in rschema.names if n not in rkeys
        ]
        if how in ("semi", "anti"):
            rval = []
        cols = {kn: pa.array([], type=rfield[rk]) for kn, rk in zip(lkeys, rkeys)}
        taken = set(lkeys)
        for c in rval:
            cols[c if c not in taken else c + "_r"] = pa.array([], type=rfield[c])
        return rd.from_arrow(pa.table(cols))
    # rschema is None: empty right side
    if right_columns:
        raise ValueError(
            "hash_join: right side is a schema-less empty dataset, so "
            f"right_columns={right_columns!r} cannot be typed; pass a "
            "typed empty right dataset instead"
        )
    lfield = dict(zip(lschema.names, lschema.types))
    lval = left_columns if left_columns is not None else [
        n for n in lschema.names if n not in lkeys
    ]
    out_schema = pa.schema(
        [(k, lfield[k]) for k in lkeys] + [(c, lfield[c]) for c in lval]
    )
    if how in ("inner", "semi"):
        return rd.from_arrow(out_schema.empty_table())
    # left / anti: every left row survives unmatched (right has no value
    # columns to null-pad — it is schema-less)
    def proj(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return out_schema.empty_table()
        return batch.select(lkeys + lval)

    return left.map_batches(proj, batch_format="pyarrow")


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str | tuple[str, ...] | list[str],
    right_on: str | tuple[str, ...] | list[str] | None = None,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    broadcast: bool = False,
    salt: int | None = None,
    salt_keys=None,
) -> rd.Dataset:
    """General equi-join (the first relational op Ray Data itself lacks).

    Output schema: join keys (left names) + left value columns + right
    value columns (suffixed ``_r`` on collision). ``how``: "inner",
    "left", "semi" (left rows WITH a match, each once, left columns
    only), or "anti" (left rows WITHOUT a match — e.g. filtering a corpus
    against a blocklist). Semi/anti never ship right value columns, so
    their shuffle volume is left side + right keys only.

    ``broadcast=True`` — dimension-table shape: the right side is
    assembled IN a worker (``to_arrow_refs`` → remote concat; never on
    the driver), broadcast once through the object store, and each left
    batch runs a local Arrow hash join. Zero shuffle; right side must fit
    a worker's heap.

    Default (shuffle) shape — fact⋈fact: both sides project to a common
    null-padded schema, union (no shuffle), then ONE hash-partitioned
    ``groupby(keys).map_groups`` builds the per-key cross product.
    All-to-all volume = both projected sides, paid once. Partitioning
    assumption: one key's rows from both sides fit in a worker.

    ``salt=R`` (shuffle path): skew remedy — left rows spread across R
    sub-groups per key (deterministic row-position salt), right rows
    replicated into all R. One hot key then occupies R workers instead of
    one, at the cost of R× the RIGHT side's shuffle volume (use when the
    hot key's left side dominates). Results identical to unsalted.

    ``salt_keys=[...]`` (requires ``salt``, single join key): salt ONLY
    the listed hot keys; all other keys keep one group. Measured guidance
    (BASELINE.md r5, 1M rows / 30% on one key / 32 cpus): salting EVERY
    key multiplies the group count by R and its per-group overhead
    swamps the win (unsalted 2.9 s, salt=8 all keys 4.4 s) — while
    selective salting of just the hot key is strictly better once the
    hot key's cross product dominates (salt=8 hot-only 1.7 s, salt=16
    hot-only 1.1 s on a 48M-row hot cross product). Find hot keys with a
    cheap ``groupby(key).count()`` pre-pass and pass the head here.

    Schema-less empty inputs: when a side is an EMPTY dataset whose
    schema Ray cannot recover (``schema() is None``), the join degrades
    gracefully but the output schema differs from the typed-empty case —
    for ``how='left'``/``'anti'`` against an untyped empty right, only
    LEFT columns are returned (there is no type information to null-pad
    right value columns with; a TYPED empty right null-pads them as
    usual). Pass ``right_columns`` or a typed empty table when downstream
    code selects right columns in this edge case."""
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = lkeys if right_on is None else ([right_on] if isinstance(right_on, str) else list(right_on))
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"how must be 'inner', 'left', 'semi' or 'anti', got {how!r}"
        )
    lschema = left.schema()
    rschema = right.schema()
    # schema-less inputs (a Dataset whose every block is a zero-column
    # empty placeholder — e.g. a pair pipeline that found nothing) would
    # crash the .names access below; resolve them to a typed result where
    # derivable, else fail with an actionable message
    if lschema is None or rschema is None:
        return _join_untyped_empty(
            left, right, lschema, rschema, lkeys, rkeys, how,
            left_columns, right_columns,
        )
    lval = left_columns if left_columns is not None else [
        n for n in lschema.names if n not in lkeys
    ]
    rval = right_columns if right_columns is not None else [
        n for n in rschema.names if n not in rkeys
    ]

    _JOIN_TYPE = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
    }
    if how in ("semi", "anti"):
        rval = []  # right value columns never appear in semi/anti output

    if broadcast:
        proj = right.select_columns(rkeys + rval)
        # typed empty fallback: keeps the join schema-correct even when
        # every right block is an untyped empty placeholder
        rfield_all = dict(zip(rschema.names, rschema.types))
        fallback = pa.table(
            {c: pa.array([], type=rfield_all[c]) for c in rkeys + rval}
        )
        ref = _concat_remote.remote(fallback, *proj.to_arrow_refs())
        # exact output schema for placeholder blocks: run the SAME Arrow
        # join on a typed-empty left against the typed-empty right
        lnames = (lkeys + lval) if left_columns is not None else list(lschema.names)
        lfield_all = dict(zip(lschema.names, lschema.types))
        empty_left = pa.table({c: pa.array([], type=lfield_all[c]) for c in lnames})
        empty_out = empty_left.join(
            fallback, keys=lkeys, right_keys=rkeys,
            join_type=_JOIN_TYPE[how], right_suffix="_r",
        )
        joiner = _BroadcastJoiner(ref, lkeys, rkeys, _JOIN_TYPE[how], empty_out)
        lds = left.select_columns(lkeys + lval) if left_columns is not None else left
        # the extra typed-empty block pins the output schema even when
        # every joined block is empty (Ray reports schema None otherwise)
        return lds.map_batches(joiner, batch_format="pyarrow").union(
            rd.from_arrow(empty_out)
        )

    # ---- shuffle path: tag + union over a common null-padded schema
    # (ray.data Schema exposes parallel .names/.types, not pa.Schema iteration)
    lfield = dict(zip(lschema.names, lschema.types))
    rfield = dict(zip(rschema.names, rschema.types))
    # right value columns renamed on collision with left output names
    taken = set(lkeys) | set(lval)
    rout = [(c, c if c not in taken else c + "_r") for c in rval]
    key_types = [lfield[k] for k in lkeys]

    out_fields = (
        [(k, t) for k, t in zip(lkeys, key_types)]
        + [(c, lfield[c]) for c in lval]
        + [(oc, rfield[c]) for c, oc in rout]
    )
    out_schema = pa.schema(out_fields)

    R = int(salt) if salt and salt > 1 else 1
    hot_set = None
    if salt_keys is not None:
        if R == 1:
            raise ValueError("salt_keys requires salt >= 2")
        if len(lkeys) != 1:
            raise ValueError("salt_keys supports single-key joins only")
        hot_set = pa.array(list(salt_keys)).cast(key_types[0])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if batch.num_columns == 0:
                # schema-less placeholder block: emit a typed empty
                empty = {
                    kn: pa.array([], type=kt) for kn, kt in zip(lkeys, key_types)
                }
                empty.update({c: pa.array([], type=lfield[c]) for c in lval})
                empty.update({oc: pa.array([], type=rfield[c]) for c, oc in rout})
                empty["_side"] = pa.array([], type=pa.int8())
                empty["_salt"] = pa.array([], type=pa.int8())
                return pa.table(empty)
            keys_in = lkeys if side == 0 else rkeys
            # SQL null semantics: a null key matches NOTHING. Right rows
            # with any null key are dropped (they can never join); left
            # null-key rows are dropped for inner/semi and kept for
            # left/anti — their group then has no right rows, which the
            # merge already maps to null-padding / anti-keep.
            valid = None
            for ki in keys_in:
                v = pc.is_valid(batch[ki])
                valid = v if valid is None else pc.and_(valid, v)
            if side == 1 or how in ("inner", "semi"):
                if n and not pc.all(valid).as_py():
                    batch = batch.filter(valid)
                    n = batch.num_rows
            cols: dict = {}
            for kn, ki, kt in zip(lkeys, keys_in, key_types):
                cols[kn] = pc.cast(batch[ki], kt)
            for c in lval:
                cols[c] = batch[c] if side == 0 else pa.nulls(n, type=lfield[c])
            for c, oc in rout:
                cols[oc] = batch[c] if side == 1 else pa.nulls(n, type=rfield[c])
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8), type=pa.int8())
            out = pa.table(cols)
            if R == 1:
                return out.append_column(
                    "_salt", pa.array(np.zeros(n, dtype=np.int8), type=pa.int8())
                )
            hot = (
                np.asarray(
                    # null keys (kept left rows in left/anti joins) are
                    # never hot — fill the is_in null results with False
                    pc.fill_null(pc.is_in(out[lkeys[0]], value_set=hot_set), False)
                )
                if hot_set is not None
                else np.ones(n, dtype=bool)
            )
            if side == 0:
                # (hot) left rows spread round-robin by in-batch position
                salts = np.where(hot, np.arange(n) % R, 0).astype(np.int8)
                return out.append_column(
                    "_salt", pa.array(salts, type=pa.int8())
                )
            # (hot) right rows replicated into every salt bucket
            hot_idx = np.flatnonzero(hot)
            cold_idx = np.flatnonzero(~hot)
            idx = np.concatenate([cold_idx, np.tile(hot_idx, R)])
            salts = np.concatenate(
                [
                    np.zeros(cold_idx.size, dtype=np.int8),
                    np.repeat(np.arange(R, dtype=np.int8), hot_idx.size),
                ]
            )
            return out.take(pa.array(idx)).append_column(
                "_salt", pa.array(salts, type=pa.int8())
            )

        return fn

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    lout_names = lkeys + lval
    rout_names = [oc for _, oc in rout]

    def merge(group: pa.Table):
        """Generator: yields the group's join output in chunks of at most
        ~JOIN_CHUNK_ROWS rows, so a skewed key (10^5 × 10^4 matches) never
        materializes its full cross product in one worker table — the
        auto-guard counterpart to the opt-in ``salt=`` remedy (which
        additionally spreads a hot key's COMPUTE across workers)."""
        side = group["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if li.size == 0:
            return
        if how in ("semi", "anti"):
            want = (ri.size > 0) if how == "semi" else (ri.size == 0)
            if want:
                yield group.take(pa.array(li)).select(lout_names).cast(out_schema)
            return
        if ri.size == 0:
            if how == "left":  # no match: right cols stay null
                yield group.take(pa.array(li)).select(
                    lout_names + rout_names
                ).cast(out_schema)
            return
        lstep = max(1, JOIN_CHUNK_ROWS // ri.size)
        for s in range(0, li.size, lstep):
            lchunk = li[s : s + lstep]
            idx_l = np.repeat(lchunk, ri.size)
            idx_r = np.tile(ri, lchunk.size)
            lt = group.take(pa.array(idx_l)).select(lout_names)
            rt = group.take(pa.array(idx_r)).select(rout_names)
            cols = {n: lt[n] for n in lout_names}
            cols.update({n: rt[n] for n in rout_names})
            yield pa.table(cols).cast(out_schema)

    return _streaming_map_groups(
        unioned, lkeys + ["_salt"], merge, empty_table=out_schema.empty_table()
    )


def sessionize(
    ds: rd.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    gap_us: int = 1_800_000_000,
    order_col: str = "event_id",
) -> rd.Dataset:
    """Gap-based sessionization: split each key's event stream into
    sessions wherever the time between consecutive events exceeds
    ``gap_us`` microseconds, and return one summary row per session
    ``(key, session_id, n_events, first_ts, last_ts, duration_us)``.

    The behavioral-log curation primitive (session-level filtering /
    packing for user-interaction training data). Shape: one
    hash-partitioned ``groupby(key)`` whose per-group merge is fully
    vectorized — lexsort by (ts, order_col) for a deterministic order,
    one diff + cumsum for the session boundaries, and
    ``np.flatnonzero`` slicing for the per-session aggregates. No
    window-function state, no per-row Python.

    Partitioning assumption (same as :func:`asof_join`): one KEY's rows
    fit in a worker — keys are users, whose per-key history is bounded.
    session_id is 1-based in time order within each key.
    """
    sch = ds.schema()
    if sch is None or ts not in sch.names or key not in sch.names:
        # the empty-group filler table must carry the REAL ts/key types —
        # guessing (e.g. timestamp('us')) would emit blocks whose schema
        # conflicts with real groups and break downstream union/concat
        raise ValueError(
            f"sessionize requires a dataset with a known schema containing "
            f"{key!r} and {ts!r} (got {sch})"
        )
    ts_type = sch.types[sch.names.index(ts)]

    def merge(group: pa.Table):
        n = group.num_rows
        tcol = group[ts].combine_chunks()
        tus = tcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        oid = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oid, tus))
        tsorted = tus[order]
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        np.greater(np.diff(tsorted), np.int64(gap_us), out=new_sess[1:])
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n)
        first = tsorted[starts]
        last = tsorted[ends - 1]
        keyval = group[key][0]
        t = tcol.type
        yield pa.table(
            {
                key: pa.array([keyval.as_py()] * starts.size, type=group[key].type),
                "session_id": pa.array(
                    np.arange(1, starts.size + 1, dtype=np.int64), type=pa.int64()
                ),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "first_ts": pa.array(first, type=pa.int64()).cast(t),
                "last_ts": pa.array(last, type=pa.int64()).cast(t),
                "duration_us": pa.array(last - first, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            key: pa.array([], type=sch.types[sch.names.index(key)]),
            "session_id": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "first_ts": pa.array([], type=ts_type),
            "last_ts": pa.array([], type=ts_type),
            "duration_us": pa.array([], type=pa.int64()),
        }
    )
    return _streaming_map_groups(
        ds.select_columns([key, ts, order_col]), [key], merge, empty_table=empty
    )
