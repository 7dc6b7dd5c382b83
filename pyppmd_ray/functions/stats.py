"""Distributed statistics operators — distinct counting (exact and
sketched) and column profiling.

All three follow the pre-aggregate-before-shuffle discipline:

- :func:`distinct_count` — exact: per-batch LOCAL distinct of the hashed
  key (narrows the shuffle to 64-bit hashes, deduped once per batch),
  then one groupby + row count. Shuffle volume ≤ distinct-per-batch
  hashes, never the raw values.
- :func:`kmv_distinct` — k-minimum-values sketch (Bar-Yossef et al. 2002):
  keep the k smallest sha256-prefix hashes of distinct values; estimate
  = (k-1) / (kth_min / 2^64). Per-batch local k-mins → driver merge of
  k×num_blocks u64s. Exactly SQL-reproducible (the oracle computes the
  identical hashes and division), unlike HLL whose leading-zero rank is
  awkward to pin bit-exactly in SQL.
- :func:`profile_numeric` — per-column (count, nulls, min, max) via
  per-batch partials merged on the driver (order-independent measures
  only; sums are excluded deliberately — float addition order differs
  across parallelism levels).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from pyppmd_ray.functions.hashing import sha256_prefix_u64

_U64_SPAN = float(1 << 64)


def distinct_count(ds: rd.Dataset, col: str) -> pa.Table:
    """Exact number of distinct values of ``col`` → 1-row table
    (n_distinct). In-cluster: batch-local dedup of 64-bit hashes →
    groupby(hash) → count of groups; the driver sees one integer.

    (sha256 prefixes collide with probability ~n²/2^65 — zero at any
    realistic cardinality, and the SQL oracle hashes identically so the
    check is exact either way.)"""

    def local_distinct(batch: pa.Table) -> pa.Table:
        h = np.unique(sha256_prefix_u64(batch[col]))
        return pa.table({"h": pa.array(h.astype(np.int64), type=pa.int64())})

    n = ds.map_batches(local_distinct, batch_format="pyarrow").groupby("h").count().count()
    return pa.table({"n_distinct": pa.array([n], type=pa.int64())})


def kmv_distinct(ds: rd.Dataset, col: str, k: int = 256) -> pa.Table:
    """K-minimum-values distinct-count sketch → 1-row table
    (k, kth_hash, n_distinct_est). Each batch contributes its k smallest
    distinct hashes; the driver merges k×num_blocks u64s (tiny). With
    fewer than k distinct values the estimate is exact (the count of
    distinct hashes seen)."""

    def local_kmins(batch: pa.Table) -> pa.Table:
        h = np.unique(sha256_prefix_u64(batch[col]))[:k]
        return pa.table({"h": pa.array(h.astype(np.int64), type=pa.int64())})

    from pyppmd_ray.functions.collect import collect_table

    parts = ds.map_batches(local_kmins, batch_format="pyarrow")
    merged = collect_table(
        parts, empty=pa.table({"h": pa.array([], type=pa.int64())})
    )
    h = np.unique(
        merged["h"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
    )[:k]
    if h.size < k:
        est = float(h.size)
        kth = int(h[-1]) if h.size else 0
    else:
        kth = int(h[-1])
        est = float(k - 1) / (float(kth) / _U64_SPAN)
    return pa.table(
        {
            "k": pa.array([int(h.size if h.size < k else k)], type=pa.int64()),
            "kth_hash": pa.array([kth], type=pa.uint64()),
            "n_distinct_est": pa.array([est], type=pa.float64()),
        }
    )


def grouped_quantiles(
    ds: rd.Dataset, group_col: str, col: str, qs: list[float]
) -> rd.Dataset:
    """Exact per-group quantiles → Dataset(group, q, value, exact) —
    per-language length percentiles for quality-threshold calibration
    and the like. Same semantics as :func:`quantiles`' exact path
    (value = min v whose cumulative count ≥ ceil(q·n), nulls excluded).

    Scale shape: ONE ``groupby((group, value)).count()`` reduces the
    corpus to per-group distinct histograms before anything moves wide,
    then a hash-partitioned per-group merge (vectorized sort + cumsum +
    searchsorted — a few rows out per group). Partitioning assumption:
    one group's DISTINCT-value histogram fits in a worker (true for
    bounded measures like lengths/scores; use :func:`quantiles`' binned
    guard pattern for unbounded ones)."""
    from pyppmd_ray.functions.relational import _streaming_map_groups

    sch = ds.schema()
    if sch is None or group_col not in sch.names:
        raise ValueError(
            f"grouped_quantiles requires a known schema containing {group_col!r}"
        )
    gtype = sch.types[sch.names.index(group_col)]
    counts = ds.groupby([group_col, col]).count()

    def merge(group: pa.Table):
        v = group[col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        c = group["count()"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = ~np.isnan(v)  # the null group arrives as NaN
        v, c = v[keep], c[keep]
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1]) if cum.size else 0
        out_q, out_v = [], []
        for q in qs:
            if n == 0:
                continue
            rank = max(1, min(int(np.ceil(q * n)), n))
            out_q.append(float(q))
            out_v.append(float(v[int(np.searchsorted(cum, rank, side="left"))]))
        gval = group[group_col][0].as_py()
        yield pa.table(
            {
                group_col: pa.array([gval] * len(out_q), type=group[group_col].type),
                "q": pa.array(out_q, type=pa.float64()),
                "value": pa.array(out_v, type=pa.float64()),
                "exact": pa.array([True] * len(out_q), type=pa.bool_()),
            }
        )

    empty = pa.table(
        {
            group_col: pa.array([], type=gtype),
            "q": pa.array([], type=pa.float64()),
            "value": pa.array([], type=pa.float64()),
            "exact": pa.array([], type=pa.bool_()),
        }
    )
    return _streaming_map_groups(counts, [group_col], merge, empty_table=empty)


def grouped_outliers(
    ds: rd.Dataset,
    group_col: str,
    col: str,
    id_col: str = "doc_id",
    k: float = 1.5,
) -> rd.Dataset:
    """Tukey-fence outliers per group: rows with ``col`` outside
    [q1 − k·IQR, q3 + k·IQR] of their group — Dataset(id, group, value).
    The robust (quantile-based, not mean/std) anomaly gate: mean/std
    oracles are float-sum-order-dependent across parallelism levels,
    while exact quantiles of integer measures make the fences
    bit-reproducible (whole-number quartiles, k·IQR exact in binary
    for k = 1.5).

    Composition: :func:`grouped_quantiles` (bounded histogram shuffle)
    → tiny 2-rows-per-group fence table collected once and broadcast →
    map-side filter. Nothing driver-side scales with the corpus."""
    import ray

    from pyppmd_ray.functions.broadcast import LazyBroadcast
    from pyppmd_ray.functions.collect import collect_table

    qtbl = collect_table(grouped_quantiles(ds, group_col, col, [0.25, 0.75]))
    fences: dict = {}
    for g, q, v in zip(
        qtbl[group_col].to_pylist(), qtbl["q"].to_pylist(), qtbl["value"].to_pylist()
    ):
        fences.setdefault(g, {})[q] = v
    bounds = {
        g: (d[0.25] - k * (d[0.75] - d[0.25]), d[0.75] + k * (d[0.75] - d[0.25]))
        for g, d in fences.items()
        if 0.25 in d and 0.75 in d
    }
    bcast = LazyBroadcast(ray.put(bounds))

    def flag(batch: pa.Table) -> pa.Table:
        sel = batch.select([id_col, group_col, col])
        if batch.num_rows == 0:
            return sel
        b = bcast.state
        v = batch[col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        d = batch[group_col].combine_chunks().dictionary_encode()
        # null-group rows get code 0 here but are masked out below
        # (a null index would otherwise become INT64_MIN and crash the
        # fancy index); like the SQL join, a null group never flags
        null_grp = np.asarray(pc.is_null(d.indices), dtype=bool)
        codes = np.asarray(
            pc.fill_null(d.indices, 0), dtype=np.int64
        )
        # fence lookup over the (small) per-batch group dictionary only
        fence = [b.get(g, (-np.inf, np.inf)) for g in d.dictionary.to_pylist()]
        if not fence:  # every row's group is null
            return sel.slice(0, 0)
        lo = np.array([f[0] for f in fence], dtype=np.float64)[codes]
        hi = np.array([f[1] for f in fence], dtype=np.float64)[codes]
        keep = ((v < lo) | (v > hi)) & ~null_grp
        return sel.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")


def profile_numeric(ds: rd.Dataset, columns: list[str]) -> pa.Table:
    """Per-column data-quality profile → one row per column:
    (column, n_rows, n_nulls, min, max) with min/max as float64.
    Per-batch partials; the driver merges num_blocks×len(columns) rows."""

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in columns:
            col = batch[c]
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            valid = pc.drop_null(col)
            if len(valid) == 0:
                mins.append(None)
                maxs.append(None)
            else:
                mm = pc.min_max(pc.cast(valid, pa.float64()))
                mins.append(mm["min"].as_py())
                maxs.append(mm["max"].as_py())
        return pa.table(
            {
                "column": pa.array(names, type=pa.string()),
                "n_rows": pa.array(ns, type=pa.int64()),
                "n_nulls": pa.array(nulls, type=pa.int64()),
                "vmin": pa.array(mins, type=pa.float64()),
                "vmax": pa.array(maxs, type=pa.float64()),
            }
        )

    from pyppmd_ray.functions.collect import collect_table

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow"),
        empty=pa.table(
            {
                "column": pa.array([], type=pa.string()),
                "n_rows": pa.array([], type=pa.int64()),
                "n_nulls": pa.array([], type=pa.int64()),
                "vmin": pa.array([], type=pa.float64()),
                "vmax": pa.array([], type=pa.float64()),
            }
        ),
    )
    out = {"column": [], "n_rows": [], "n_nulls": [], "vmin": [], "vmax": []}
    df_cols = parts["column"].to_pylist()
    for c in columns:
        mask = np.array([x == c for x in df_cols], dtype=bool)
        out["column"].append(c)
        out["n_rows"].append(int(np.asarray(parts["n_rows"])[mask].sum()))
        out["n_nulls"].append(int(np.asarray(parts["n_nulls"])[mask].sum()))
        mins = parts["vmin"].to_numpy(zero_copy_only=False)[mask]
        maxs = parts["vmax"].to_numpy(zero_copy_only=False)[mask]
        mins = mins[~np.isnan(mins.astype(np.float64))] if mins.size else mins
        maxs = maxs[~np.isnan(maxs.astype(np.float64))] if maxs.size else maxs
        out["vmin"].append(float(mins.min()) if mins.size else None)
        out["vmax"].append(float(maxs.max()) if maxs.size else None)
    return pa.table(
        {
            "column": pa.array(out["column"], type=pa.string()),
            "n_rows": pa.array(out["n_rows"], type=pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], type=pa.int64()),
            "vmin": pa.array(out["vmin"], type=pa.float64()),
            "vmax": pa.array(out["vmax"], type=pa.float64()),
        }
    )


# above this many distinct values the exact quantile path would
# concentrate the whole value histogram on the driver — switch to the
# bounded-bin approximation automatically
QUANTILE_DISTINCT_BUDGET = 2_000_000
QUANTILE_BINS = 1 << 16


def quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    *,
    distinct_budget: int = QUANTILE_DISTINCT_BUDGET,
    bins: int = QUANTILE_BINS,
) -> pa.Table:
    """Distributed quantiles via a value histogram: one
    ``groupby(col).count()`` (map-side combined, materialized in the
    object store), then

    - **exact path** (distinct ≤ ``distinct_budget``): the driver merges
      the DISTINCT-value histogram and picks the value at rank
      ceil(q·n) (1-indexed, ascending) — exact, not a sketch, and
      matching a SQL ``min(v) WHERE cum >= ceil(q*n)`` oracle
      bit-for-bit (identical IEEE multiply + ceil on both sides);
    - **bounded fallback** (distinct > budget, e.g. an unbounded
      continuous column): the distinct histogram is re-binned IN-CLUSTER
      into ``bins`` equal-width buckets over [min, max] (min/max from
      cheap streamed aggregates over the already-shuffled histogram),
      and the driver merges ≤ ``bins`` rows. The returned value is the
      LOWER EDGE of the bucket containing rank ceil(q·n) — a true value
      lower bound with absolute error ≤ (max−min)/bins per quantile;
      driver memory is O(bins) regardless of cardinality.

    Quantiles are over the NON-NULL values (nulls are excluded from both
    the histogram and n, matching SQL aggregate semantics).

    Returns (q, value, exact) rows — ``exact`` is True on the exact path
    and False on the binned fallback, so callers relying on bit-for-bit
    SQL-oracle parity can tell which guarantee they got."""
    counts = ds.groupby(col).count().materialize()
    n_distinct = counts.count()
    if n_distinct > distinct_budget:
        return _binned_quantiles(counts, col, qs, bins)
    from pyppmd_ray.functions.collect import collect_table

    tbl = collect_table(
        counts,
        empty=pa.table(
            {
                col: pa.array([], type=pa.float64()),
                "count()": pa.array([], type=pa.int64()),
            }
        ),
    )
    v = tbl[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
    c = tbl["count()"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    keep = ~np.isnan(v)  # the null group comes back as NaN
    v, c = v[keep], c[keep]
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if cum.size else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = int(np.ceil(q * n))
        rank = max(1, min(rank, n))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(float(v[idx]))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "value": pa.array(out_v, type=pa.float64()),
            # marks the exact path vs the binned lower-edge approximation
            # (callers relying on bit-for-bit SQL-oracle parity must check
            # this — above distinct_budget the values are lower bounds)
            "exact": pa.array([True] * len(out_q), type=pa.bool_()),
        }
    )


def _binned_quantiles(
    counts: rd.Dataset, col: str, qs: list[float], bins: int
) -> pa.Table:
    """Bounded-memory quantile fallback over a (value, count()) distinct
    histogram too large for the driver: equal-width re-binning in-cluster
    → driver merges ≤ ``bins`` (bin, count) rows. Value returned = lower
    bin edge (error ≤ (max−min)/bins)."""
    from ray.data.aggregate import Max, Min, Sum

    # min/max/n over the distinct histogram — streamed aggregates, the
    # driver sees three scalars (the null group's NaN key is excluded by
    # Arrow min/max semantics; its count is excluded explicitly below)
    lohi = counts.aggregate(
        Min(col, alias_name="lo"), Max(col, alias_name="hi")
    )
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / bins if hi > lo else 1.0

    def to_bins(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["count()"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isnan(v)
        v, c = v[keep], c[keep]
        b = np.minimum(((v - lo) / width).astype(np.int64), bins - 1)
        ub, inv = np.unique(b, return_inverse=True)
        cc = np.zeros(ub.size, dtype=np.int64)
        np.add.at(cc, inv, c)
        return pa.table(
            {"bin": pa.array(ub, type=pa.int64()), "c": pa.array(cc, type=pa.int64())}
        )

    binned = (
        counts.map_batches(to_bins, batch_format="pyarrow")
        .groupby("bin")
        .sum("c")
    )
    tbl = pa.concat_tables(
        binned.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    b = tbl["bin"].combine_chunks().to_numpy(zero_copy_only=False)
    c = tbl["sum(c)"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(b)
    b, c = b[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if cum.size else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = max(1, min(int(np.ceil(q * n)), n))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(lo + float(b[idx]) * width)
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "value": pa.array(out_v, type=pa.float64()),
            "exact": pa.array([False] * len(out_q), type=pa.bool_()),
        }
    )
