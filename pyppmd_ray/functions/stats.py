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

    parts = ds.map_batches(local_kmins, batch_format="pyarrow")
    merged = pa.concat_tables(
        parts.iter_batches(batch_size=None, batch_format="pyarrow")
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

    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    out = {"column": [], "n_rows": [], "n_nulls": [], "vmin": [], "vmax": []}
    df_cols = parts["column"].to_pylist()
    for c in columns:
        mask = np.array([x == c for x in df_cols])
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


def quantiles(ds: rd.Dataset, col: str, qs: list[float]) -> pa.Table:
    """Exact distributed quantiles via a value histogram: one
    ``groupby(col).count()`` (map-side combined), then the driver merges
    only the DISTINCT-value histogram and picks the value at rank
    ceil(q·n) (1-indexed, ascending). Exact — not a sketch — whenever the
    column's distinct-value count fits the driver (discrete measures,
    ids, prices in cents...); for unbounded continuous columns use
    :func:`kmv_distinct`-style sketching instead.

    Quantiles are over the NON-NULL values (nulls are excluded from both
    the histogram and n, matching SQL aggregate semantics).

    Returns (q, value) float64 rows, matching a SQL
    ``min(v) WHERE cum >= ceil(q*n)`` oracle bit-for-bit (identical IEEE
    multiply + ceil on both sides)."""
    counts = ds.groupby(col).count()
    tbl = pa.concat_tables(
        counts.iter_batches(batch_size=None, batch_format="pyarrow")
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
        }
    )
