"""Deterministic sampling and distributed top-k — the small utility
operators the reference has no analogue for (SURVEY.md §2.6: "no sorts,
no sampling") but every corpus pipeline needs.

- :func:`hash_sample` — reproducible Bernoulli sample keyed on a column:
  keep iff sha256(key-as-string) prefix mod DENOM < rate*DENOM. A pure
  per-batch filter (no shuffle, no RNG state), identical across reruns
  and cluster sizes, and SQL-reproducible (the oracle computes the same
  sha256 prefix in DuckDB).
- :func:`topk` — global top-k WITHOUT a global sort: each block emits its
  local top-k (vectorized lexsort), the driver merges k×num_blocks rows.
  Deterministic total order: (by desc|asc, tie_by asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from pyppmd_ray.functions.hashing import sha256_prefix_u64

SAMPLE_DENOM = 1 << 32


def hash_sample(ds: rd.Dataset, rate: float, key_col: str) -> rd.Dataset:
    """Keep each row iff sha256(str(key)) % 2^32 < rate * 2^32 — a
    deterministic, rerun-stable, shuffle-free sample. Rows with equal
    keys are kept or dropped together (useful for doc-level sampling)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = np.uint64(int(rate * SAMPLE_DENOM))

    def keep(batch: pa.Table) -> pa.Table:
        h = sha256_prefix_u64(batch[key_col]) % np.uint64(SAMPLE_DENOM)
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def topk(
    ds: rd.Dataset,
    by: str,
    k: int,
    *,
    ascending: bool = False,
    tie_by: str | None = None,
) -> pa.Table:
    """Global top-k rows by ``by`` with deterministic ``tie_by`` ascending
    tie-break — per-block local top-k + a driver merge of k×num_blocks
    rows; the corpus is never sorted or materialized."""

    def sort_cols(batch: pa.Table):
        v = batch[by].combine_chunks().to_numpy(zero_copy_only=False)
        if ascending:
            key = v
        else:
            # descending WITHOUT negation: -v wraps for unsigned dtypes
            # and overflows for INT64_MIN; a dense rank flipped around its
            # max is order-equivalent and safe for every dtype
            _, inv = np.unique(v, return_inverse=True)
            key = inv.max() - inv if inv.size else inv
            if v.dtype.kind == "f":
                nan = np.isnan(v)
                if nan.any():  # NaN sorts last in either direction
                    key[nan] = inv.max() + 1
        if tie_by is not None:
            t = batch[tie_by].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((t, key))
        else:
            order = np.argsort(key, kind="stable")
        return order

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        order = sort_cols(batch)[:k]
        return batch.take(pa.array(order))

    from pyppmd_ray.functions.collect import collect_table

    cand = ds.map_batches(local_topk, batch_format="pyarrow")
    tbl = collect_table(cand)
    if tbl.num_rows == 0:
        return tbl
    order = sort_cols(tbl)[:k]
    return tbl.take(pa.array(order))


def grouped_topk(
    ds: rd.Dataset,
    group_col: str,
    by: str,
    k: int,
    *,
    ascending: bool = False,
    tie_by: str | None = None,
) -> rd.Dataset:
    """Top-k rows per group (e.g. the k best-quality docs per language)
    WITHOUT ranking the full corpus: each batch first reduces to its own
    per-group top-k (vectorized argsort — at most k×groups rows leave
    the batch), then one ``groupby(group).map_groups`` takes the global
    per-group top-k. Shuffle volume is k×groups×blocks rows, never the
    dataset. Deterministic total order: (by desc|asc, tie_by asc) —
    matching a SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...)``
    oracle exactly when ``tie_by`` is a unique key."""

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch[group_col].combine_chunks()
        codes = g.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        v = batch[by].combine_chunks().to_numpy(zero_copy_only=False)
        t = (
            batch[tie_by].combine_chunks().to_numpy(zero_copy_only=False)
            if tie_by is not None
            else np.arange(batch.num_rows)
        )
        # rank value: dense rank of v, flipped for descending (safe for
        # unsigned/INT64_MIN — same discipline as topk())
        _, inv = np.unique(v, return_inverse=True)
        key = inv if ascending else (inv.max() - inv if inv.size else inv)
        if v.dtype.kind == "f" and inv.size:
            nan = np.isnan(v)
            if nan.any():  # NaN sorts last in either direction (np.unique
                # places NaN at the top rank, which the descending flip
                # would otherwise promote to rank 0 — same guard as topk)
                key = key.copy()
                key[nan] = inv.max() + 1
        order = np.lexsort((t, key, codes))  # group-major, then rank, tie
        codes_sorted = codes[order]
        # positions within each group run
        new_grp = np.concatenate(([True], codes_sorted[1:] != codes_sorted[:-1]))
        run_ids = np.cumsum(new_grp) - 1
        run_starts = np.flatnonzero(new_grp)
        pos_in_run = np.arange(order.size) - run_starts[run_ids]
        keep = order[pos_in_run < k]
        return batch.take(pa.array(np.sort(keep)))

    cand = ds.map_batches(local, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        return local(group)

    return cand.groupby(group_col).map_groups(final, batch_format="pyarrow")


def stratified_exact_k(
    ds: rd.Dataset,
    group_col: str,
    k: int,
    *,
    key_col: str = "doc_id",
) -> rd.Dataset:
    """EXACTLY ``k`` rows per group, chosen in deterministic
    sha256(key) order — the fixed-size per-stratum split (held-out eval
    sets, per-language calibration samples) that rate-based
    :func:`stratified_sample` cannot give (a rate yields a BINOMIAL
    count). Rerun-stable and cluster-size-independent: the "sample" is
    the k smallest hash values per group, i.e. :func:`grouped_topk`
    ascending on the hash — per-batch local k×groups reduction, one
    small groupby; the corpus is never sorted."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = sha256_prefix_u64(batch[key_col])
        return batch.append_column("__h", pa.array(h, type=pa.uint64()))

    picked = grouped_topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        group_col,
        "__h",
        k,
        ascending=True,
        tie_by=key_col,
    )
    return picked.map_batches(
        lambda b: b.drop_columns(["__h"]), batch_format="pyarrow"
    )


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    *,
    group_col: str = "lang",
    key_col: str = "doc_id",
) -> rd.Dataset:
    """Per-group Bernoulli rates (e.g. downsample dominant languages,
    upweight rare ones): keep a row iff sha256(str(key)) % 2^32 <
    rate[group] * 2^32. Same deterministic, shuffle-free, rerun-stable
    filter as :func:`hash_sample`, with the rate chosen by the row's
    group (groups absent from ``rates`` are dropped — rate 0)."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    cuts = {g: np.uint64(int(r * SAMPLE_DENOM)) for g, r in rates.items()}
    zero = np.uint64(0)

    def keep(batch: pa.Table) -> pa.Table:
        h = sha256_prefix_u64(batch[key_col]) % np.uint64(SAMPLE_DENOM)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        # rate lookup once per DISTINCT group value, then one gather
        # (null groups get rate 0 — same as the absent-from-rates case)
        d = g.dictionary_encode()
        codes = (
            pc.fill_null(d.indices, -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lut = np.array(
            [cuts.get(v.as_py(), zero) for v in d.dictionary], dtype=np.uint64
        )
        cut = (
            np.where(codes >= 0, lut[np.maximum(codes, 0)], zero)
            if len(lut)
            else np.zeros(len(g), dtype=np.uint64)
        )
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow")
