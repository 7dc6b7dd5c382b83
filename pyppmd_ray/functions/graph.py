"""Distributed connected components — the dedup-clustering operator:
near-dup PAIRS become CLUSTERS (each document labeled with the min doc id
of its component), so a curation pipeline can keep exactly one
representative per duplicate group.

Algorithm: iterative min-label propagation (the classic Pregel/hash-join
formulation). Per round: each node's label becomes min(own label,
neighbors' labels), implemented as ONE equi-join (edges ⋈ labels on the
neighbor end) + one groupby-min — both composed from this engine's own
operators (:func:`..relational.hash_join`, Ray `groupby`). Rounds needed
= component diameter (near-dup clusters are tiny; the loop stops as soon
as the global label sum stops changing — labels only ever decrease, so
sum-equality proves a fixpoint). Driver state per round: ONE integer.

Scale: the edge list is shuffled once per round on the neighbor key; no
driver materialization; labels are (node, int64) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def connected_components(
    pairs: rd.Dataset,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iters: int = 25,
    broadcast_max_edges: int = 5_000_000,
) -> rd.Dataset:
    """Pairs (undirected edges) → Dataset(node, cluster) where cluster is
    the minimum node id reachable from ``node``. Only nodes that appear
    in at least one pair are returned (isolated nodes keep their own id —
    join back with ``how='left'`` + coalesce at the call site).

    When the edge count is ≤ ``broadcast_max_edges`` (duplicate pairs are
    normally a sliver of a corpus), the per-round joins run in BROADCAST
    mode — map-only passes, no shuffle sort per round; above it they fall
    back to the hash-partitioned shuffle path."""
    from ray.data.aggregate import Min, Sum

    from .relational import hash_join

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[a_col].cast(pa.int64())
        b = batch[b_col].cast(pa.int64())
        an = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        bn = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        src = pa.concat_arrays([an, bn])
        dst = pa.concat_arrays([bn, an])
        return pa.table({"src": src, "dst": dst})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    bc = edges.count() <= broadcast_max_edges  # metadata read: edges is materialized

    def init_label(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["src"],
                "lbl": pc.min_element_wise(batch["src"], batch["dst"]),
            }
        )

    labels = (
        edges.map_batches(init_label, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lbl", alias_name="lbl"))
        .materialize()
    )

    def _label_sum(ds: rd.Dataset) -> int | None:
        # Ray returns None (or a null field) when aggregating an empty
        # dataset — the no-pairs case (a clean corpus) must not crash
        agg = ds.aggregate(Sum("lbl", alias_name="s"))
        if not agg or agg.get("s") is None:
            return None
        return int(agg["s"])

    prev_sum = _label_sum(labels)
    if prev_sum is None:  # no edges at all → no components to label
        # return a TYPED empty dataset — the raw empty one has no schema,
        # which crashes downstream joins (.schema() is None)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "lbl": pa.array([], type=pa.int64()),
                }
            )
        )

    def relabel(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "lbl": batch["lbl"]})

    def compress(batch: pa.Table) -> pa.Table:
        # label-of-label (path compression): null lbl_r ⇒ keep own label
        lr = pc.coalesce(batch["lbl_r"], batch["lbl"])
        return pa.table(
            {"node": batch["node"], "lbl": pc.min_element_wise(batch["lbl"], lr)}
        )

    for _ in range(max_iters):
        # neighbor labels travel the edge: join on the DST end, emit for SRC
        prop = hash_join(
            edges, labels, on="dst", right_on="node", how="inner",
            left_columns=["src"], broadcast=bc,
        )
        cand = prop.map_batches(relabel, batch_format="pyarrow")
        merged = (
            cand.union(labels)
            .groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .materialize()  # consumed twice by the self-join below
        )
        # path compression: lbl(n) ← min(lbl(n), lbl(lbl(n))) — halves the
        # remaining propagation distance, so rounds ≈ log2(diameter)
        comp = hash_join(
            merged, merged, on="lbl", right_on="node", how="left",
            left_columns=["node"], right_columns=["lbl"], broadcast=bc,
        )
        # comp schema: (lbl, node, lbl_r)
        labels = comp.map_batches(compress, batch_format="pyarrow").materialize()
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:  # labels only decrease ⇒ fixpoint reached
            break
        prev_sum = cur_sum
    return labels
