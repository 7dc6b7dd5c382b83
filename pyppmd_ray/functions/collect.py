"""Driver-side collect of a SMALL dataset into one Arrow table.

Every operator that merges bounded per-block partials on the driver
(top-k candidates, KMV sketches, k-means partial sums, ...) funnels
through :func:`collect_table` — an EMPTY Dataset yields ZERO batches
from ``iter_batches``, not one empty batch, so a bare
``pa.concat_tables(...)`` raises ``ArrowInvalid`` before any work runs.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def collect_table(ds: rd.Dataset, empty: pa.Table | None = None) -> pa.Table:
    """Concatenate all blocks of a small dataset into one pyarrow Table.

    When the dataset yields no batches, returns ``empty`` if given,
    else a typed empty table derived from the dataset schema (or a
    zero-column table when no schema is known).
    """
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    if empty is not None:
        return empty
    sch = ds.schema()
    if sch is None:
        return pa.table({})
    return pa.table(
        {n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)}
    )
