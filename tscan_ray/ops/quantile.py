"""Exact distributed quantiles (discrete / SQL PERCENTILE_DISC).

Plan: ``Dataset.sort`` (Ray's range-partitioned distributed sort — the
only all-to-all this operator pays), then SELECT the k-th elements
WITHOUT materializing the sorted dataset: the driver walks the sorted
blocks' metadata (row counts only), locates the block holding each
target index, and ``ray.get``s just those blocks.  For Q quantiles at
most Q blocks leave the object store, however large the input.

Index convention matches DuckDB/SQL ``quantile_disc``: the element at
``max(0, ceil(q*n) - 1)`` of the ascending order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray


def quantiles_disc(ds, col: str, qs: list[float]) -> pa.Table:
    """Return a small Arrow table (q, {col}) of exact discrete quantiles."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(q)
    import pyarrow.compute as pc

    def drop_nulls(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(col)))

    # SQL quantile_disc ignores NULLs: n and the target indices are over
    # non-null values only
    sorted_ds = (ds.select_columns([col])
                 .map_batches(drop_nulls, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .sort(col))

    block_refs: list = []
    counts: list[int] = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            block_refs.append(block_ref)
            counts.append(meta.num_rows or 0)
    n = int(sum(counts))
    if n == 0:
        return pa.table({"q": pa.array(qs, type=pa.float64()),
                         col: pa.nulls(len(qs), type=pa.float64())})

    targets = [max(0, math.ceil(q * n) - 1) for q in qs]
    starts = np.concatenate([[0], np.cumsum(counts)])
    out_vals = {}
    # fetch each needed block once, even when several quantiles hit it
    needed: dict[int, list[tuple[int, int]]] = {}
    for q, t in zip(qs, targets):
        b = int(np.searchsorted(starts, t, side="right") - 1)
        needed.setdefault(b, []).append((t - int(starts[b]), qs.index(q)))
    fetched = {b: ray.get(block_refs[b]) for b in needed}
    vals: list = [None] * len(qs)
    for b, hits in needed.items():
        block = fetched[b]
        if isinstance(block, pa.Table):
            column = block.column(col)
            for local_idx, qi in hits:
                vals[qi] = column[local_idx].as_py()
        else:  # pandas block: positional access (labels survive the sort)
            column = block[col]
            for local_idx, qi in hits:
                vals[qi] = column.iloc[local_idx]
    return pa.table({"q": pa.array(qs, type=pa.float64()),
                     col: pa.array(vals)})
