"""Broadcast (small-side) hash join.

The reference's only joins are broadcast lexicon lookups frozen into
process memory (SURVEY.md §2.5).  This operator is the dataset-level
generalization: the small side is materialized ONCE, put in the Ray
object store, and fetched once per actor — the big side streams through
``map_batches`` with a vectorized pandas merge per batch.  No all-to-all
exchange: at 100 TB this is the correct plan whenever one side fits in
worker memory (lexicons, dimension tables); use a keyed-bucket shuffle
(ops/keyed.py) only when both sides are large.
"""

from __future__ import annotations

import pandas as pd

import ray


class _BroadcastMerge:
    """Actor-pool UDF: fetch the broadcast table once per actor."""

    def __init__(self, right_ref, on: str, how: str):
        self.right = ray.get(right_ref)  # zero-copy read of the shared copy
        self.on = on
        self.how = how
        if how in ("semi", "anti"):
            # membership probe, not a merge: no value columns attach and
            # duplicate right keys never multiply rows
            self.keys = self.right[on].unique()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.how == "semi":
            return batch[batch[self.on].isin(self.keys)]
        if self.how == "anti":
            return batch[~batch[self.on].isin(self.keys)]
        return batch.merge(self.right, on=self.on, how=self.how)


def broadcast_join(
    left,
    right,
    on: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
    concurrency=None,
    batch_size: int = 16384,
):
    """Join ``left`` (large, streaming) with ``right`` (small) on ``on``.

    ``right`` may be a Ray Dataset (materialized here — caller guarantees
    it is the small side) or a pandas DataFrame.  ``how`` in
    {"inner", "left", "semi", "anti"}.  For inner/left, right-side
    duplicate keys multiply rows exactly like a SQL join; semi/anti are
    membership filters (EXISTS / NOT EXISTS) — only the key set is
    broadcast, no value columns attach, no row multiplication.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(how)
    if how in ("semi", "anti"):
        right_cols = [on]  # only the key set crosses the wire
    if concurrency is None:
        # autoscaling (min=1) so chained joins can share a small session
        # without deadlocking on actor placement; the max adapts to the
        # session's CPUs
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(1, min(8, cpus - 1)))
    if isinstance(right, pd.DataFrame):
        rdf = right
    else:
        if right_cols is not None:
            right = right.select_columns(
                [on] + [c for c in right_cols if c != on]
            )
        rdf = right.to_pandas()
    ref = ray.put(rdf)
    return left.map_batches(
        _BroadcastMerge,
        fn_constructor_kwargs={"right_ref": ref, "on": on, "how": how},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def exchange_join(
    left,
    right,
    on: str,
    right_cols: list[str],
    how: str = "inner",
    num_buckets: int | None = None,
):
    """Large×large equi-join: when NEITHER side fits in worker memory,
    broadcast is off the table — both sides go through ONE keyed
    task-shuffle exchange (ops/keyed.py) and each hash bucket merges its
    slice with a vectorized pandas merge.

    Same single-exchange, side-tagged-union plan as ops/asof.asof_join;
    each input row moves exactly once.  Skewed keys put whole key groups
    in one bucket — for a hot key whose rows exceed a worker, pre-split
    by salting the SMALLER side's duplicates (not implemented here;
    document the assumption at call sites).  Prefer broadcast_join
    whenever one side is dimension-sized.
    """
    import numpy as np
    import pyarrow as pa

    from tscan_ray.config import DEFAULT_CONFIG
    from tscan_ray.ops.keyed import grouped_apply

    if how not in ("inner", "left"):
        raise ValueError(how)
    if num_buckets is None:
        num_buckets = DEFAULT_CONFIG.num_key_buckets
    _side = "__side__"

    left_schema = left.schema()
    left_cols = list(left_schema.names)
    right = right.select_columns(
        [on] + [c for c in right_cols if c != on])
    right_schema = right.schema()
    r_rename = {n: ("__r_" + n if n in left_cols and n != on else n)
                for n in right_schema.names}

    from tscan_ray.ops.keyed import as_arrow_type

    all_cols = {n: as_arrow_type(t)
                for n, t in zip(left_schema.names, left_schema.types)}
    for n, t in zip(right_schema.names, right_schema.types):
        all_cols.setdefault(r_rename[n], as_arrow_type(t))
    union_names = list(all_cols.keys()) + [_side]

    def pad(side, rename):
        def fn(batch: pa.Table) -> pa.Table:
            nrows = batch.num_rows
            present = {rename.get(n, n): batch.column(n)
                       for n in batch.column_names}
            cols = {}
            for n in union_names:
                if n == _side:
                    cols[n] = pa.array(np.full(nrows, side, dtype=np.int8))
                elif n in present:
                    cols[n] = present[n]
                else:
                    cols[n] = pa.nulls(nrows, type=all_cols[n])
            return pa.table(cols)

        return fn

    both = left.map_batches(pad(0, {}), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(pad(1, r_rename), batch_format="pyarrow",
                          zero_copy_batch=True))

    from tscan_ray.ops.keyed import schema_pandas_dtypes

    out_rename = {r_rename[c]: c for c in right_cols if c != on}
    l_dtypes = schema_pandas_dtypes(left_schema)
    r_dtypes = schema_pandas_dtypes(right_schema)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df[_side] == 0][left_cols].copy()
        for c in left_cols:
            if c in l_dtypes.index and ldf[c].dtype != l_dtypes[c]:
                ldf[c] = ldf[c].astype(l_dtypes[c])
        rcols = [on] + list(out_rename.keys())
        rdf = df[df[_side] == 1][rcols].copy()
        for c in rcols:
            orig = out_rename.get(c, c)
            if orig in r_dtypes.index and rdf[c].dtype != r_dtypes[orig]:
                rdf[c] = rdf[c].astype(r_dtypes[orig])
        out = ldf.merge(rdf.rename(columns=out_rename), on=on, how=how)
        return out

    return grouped_apply(both, on, merge, num_buckets)
