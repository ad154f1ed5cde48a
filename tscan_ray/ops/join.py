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
    # fail loudly if a big side was mis-passed as the broadcast side —
    # silently ray.put-ing it would OOM the driver/object store instead.
    # deep=True so string payload bytes count (deep=False sees only the
    # 8-byte object pointers); estimated from a row sample to stay cheap.
    n_rows = len(rdf)
    if n_rows <= 100_000:
        approx_bytes = int(rdf.memory_usage(index=False, deep=True).sum())
    else:
        k = 100_000
        sample_bytes = int(
            rdf.iloc[:k].memory_usage(index=False, deep=True).sum())
        approx_bytes = int(sample_bytes * (n_rows / k))
    if approx_bytes > 2 << 30:
        raise ValueError(
            f"broadcast side is ~{approx_bytes >> 20} MiB; broadcast_join "
            "expects a dimension-sized right side — use exchange_join")
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

    from tscan_ray.config import DEFAULT_CONFIG
    from tscan_ray.ops.asof import _split_sides, _tag_union
    from tscan_ray.ops.keyed import grouped_apply

    if how not in ("inner", "left"):
        raise ValueError(how)
    if num_buckets is None:
        num_buckets = DEFAULT_CONFIG.num_key_buckets

    left_schema = left.schema()
    left_cols = list(left_schema.names)
    right = right.select_columns(
        [on] + [c for c in right_cols if c != on])
    right_schema = right.schema()
    r_rename = {n: ("__r_" + n if n in left_cols and n != on else n)
                for n in right_schema.names}
    both, union_schema = _tag_union(left, right, left_schema,
                                    right_schema, r_rename)

    out_rename = {r_rename[c]: c for c in right_cols if c != on}
    rcols = [on] + list(out_rename.keys())

    def merge(tbl) -> pd.DataFrame:
        # Arrow-side split: each side converts only its own columns, so
        # padding nulls never degrade int64 (>2^53-safe, e.g. phash ids)
        ldf, rdf = _split_sides(tbl, left_cols, rcols, union_schema)
        if how == "left":
            # unmatched left rows would degrade int payload columns to
            # float64; nullable Int64 keeps them exact alongside NAs
            from tscan_ray.ops.asof import nullable_int_dtype

            for c in rdf.columns:
                if c != on and np.issubdtype(rdf[c].dtype, np.integer):
                    rdf[c] = rdf[c].astype(nullable_int_dtype(rdf[c].dtype))
        return ldf.merge(rdf.rename(columns=out_rename), on=on, how=how)

    return grouped_apply(both, on, merge, num_buckets,
                         batch_format="pyarrow")
