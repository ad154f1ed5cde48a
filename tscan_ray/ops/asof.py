"""Point-in-time (as-of) join — the engine's flagship relational operator.

For each left row (key, ts), find the latest right row of the same key
with ``ts_r <= ts`` (backward direction; ``allow_exact_matches`` keeps
the <= inclusive, which is the leakage-safe convention: a feature known
AT ts is usable AT ts).  Optional tolerance bounds the lookback.

Ray-Data-native design (north rule; no counterpart in the reference —
its only joins are broadcast lexicon lookups, SURVEY.md §2.5):

1. sides are tagged and schema-aligned (missing columns -> nulls), then
   ``union``-ed — Ray's streaming executor interleaves both scans;
2. ONE keyed task-shuffle exchange (ops/keyed.py) co-locates each key's
   left and right rows;
3. inside the bucket UDF: split by side, sort each frame by (ts,
   order_col), ``pd.merge_asof(by=key)`` — a sorted-merge with
   binary-search galloping over contiguous numpy arrays, vectorized
   across all keys in the bucket.

Determinism: right-side duplicates on (key, ts) are reduced to the row
with the greatest ``order_col`` (latest-writer-wins) so the match is
unique under retries; ties on the left are preserved as independent rows.

Scale notes: the exchange moves each row exactly once; bucket count is
sized via ops/keyed.py.  If one side is tiny, prefer a broadcast lookup
(ray.put + searchsorted in map_batches) instead of this shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tscan_ray.config import DEFAULT_CONFIG
from tscan_ray.ops.keyed import grouped_apply

_SIDE = "__side__"


def asof_join(
    left,
    right,
    key: str,
    ts: str,
    right_value_cols: list[str],
    order_col: str | None = None,
    tolerance_us: int | None = None,
    right_suffix: str = "_r",
    how: str = "left",
    direction: str = "backward",
    num_buckets: int = DEFAULT_CONFIG.num_key_buckets,
):
    """As-of join two Datasets on (key, ts).

    Returns the left schema + ``{ts}{right_suffix}`` (matched right
    timestamp) + each right value column renamed ``{col}{right_suffix}``.
    ``how='inner'`` drops left rows with no match.

    ``direction``: ``backward`` (default; latest right ts_r <= ts — the
    leakage-safe convention), ``forward`` (earliest ts_r >= ts — a
    declared forward-looking join, e.g. label attachment), ``nearest``
    (closest |ts_r - ts|; ties prefer the backward/prior row, matching
    pandas).  Same single-exchange plan for all three.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    right_keep = [key, ts] + ([order_col] if order_col and order_col not in (key, ts) else [])
    right_keep += [c for c in right_value_cols if c not in right_keep]

    right = right.select_columns(right_keep)

    # align schemas for union: every column of both sides, missing -> null
    right_schema = right.schema()
    from tscan_ray.ops.keyed import as_arrow_type

    all_cols: dict[str, pa.DataType] = {
        n: as_arrow_type(t)
        for n, t in zip(left_schema.names, left_schema.types)}
    # normalized right column names inside the exchange (avoid collisions)
    r_rename = {
        name: ("__r_" + name if name in left_cols and name not in (key, ts) else name)
        for name in right_schema.names
    }
    for name, typ in zip(right_schema.names, right_schema.types):
        all_cols.setdefault(r_rename[name], as_arrow_type(typ))

    union_names = list(all_cols.keys()) + [_SIDE]

    def pad(side: int, rename: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            present = {rename.get(name, name): batch.column(name) for name in batch.column_names}
            for name in union_names:
                if name == _SIDE:
                    cols[name] = pa.array(np.full(n, side, dtype=np.int8))
                elif name in present:
                    cols[name] = present[name]
                else:
                    cols[name] = pa.nulls(n, type=all_cols[name])
            return pa.table(cols)

        return fn

    l_p = left.map_batches(pad(0, {}), batch_format="pyarrow", zero_copy_batch=True)
    r_p = right.map_batches(pad(1, r_rename), batch_format="pyarrow", zero_copy_batch=True)
    both = l_p.union(r_p)

    rv_cols = [r_rename.get(c, c) for c in right_value_cols]
    out_rename = {c: right_value_cols[i] + right_suffix for i, c in enumerate(rv_cols)}
    sort_extra = [order_col] if order_col else []
    # the side-tagged union null-pads left columns on right rows, degrading
    # int columns to float64 in pandas — restore the left schema's dtypes
    from tscan_ray.ops.keyed import schema_pandas_dtypes

    l_dtypes = schema_pandas_dtypes(left_schema)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df[_SIDE] == 0][left_cols].copy()
        for c in left_cols:
            if c in l_dtypes.index and ldf[c].dtype != l_dtypes[c]:
                ldf[c] = ldf[c].astype(l_dtypes[c])
        rcols = list(dict.fromkeys([key, ts] + rv_cols + sort_extra))
        rdf = df[df[_SIDE] == 1][rcols].copy()
        # deterministic dedup of right rows on (key, ts): latest order wins
        rdf = rdf.sort_values([key, ts] + sort_extra, kind="mergesort")
        rdf = rdf.drop_duplicates([key, ts], keep="last")
        if order_col and order_col in rdf.columns and order_col not in (key, ts):
            rdf = rdf.drop(columns=[order_col])
        rdf = rdf.rename(columns={ts: ts + right_suffix, **out_rename})
        ldf = ldf.sort_values([ts] + [c for c in sort_extra if c in ldf.columns],
                              kind="mergesort")
        rdf = rdf.sort_values(ts + right_suffix, kind="mergesort")
        kwargs = {}
        if tolerance_us is not None:
            tol = tolerance_us
            if np.issubdtype(ldf[ts].dtype, np.datetime64):
                tol = pd.Timedelta(microseconds=tolerance_us)
            kwargs["tolerance"] = tol
        out = pd.merge_asof(
            ldf,
            rdf,
            left_on=ts,
            right_on=ts + right_suffix,
            by=key,
            direction=direction,
            allow_exact_matches=True,
            **kwargs,
        )
        if how == "inner":
            out = out[out[ts + right_suffix].notna()]
        return out

    return grouped_apply(both, key, merge, num_buckets)


def interval_join(
    left,
    right,
    key: str,
    ts: str,
    start_col: str,
    end_col: str,
    right_value_cols: list[str],
    how: str = "inner",
    num_buckets: int = DEFAULT_CONFIG.num_key_buckets,
):
    """Range (interval-containment) join: match each left point row
    (key, ts) to the right interval row of the same key with
    ``start_col <= ts <= end_col`` (inclusive both ends).

    PARTITIONING ASSUMPTION (documented per the custom-operator rule):
    intervals must be NON-OVERLAPPING per key — true by construction for
    sessionization output (ops/window.session_stats), the intended
    producer.  Under that assumption the latest interval starting at or
    before ts is the unique candidate, so the join reduces to ONE
    ``merge_asof`` backward gallop on ``start_col`` followed by a
    vectorized ``end_col >= ts`` filter — same one-exchange,
    sorted-merge plan as :func:`asof_join` (no per-key cartesian
    product).  For overlapping-but-bounded intervals, run k passes with
    the top-k starts; for unbounded overlap use a tree join (out of
    scope here).

    Output: left schema + start/end + each right value column.
    ``how='left'`` keeps unmatched left rows with nulls.
    """
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    right_keep = list(dict.fromkeys([key, start_col, end_col] + right_value_cols))
    right = right.select_columns(right_keep)
    right_schema = right.schema()

    from tscan_ray.ops.keyed import as_arrow_type

    all_cols: dict[str, pa.DataType] = {
        n: as_arrow_type(t)
        for n, t in zip(left_schema.names, left_schema.types)}
    r_rename = {
        name: ("__r_" + name if name in left_cols and name != key else name)
        for name in right_schema.names
    }
    for name, typ in zip(right_schema.names, right_schema.types):
        all_cols.setdefault(r_rename[name], as_arrow_type(typ))
    union_names = list(all_cols.keys()) + [_SIDE]

    def pad(side: int, rename: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            present = {rename.get(name, name): batch.column(name)
                       for name in batch.column_names}
            cols = {}
            for name in union_names:
                if name == _SIDE:
                    cols[name] = pa.array(np.full(n, side, dtype=np.int8))
                elif name in present:
                    cols[name] = present[name]
                else:
                    cols[name] = pa.nulls(n, type=all_cols[name])
            return pa.table(cols)

        return fn

    l_p = left.map_batches(pad(0, {}), batch_format="pyarrow", zero_copy_batch=True)
    r_p = right.map_batches(pad(1, r_rename), batch_format="pyarrow", zero_copy_batch=True)
    both = l_p.union(r_p)

    s_c, e_c = r_rename[start_col], r_rename[end_col]
    rv_cols = [r_rename[c] for c in right_value_cols]
    out_rename = {s_c: start_col, e_c: end_col,
                  **{rc: right_value_cols[i] for i, rc in enumerate(rv_cols)}}

    # side-tagged union null-pads each side's columns on the other side's
    # rows, degrading int columns to float64 in pandas; restore original
    # dtypes (right ones only on the fully-matched inner-join output)
    from tscan_ray.ops.keyed import schema_pandas_dtypes

    r_dtypes = schema_pandas_dtypes(right_schema)
    l_dtypes = schema_pandas_dtypes(left_schema)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df[_SIDE] == 0][left_cols].copy()
        for c in left_cols:
            if c in l_dtypes.index and ldf[c].dtype != l_dtypes[c]:
                ldf[c] = ldf[c].astype(l_dtypes[c])
        rdf = df[df[_SIDE] == 1][list(dict.fromkeys([key, s_c, e_c] + rv_cols))].copy()
        for c in rdf.columns:
            orig = out_rename.get(c, c)
            if orig in r_dtypes.index and rdf[c].dtype != r_dtypes[orig]:
                rdf[c] = rdf[c].astype(r_dtypes[orig])
        ldf = ldf.sort_values(ts, kind="mergesort")
        rdf = rdf.sort_values(s_c, kind="mergesort")
        out = pd.merge_asof(ldf, rdf, left_on=ts, right_on=s_c, by=key,
                            direction="backward", allow_exact_matches=True)
        matched = out[e_c].notna() & (out[ts] <= out[e_c])
        if how == "inner":
            out = out[matched]
        else:
            unmatched_cols = [s_c, e_c] + rv_cols
            out.loc[~matched, unmatched_cols] = None
        out = out.rename(columns=out_rename)
        if how == "inner":
            for internal, orig in out_rename.items():
                if orig in r_dtypes.index:
                    out[orig] = out[orig].astype(r_dtypes[orig])
        return out

    return grouped_apply(both, key, merge, num_buckets)
