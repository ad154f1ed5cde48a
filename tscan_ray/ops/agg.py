"""Two-phase (partial/combiner) aggregation.

The scale-critical groupby pattern: combine inside ``map_batches``
FIRST so the all-to-all exchange moves one row per (key, batch) instead
of one row per input row, then a small ``groupby`` reduces the partials.
For sum/count/min/max/mean this is exact (commutative-associative
merge); the reference's structStats::merge has the same algebra
(src/structstats.cxx:1374-1695).

Skew handling: the partial phase already collapses hot keys inside each
batch, which is what salting achieves for pure aggregation — a key with
10^9 rows reaches the exchange as (num_batches) partial rows.  An
explicit salt is only needed when the partial rows of ONE key still
overwhelm a single reducer (billions of batches); ``salt > 0`` switches
to a two-tier reduce — fold per (key, content-salt) on a composite
exchange key, then a tiny final fold per key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def groupby_sum_2phase(
    ds,
    keys: list[str],
    value_cols: list[str],
    count_alias: str = "n",
    salt: int = 0,
):
    """sum(value_cols) + count(*) per ``keys`` with batch-side partials.

    Returns one row per key combination, columns ``sum_{col}`` and
    ``count_alias``.  With ``salt > 0`` an extra deterministic salt column
    widens the exchange key for a hot first key; the per-bucket fold
    removes it (same result, more parallel reducers).

    The reduction runs on the parallel task exchange (ops/keyed.py),
    keyed on ``keys[0]`` — all partials of one key combination land in
    one bucket, so the in-bucket pandas groupby completes every group.
    """
    from tscan_ray.ops.keyed import grouped_apply

    sum_names = [f"sum_{c}" for c in value_cols]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        out = g[value_cols].sum().reset_index()
        out.columns = keys + sum_names
        out[count_alias] = g.size().to_numpy()
        if salt > 0:
            # content-derived salt VARIES across a key's partials (the
            # partial sums differ batch to batch), so the composite
            # exchange key below spreads one hot key over up to ``salt``
            # reducers; deterministic, so retries re-produce the plan
            from tscan_ray.ops.keyed import _KNUTH

            kh = pd.util.hash_pandas_object(out[keys[0]], index=False).to_numpy()
            ch = pd.util.hash_pandas_object(out[sum_names[0]], index=False).to_numpy()
            out["__salt__"] = (ch % np.uint64(salt)).astype(np.int64)
            out["__skey__"] = (
                (kh ^ (out["__salt__"].to_numpy().astype(np.uint64) * _KNUTH))
                >> np.uint64(1)
            ).astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        drop = [c for c in ("__salt__", "__skey__") if c in df.columns]
        gcols = keys + [c for c in ("__salt__",) if c in df.columns]
        if df.empty:
            return df.drop(columns=drop)
        out = (df.groupby(gcols, sort=False, dropna=False)
               [sum_names + [count_alias]].sum().reset_index())
        return out.drop(columns=[c for c in drop if c in out.columns])

    if salt > 0:
        # tier 1: fold per (key, salt) on the composite exchange key;
        # tier 2: the surviving rows are only keys x salt — a tiny final fold
        tier1 = grouped_apply(partials, "__skey__", fold, num_buckets=32)
        return grouped_apply(tier1, keys[0], fold, num_buckets=32)
    return grouped_apply(partials, keys[0], fold, num_buckets=32)


def groupby_mean_2phase(ds, keys: list[str], value_col: str, salt: int = 0):
    """mean(value_col) per keys from (sum, count) partials — decomposable,
    unlike feeding rows straight to a Mean over the wire."""
    import pyarrow as pa
    import pyarrow.compute as pc

    reduced = groupby_sum_2phase(ds, keys, [value_col], salt=salt)

    def finalize(batch: pa.Table) -> pa.Table:
        mean = pc.divide(
            pc.cast(batch.column(f"sum_{value_col}"), pa.float64()),
            pc.cast(batch.column("n"), pa.float64()),
        )
        return batch.append_column(f"mean_{value_col}", mean)

    return reduced.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(
    ds,
    key: str,
    pivot_col: str,
    values: list[str],
    num_buckets: int | None = None,
):
    """Pivot/crosstab: one row per key with a ``n_{value}`` count column
    per listed pivot value (unlisted values are ignored — the column set
    must be declared up front, as in SQL ``COUNT(*) FILTER``).

    Same 2-phase shape as :func:`groupby_sum_2phase`: the per-batch
    partial collapses to (keys-in-batch × len(values)) cells before the
    exchange, so a hot key ships one partial row per batch regardless of
    its row count.
    """
    from tscan_ray.config import DEFAULT_CONFIG
    from tscan_ray.ops.keyed import grouped_apply

    if num_buckets is None:
        num_buckets = DEFAULT_CONFIG.num_key_buckets
    cols = [f"n_{v}" for v in values]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key]
        out = {}
        for v, c in zip(values, cols):
            # dropna=False: SQL GROUP BY keeps a NULL-key group
            out[c] = (df[pivot_col] == v).groupby(keys, sort=False,
                                                  dropna=False).sum()
        res = pd.DataFrame(out).reset_index()
        return res

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, sort=False, dropna=False)[cols].sum().reset_index()
        for c in cols:
            out[c] = out[c].astype("int64")
        return out

    return grouped_apply(ds.map_batches(partial, batch_format="pandas"),
                         key, fold, num_buckets)


def groupby_stats_robust(
    ds,
    key: str,
    value_col: str,
    ts_col: str | None = None,
    num_buckets: int | None = None,
):
    """Per-key robust statistics: median, MAD (median absolute
    deviation, unscaled), and — when ``ts_col`` is given — the Pearson
    correlation of ``value_col`` against the event time.

    Median/MAD are holistic (not decomposable into partials), so unlike
    :func:`groupby_sum_2phase` the raw rows must co-locate: one keyed
    exchange, then vectorized pandas groupby medians inside the bucket.
    The correlation centers both series per key before the products —
    epoch-microsecond magnitudes would otherwise cancel catastrophically
    in float64.
    """
    from tscan_ray.config import DEFAULT_CONFIG
    from tscan_ray.ops.keyed import grouped_apply

    if num_buckets is None:
        num_buckets = DEFAULT_CONFIG.num_key_buckets

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False throughout: SQL GROUP BY keeps a NULL-key group
        g = df.groupby(key, sort=False, dropna=False)
        med = g[value_col].median()
        dev = (df[value_col] - df[key].map(med)).abs()
        mad = dev.groupby(df[key], sort=False, dropna=False).median()
        out = pd.DataFrame({key: med.index,
                            "med_value": med.to_numpy(),
                            "mad_value": mad.reindex(med.index).to_numpy()})
        if ts_col is not None:
            from tscan_ray.ops.window import _ts_us

            t = df[ts_col]
            if not np.issubdtype(getattr(t.dtype, "type", object), np.floating):
                t = _ts_us(t)  # tz-aware/naive timestamps or int micros
            t = t.astype("float64")
            cx = df[value_col] - df[key].map(g[value_col].mean())
            ty = t.groupby(df[key], sort=False, dropna=False).transform("mean")
            cy = t - ty
            sxy = (cx * cy).groupby(df[key], sort=False, dropna=False).sum()
            sxx = (cx * cx).groupby(df[key], sort=False, dropna=False).sum()
            syy = (cy * cy).groupby(df[key], sort=False, dropna=False).sum()
            with np.errstate(invalid="ignore", divide="ignore"):
                corr = sxy / np.sqrt(sxx * syy)
            out["corr_ts"] = corr.reindex(med.index).to_numpy()
        return out

    return grouped_apply(ds, key, fn, num_buckets)
