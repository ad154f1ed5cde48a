"""Keyed-bucket shuffle primitive for the point-in-time layer.

Every timeline operator (as-of join, lag/lead, ffill/bfill, sessionize)
needs "all rows of one entity together, sorted by ts".  The reference
has no such layer (it is document-at-a-time); the engine adds it per the
north rule, designed Ray-Data-native:

* add a deterministic ``__bucket__ = H(key) % B`` column in a vectorized
  ``map_batches`` (zero extra pass — fused by the streaming executor);
* ONE all-to-all exchange: ``groupby("__bucket__")``;
* per-bucket UDF receives the whole bucket as a pandas frame and applies
  a **vectorized multi-key** kernel (``df.groupby(key)...`` /
  ``pd.merge_asof``) — no per-entity Python loop, no per-entity
  map_groups call overhead.

Scale notes
-----------
* B (``num_buckets``) is chosen so one bucket fits a worker heap:
  ``B >= input_bytes / target_partition_bytes`` and >= cluster
  parallelism.  All timeline operators reuse the SAME key hash, so
  chained operators could share one exchange (future: keyed cache).
* Skew: a bucket holds whole entities, so a single pathologically hot
  entity bounds bucket size from below.  Timeline semantics cannot be
  salted across time; hot entities must be split by *time range* with
  window-sized overlap (documented in SURVEY.md §7.4) — not needed at
  current fixture skew.
* The hash is deterministic across processes (no PYTHONHASHSEED
  dependence): Knuth multiplicative for integer keys,
  ``pandas.util.hash_array`` (stable) for strings.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

BUCKET_COL = "__bucket__"
_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def bucket_of(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket assignment for a key array."""
    if np.issubdtype(values.dtype, np.integer):
        h = values.astype(np.uint64, copy=False) * _KNUTH
        return (h >> np.uint64(33)) % np.uint64(num_buckets)
    # strings / objects: pandas' stable siphash
    return pd.util.hash_array(np.asarray(values, dtype=object)) % num_buckets


def with_bucket(ds, key: str, num_buckets: int):
    """Append the ``__bucket__`` column (vectorized, zero-copy Arrow in)."""

    def add(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_numpy(zero_copy_only=False)
        b = bucket_of(vals, num_buckets).astype(np.int64)
        return batch.append_column(BUCKET_COL, pa.array(b, type=pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def grouped_apply(
    ds,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int,
):
    """Apply a vectorized multi-key kernel to each key-hash bucket.

    ``fn`` receives one bucket (all rows of every entity hashed to it) as
    a pandas DataFrame and must itself be vectorized across keys
    (``df.groupby(key)`` transforms, ``merge_asof``, ...).
    """

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        out = fn(df)
        if BUCKET_COL in out.columns:
            out = out.drop(columns=[BUCKET_COL])
        return out

    bucketed = with_bucket(ds, key, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(wrapper, batch_format="pandas")
