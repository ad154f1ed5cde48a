"""Keyed-bucket exchange primitive for the point-in-time layer.

Every timeline operator (as-of join, lag/lead, ffill/bfill, sessionize,
windowed diversity) needs "all rows of one entity together".  The
engine's exchange is a **two-stage task shuffle built from raw Ray
tasks** — the documented escape hatch for semantics/performance the
Dataset API can't deliver:

* measured on this Ray build (2.49), ``groupby().map_groups`` executes
  its SortMap/SortReduce as ONE task each (fully serial exchange), and
  the hash-shuffle strategy spawns per-partition aggregator actors that
  swamp a small node.  The task shuffle below is 4-8x faster on the
  same input (see BASELINE.md) and is the classic parallel plan:
  M split tasks (one per ~target-size input bundle, each partitioning
  its blocks by key hash into B slices) feeding B reduce tasks (concat
  + the user kernel), wired by object refs — every stage fully
  parallel, payload moved exactly once.
* ``grouped_apply(engine="raydata")`` keeps the Dataset-native
  ``groupby().map_groups`` plan for comparison / future Ray versions.

Scale notes
-----------
* B (``num_buckets``): sized so one bucket fits a worker heap
  (``>= input_bytes / target_partition_bytes``) and >= cluster
  parallelism.  Driver-side ref fan-out is M×B; split inputs are
  bundled to ``~64 MB`` so M stays ~input_bytes/64MB.  At 100 TB use a
  two-level exchange (node-local combine, then cross-node) — same
  algebra, one more tier.
* Skew: a bucket holds whole entities; hot entities must be split by
  time range with window-sized overlap (SURVEY.md §7.4) — pure
  aggregations instead pre-combine per batch (ops/agg.py).
* The hash is deterministic across processes (no PYTHONHASHSEED
  dependence): Knuth multiplicative for integer keys,
  ``pandas.util.hash_array`` for strings — retries re-produce identical
  partitions, which the resumable sink relies on.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

BUCKET_COL = "__bucket__"
_KNUTH = np.uint64(0x9E3779B97F4A7C15)
_TARGET_SPLIT_BYTES = 64 * 1024 * 1024



def _pandas_to_arrow(df) -> pa.Table:
    """pandas -> Arrow block.  The b'pandas' schema metadata is kept
    ONLY when an extension dtype (nullable Int64 etc.) needs it to
    round-trip exactly (int64 > 2^53 with NAs would otherwise come back
    float64); plain-numpy frames drop it — metadata-bearing pa.Schema
    is unhashable and floods Ray's block-schema dedup with warnings."""
    import pandas as _pd

    t = pa.Table.from_pandas(df, preserve_index=False)
    if not any(isinstance(dt, _pd.api.extensions.ExtensionDtype)
               for dt in df.dtypes):
        t = t.replace_schema_metadata(None)
    return t

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


def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return _pandas_to_arrow(block)


@ray.remote
def _split_task(key: str, num_buckets: int, direct: bool, *blocks):
    """Partition the input blocks by key hash into ``num_buckets`` slices
    (ONE stable sort + searchsorted per task — no per-bucket scan)."""
    tbl = pa.concat_tables([_as_arrow(b) for b in blocks], promote_options="default")
    if key not in tbl.column_names:  # schema-less empty blocks
        empty = tbl.slice(0, 0)
        return tuple(empty for _ in range(num_buckets))
    vals = tbl.column(key).to_numpy(zero_copy_only=False)
    if direct:
        b = np.asarray(vals, dtype=np.int64) % num_buckets
    else:
        b = bucket_of(vals, num_buckets).astype(np.int64)
    order = np.argsort(b, kind="stable")
    tbl = tbl.take(pa.array(order))
    bs = b[order]
    cuts = np.searchsorted(bs, np.arange(num_buckets + 1))
    return tuple(tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
                 for i in range(num_buckets))


@ray.remote
def _combine_task(num_buckets: int, *slices):
    """Intermediate combine tier of the two-level exchange: concatenate a
    GROUP of split tasks' per-bucket slices into one table per bucket.
    ``slices`` is laid out as [split0_b0..split0_bB, split1_b0..] —
    reduce tasks then fan in over ceil(M/group) refs instead of M.  On a
    multi-node cluster this tier is where node-local combining happens
    (schedule one combine per node over its local splits)."""
    n_splits = len(slices) // num_buckets
    out = []
    for b in range(num_buckets):
        out.append(pa.concat_tables(
            [slices[j * num_buckets + b] for j in range(n_splits)],
            promote_options="default"))
    return tuple(out)


@ray.remote
def _reduce_task(fn, batch_format: str, *parts):
    """Concat one bucket's slices and apply the user kernel."""
    # num_returns=1 delivers the split's 1-tuple un-unpacked
    parts = [p for part in parts
             for p in (part if isinstance(part, tuple) else (part,))]
    tbl = pa.concat_tables(parts, promote_options="default")
    if batch_format == "pandas":
        out = fn(tbl.to_pandas())
        if isinstance(out, pd.DataFrame):
            return _pandas_to_arrow(out)
        return out
    out = fn(tbl)
    if isinstance(out, pd.DataFrame):
        return _pandas_to_arrow(out)
    return out


# stats of the most recent task_exchange on this driver (introspection /
# tests): splits submitted, combines submitted, peak driver-held ref count
LAST_EXCHANGE_STATS: dict = {}


def task_exchange(
    ds,
    key: str,
    fn: Callable,
    num_buckets: int,
    direct: bool = False,
    batch_format: str = "pandas",
    combine_scheduling: Callable | None = None,
):
    """Two-stage parallel hash exchange + per-bucket kernel.

    ``direct=True`` treats the key column's integer values as the
    partition index (mod B) — used by the resumable sink so bucket K
    lands in partition K.  Returns a new Dataset of the kernel outputs.

    Streaming: split tasks are submitted as upstream blocks arrive
    (``iter_internal_ref_bundles`` is a generator over the running
    pipeline), and each COMBINE task is submitted the moment its group
    of splits is full — the driver then drops the group's B split refs,
    so driver-held refs stay bounded at ~(group + combines)×B instead
    of M×B, and combining overlaps the tail of the upstream scan.

    ``combine_scheduling``: optional ``group_index -> Ray scheduling
    strategy`` hook; on a multi-node cluster pass a
    ``NodeAffinitySchedulingStrategy`` factory so each combine runs on
    the node that produced its splits (node-local combine tier).
    """
    import ray.data as rd

    # two-level exchange: when many split tasks exist, a combine tier
    # concatenates groups of splits per bucket so each reduce fans in
    # over ceil(M/group) refs instead of M.  A combine task holds its
    # whole group in heap (group × split-bundle bytes), so the group
    # size is derived from a byte budget (TSCAN_RAY_COMBINE_BYTES,
    # default 512 MiB -> group of 8 at the 64 MiB split bundling);
    # TSCAN_RAY_EXCHANGE_GROUP overrides explicitly (0 disables).
    budget = int(os.environ.get("TSCAN_RAY_COMBINE_BYTES",
                                str(512 * 1024 * 1024)))
    default_group = max(2, budget // _TARGET_SPLIT_BYTES)
    group = int(os.environ.get("TSCAN_RAY_EXCHANGE_GROUP",
                               str(default_group)))
    use_combine = group > 0 and num_buckets > 1

    split_group: list = []   # split ref-tuples not yet combined
    combined: list = []      # combine ref-tuples (final reduce inputs)
    pending_refs: list = []  # raw block refs awaiting a split task
    pending_bytes = 0
    n_splits = n_combines = peak_refs = 0

    def live_refs() -> int:
        per = 1 if num_buckets == 1 else num_buckets
        return (len(pending_refs) + len(split_group) * per
                + len(combined) * per)

    def submit_combine():
        nonlocal n_combines
        opts: dict = {"num_returns": num_buckets}
        if combine_scheduling is not None:
            opts["scheduling_strategy"] = combine_scheduling(len(combined))
        flat = [r for split in split_group for r in split]
        combined.append(
            _combine_task.options(**opts).remote(num_buckets, *flat))
        split_group.clear()
        n_combines += 1

    def flush():
        nonlocal pending_refs, pending_bytes, n_splits, peak_refs
        if pending_refs:
            split_group.append(
                _split_task.options(num_returns=num_buckets).remote(
                    key, num_buckets, direct, *pending_refs
                )
            )
            pending_refs, pending_bytes = [], 0
            n_splits += 1
            # combine eagerly per full group (streams with the scan) —
            # but only once a second group starts, so a small input
            # (m <= group) never pays the extra copy tier
            if use_combine:
                if combined and len(split_group) >= group:
                    submit_combine()
                elif not combined and len(split_group) > group:
                    overflow = split_group[group:]
                    del split_group[group:]
                    submit_combine()
                    split_group.extend(overflow)
        peak_refs = max(peak_refs, live_refs())

    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            pending_refs.append(block_ref)
            pending_bytes += meta.size_bytes or 0
            if pending_bytes >= _TARGET_SPLIT_BYTES:
                flush()
    flush()
    # leftover group: combine only if a combine tier already exists
    # (otherwise reduces fan in over the raw splits, as before)
    if combined and split_group:
        submit_combine()
    peak_refs = max(peak_refs, live_refs())
    LAST_EXCHANGE_STATS.clear()
    LAST_EXCHANGE_STATS.update(
        splits=n_splits, combines=n_combines, peak_driver_refs=peak_refs,
        group=group, num_buckets=num_buckets)

    if not (split_group or combined):
        # empty input: still produce the KERNEL's output schema (the raw
        # padded-union schema would leak __side__/__r_* columns to
        # downstream select/write)
        schema = ds.schema()
        if schema is None:
            return ds
        empty = pa.table({n: pa.nulls(0, type=as_arrow_type(t))
                          for n, t in zip(schema.names, schema.types)})
        out = fn(empty if batch_format == "pyarrow" else empty.to_pandas())
        if isinstance(out, pd.DataFrame):
            out = _pandas_to_arrow(out)
        return rd.from_arrow(out)

    if num_buckets == 1:
        # num_returns=1 gives a bare ref per split
        LAST_EXCHANGE_STATS["reduce_fanin"] = len(split_group)
        outs = [_reduce_task.remote(fn, batch_format, *split_group)]
        return rd.from_arrow_refs(outs)

    final = combined + split_group
    m = len(final)
    LAST_EXCHANGE_STATS["reduce_fanin"] = m
    outs = [
        _reduce_task.remote(fn, batch_format,
                            *[final[i][b] for i in range(m)])
        for b in range(num_buckets)
    ]
    return rd.from_arrow_refs(outs)


def grouped_apply(
    ds,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int,
    engine: str | None = None,
    batch_format: str = "pandas",
):
    """Apply a vectorized multi-key kernel to each key-hash bucket.

    ``fn`` receives one bucket (all rows of every entity hashed to it) as
    a pandas DataFrame (default) or a pyarrow Table
    (``batch_format="pyarrow"`` — use this when the kernel must control
    the pandas conversion itself, e.g. to keep int64 columns exact in
    the presence of union null-padding) and must itself be vectorized
    across keys (``df.groupby(key)`` transforms, ``merge_asof``, ...).

    ``engine``: "tasks" (default; parallel task shuffle) or "raydata"
    (``groupby().map_groups`` — serial exchange on this Ray build, kept
    for comparison).  Env override: ``TSCAN_RAY_EXCHANGE``.
    """
    engine = engine or os.environ.get("TSCAN_RAY_EXCHANGE", "tasks")

    def wrapper(batch):
        out = fn(batch)
        if BUCKET_COL in getattr(out, "columns", ()):
            out = out.drop(columns=[BUCKET_COL])
        elif isinstance(out, pa.Table) and BUCKET_COL in out.column_names:
            out = out.drop_columns([BUCKET_COL])
        return out

    if engine == "raydata":
        bucketed = with_bucket(ds, key, num_buckets)
        return bucketed.groupby(BUCKET_COL).map_groups(
            wrapper, batch_format=batch_format
        )
    return task_exchange(ds, key, wrapper, num_buckets,
                         batch_format=batch_format)


def schema_pandas_dtypes(schema) -> pd.Series:
    """Pandas dtype per column for a Ray Dataset schema — tolerant of
    non-Arrow entries (pandas-backed datasets report numpy/Python types).
    Columns whose dtype can't be resolved are simply omitted (callers
    skip restoring those)."""
    out: dict = {}
    for n, t in zip(schema.names, schema.types):
        try:
            if isinstance(t, pa.DataType):
                out[n] = pa.schema([(n, t)]).empty_table().to_pandas().dtypes[n]
            else:
                out[n] = np.dtype(t)
        except (TypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
            continue
    return pd.Series(out)


def as_arrow_type(t) -> pa.DataType:
    """Normalize a Ray Schema type entry to a pyarrow DataType (pandas-
    backed datasets report numpy dtypes / Python classes)."""
    if isinstance(t, pa.DataType):
        return t
    if t is str:
        return pa.string()
    if t is bytes:
        return pa.binary()
    dt = np.dtype(t)
    if dt == np.dtype(object):
        # pandas object columns are overwhelmingly strings; anything else
        # would already have failed upstream Arrow conversion
        return pa.string()
    return pa.from_numpy_dtype(dt)
