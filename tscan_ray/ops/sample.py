"""Deterministic dataset splitting / sampling for training-data prep.

A 100 TB corpus cannot be split by ``random_shuffle`` + slicing (full
shuffle, non-reproducible across retries).  ``hash_split`` assigns each
row from a pure function of its id — embarrassingly parallel, stable
under re-runs and resumable writes, and any later run can recompute
membership without the original split artifact.

The integer-key hash is the same Knuth multiplicative used by the
keyed exchange (ops/keyed.bucket_of) — ``(id * 0x9E3779B97F4A7C15
mod 2^64) >> 33 mod resolution`` — chosen deliberately because SQL can
replicate it exactly with 128-bit integer arithmetic (see the
``sample_hash_split`` oracle), so the split is verifiable end-to-end.
String keys use pandas' stable siphash (rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tscan_ray.ops.keyed import bucket_of

SPLIT_RESOLUTION = 10_000


def hash_split(
    ds,
    id_col: str,
    fractions: dict[str, float],
    resolution: int = SPLIT_RESOLUTION,
    out_col: str = "split",
):
    """Add ``out_col`` assigning each row to a named split.

    ``fractions`` maps split name -> fraction; must sum to <= 1.0 (any
    remainder becomes the last split's overflow guard — fractions are
    cumulative thresholds over the hash-bucket space, so boundaries are
    exact multiples of 1/resolution).
    """
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions sum to > 1")
    names = list(fractions.keys())
    cum = np.cumsum([fractions[n] for n in names])
    thresholds = np.round(cum * resolution).astype(np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        vals = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = bucket_of(vals, resolution).astype(np.int64)
        idx = np.searchsorted(thresholds, b, side="right")
        idx = np.minimum(idx, len(names) - 1)  # remainder -> last split
        labels = pd.Categorical.from_codes(idx, categories=names)
        return batch.append_column(out_col,
                                   pa.array(labels.astype(str), type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample(
    ds,
    id_col: str,
    fraction: float,
    resolution: int = SPLIT_RESOLUTION,
):
    """Deterministic row sample: keep a row iff its id hashes below
    ``fraction`` of the bucket space.  Pure per-row predicate — no
    shuffle, no RNG state, stable under retries and across runs, and
    composable with hash_split (same hash, so a sample of the train
    split stays inside the train split iff thresholds nest).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(fraction)
    threshold = int(round(fraction * resolution))

    def keep(batch: pa.Table) -> pa.Table:
        vals = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = bucket_of(vals, resolution).astype(np.int64)
        return batch.filter(pa.array(b < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
