"""Checkpoint-resumable partitioned output with per-partition lineage.

North-rule requirement (BASELINE.json): jobs must be resumable from
checkpoint with per-partition lineage + metrics.  The reference's only
resume mechanism is the Alpino parse cache (reference
src/tscan.cxx:168-221) — file-granular memoization; the engine
generalizes it to partition-granular output manifests:

* output layout: ``out_dir/part-{K:05d}.parquet`` + sidecar
  ``out_dir/_manifest/part-{K:05d}.json`` (row count, key-hash bucket,
  value checksum, stage wall time, lineage dict) — never one giant file;
* both files are written to a temp name then atomically ``os.replace``d
  (safe under Ray task retries: a retried writer re-produces byte-
  identical content, the rename is last-writer-wins idempotent);
* the manifest is written AFTER its data file, so a manifest's presence
  proves the partition is complete;
* resume = re-run the same call: completed partitions are filtered out
  BEFORE the shuffle by bucket id (cheap vectorized mask), so a restart
  only pays for missing partitions.

Partitioning is by deterministic key-hash bucket (ops/keyed.py) — the
same bucketing the timeline operators use, so one exchange can both
compute window features and write its bucket.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from tscan_ray.ops.keyed import BUCKET_COL, task_exchange, with_bucket

MANIFEST_DIR = "_manifest"


def _manifest_path(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{k:05d}.json")


def _part_path(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, f"part-{k:05d}.parquet")


def completed_partitions(out_dir: str) -> set[int]:
    """Bucket ids whose manifest exists (manifest presence == complete)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            out.add(int(name[5:-5]))
    return out


def value_checksum(df: pd.DataFrame) -> int:
    """Order-independent deterministic checksum of a frame's values."""
    if df.empty:
        return 0
    h = pd.util.hash_pandas_object(
        df.reindex(sorted(df.columns), axis=1), index=False
    ).to_numpy()
    # mask to 63 bits so the checksum stays int64-representable (stable
    # parquet/pandas dtype across partitions)
    return int((np.bitwise_xor.reduce(h) ^ np.uint64(len(h))) & np.uint64((1 << 63) - 1))


def resumable_write(
    ds,
    out_dir: str,
    key: str,
    num_buckets: int = 64,
    lineage: dict | None = None,
) -> pd.DataFrame:
    """Write ``ds`` as key-hash-partitioned parquet, skipping partitions
    already recorded complete in ``out_dir/_manifest``.

    Returns a summary frame (partition, rows, wall_s, checksum) of the
    partitions written in THIS run; already-complete ones are skipped
    before the shuffle.
    """
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    done = completed_partitions(out_dir)
    if done:
        # resuming: the existing partitioning must match this call —
        # skipping bucket K from an OLD (key, num_buckets) layout while
        # writing the rest under a new one would silently lose rows
        with open(_manifest_path(out_dir, min(done))) as f:
            prev = json.load(f).get("lineage", {})
        if (prev.get("key") != key
                or prev.get("num_buckets") != num_buckets):
            raise ValueError(
                f"resume mismatch in {out_dir}: existing manifests were "
                f"written with key={prev.get('key')!r}, "
                f"num_buckets={prev.get('num_buckets')} but this call "
                f"uses key={key!r}, num_buckets={num_buckets}; delete "
                f"the output dir or rerun with the original settings")
    base_lineage = dict(lineage or {})
    base_lineage.setdefault("key", key)
    base_lineage.setdefault("num_buckets", num_buckets)

    bucketed = with_bucket(ds, key, num_buckets)
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(df: pd.DataFrame) -> pd.DataFrame:
            mask = ~df[BUCKET_COL].isin(done_arr)
            return df[mask]

        bucketed = bucketed.map_batches(drop_done, batch_format="pandas")

    summary_cols = {"partition": "int64", "rows": "int64",
                    "wall_s": "float64", "checksum": "int64"}

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # a hash bucket no key mapped to
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in summary_cols.items()})
        t0 = time.perf_counter()
        k = int(df[BUCKET_COL].iloc[0])
        df = df.drop(columns=[BUCKET_COL])
        path = _part_path(out_dir, k)
        tmp = f"{path}.tmp.{os.getpid()}"
        df.to_parquet(tmp, index=False)
        os.replace(tmp, path)
        checksum = value_checksum(df)
        wall = time.perf_counter() - t0
        manifest = {
            "partition": k,
            "rows": int(len(df)),
            "checksum": checksum,
            "wall_s": round(wall, 4),
            "columns": list(df.columns),
            "lineage": base_lineage,
        }
        mpath = _manifest_path(out_dir, k)
        mtmp = f"{mpath}.tmp.{os.getpid()}"
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(mtmp, mpath)
        return pd.DataFrame(
            [{"partition": k, "rows": len(df), "wall_s": wall,
              "checksum": checksum}]
        )

    # exchange keyed DIRECTLY on the bucket index (partition K = bucket K),
    # so the output layout is stable across runs and engines
    summary = task_exchange(
        bucketed, BUCKET_COL, write_group, num_buckets, direct=True
    ).to_pandas()  # tiny: one row per partition written
    return summary


def read_manifests(out_dir: str) -> list[dict]:
    """All partition manifests (the job's lineage + metrics record)."""
    out = []
    for k in sorted(completed_partitions(out_dir)):
        with open(_manifest_path(out_dir, k)) as fh:
            out.append(json.load(fh))
    return out
