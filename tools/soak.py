"""5M-row soak run (VERDICT r3 #9): amplified flagship at 32 CPUs with
the resumable manifest sink, reporting steady-state rows/s and peak
object-store usage, then asserting the manifest is complete.

The input documents are amplified INSIDE the pipeline (one map op,
``pipelines.flagship.amplify_docs``) and the synthetic image table is
synthesized on the fly — nothing is pre-materialized, so this measures
the streaming executor end to end at 10x the round-3 capacity check.

Usage: RAY_GRAFT_CPUS=32 python tools/soak.py [--amplify 1000]
Prints one JSON line for BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plasma_mib() -> float:
    """Current object-store usage in MiB (cluster minus available)."""
    try:
        import ray

        total = ray.cluster_resources().get("object_store_memory", 0.0)
        avail = ray.available_resources().get("object_store_memory", 0.0)
        return max(0.0, (total - avail) / 2**20)
    except Exception:
        return 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--amplify", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/soak_out")
    ap.add_argument("--num-buckets", type=int, default=64)
    args = ap.parse_args()

    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")

    from tscan_ray.pipelines.flagship import flagship
    from tscan_ray.state.manifest import read_manifests, resumable_write

    shutil.rmtree(args.out, ignore_errors=True)

    peak = {"mib": 0.0}
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            peak["mib"] = max(peak["mib"], _plasma_mib())
            stop.wait(5.0)

    th = threading.Thread(target=poll, daemon=True)
    th.start()

    import duckdb

    n_docs = duckdb.sql(
        f"select count(*) from read_parquet('{args.sf_dir}/documents.parquet')"
    ).fetchone()[0]
    n_rows = n_docs * args.amplify
    n_entities = max(50, n_rows // 100)

    t0 = time.perf_counter()
    enriched = flagship(args.sf_dir, n_entities=n_entities,
                        num_buckets=args.num_buckets,
                        amplify=args.amplify)
    summary = resumable_write(
        enriched, args.out, key="entity_id", num_buckets=args.num_buckets,
        lineage={"pipeline": "flagship-soak", "sf_dir": args.sf_dir,
                 "amplify": args.amplify})
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=1)

    manifests = read_manifests(args.out)
    rows_written = int(summary["rows"].sum()) if len(summary) else 0
    rows_total = int(sum(m["rows"] for m in manifests))
    out_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(args.out) for f in fns)
    report = {
        "soak": "flagship-5M" if n_rows == 5_000_000 else f"flagship-{n_rows}",
        "rows": rows_total,
        "wall_s": round(wall, 1),
        "rows_per_s": round(rows_total / wall, 1),
        "num_cpus": cpus,
        "peak_plasma_mib": peak["mib"],
        "out_gib": round(out_bytes / 2**30, 2),
        "partitions": len(manifests),
        # empty buckets write no partition file; completeness is
        # row-accounted: every input row landed exactly once
        "manifest_complete": (rows_written == rows_total
                              and rows_total == n_rows
                              and len(manifests) <= args.num_buckets),
    }
    print(json.dumps(report))
    assert report["manifest_complete"], report
    ray.shutdown()


if __name__ == "__main__":
    main()
