"""Job entrypoint: ``python -m tscan_ray.run`` (the ``ray job submit``
target; reference CLI = src/tscan.cxx:3300-3495).

Runs the flagship image+caption pipeline with checkpoint-resumable
partitioned output and prints a one-line JSON job report (per-partition
lineage manifests land in ``<out>/_manifest/``).

Re-running with the same ``--out`` resumes: completed partitions are
skipped by manifest scan (state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tscan_ray.run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="input table directory ({sf}/documents.parquet)")
    p.add_argument("--out", required=True, help="output directory (resumable)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: let Ray detect)")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--n-entities", type=int, default=50)
    p.add_argument("--concurrency", type=int, default=8,
                   help="featurizer actor-pool max size")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:  # the driver may own the session already
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from tscan_ray.pipelines.flagship import flagship
    from tscan_ray.state.manifest import read_manifests, resumable_write

    t0 = time.perf_counter()
    enriched = flagship(
        args.sf_dir,
        n_entities=args.n_entities,
        num_buckets=args.num_buckets,
        featurizer_concurrency=(1, args.concurrency),
    )
    summary = resumable_write(
        enriched, args.out, key="entity_id", num_buckets=args.num_buckets,
        lineage={
            "pipeline": "flagship",
            "sf_dir": args.sf_dir,
            "n_entities": args.n_entities,
        },
    )
    wall = time.perf_counter() - t0
    manifests = read_manifests(args.out)
    report = {
        "pipeline": "flagship",
        "out": args.out,
        "partitions_total": len(manifests),
        "partitions_written": int(len(summary)),
        "rows_written": int(summary["rows"].sum()) if len(summary) else 0,
        "rows_total": int(sum(m["rows"] for m in manifests)),
        "wall_s": round(wall, 3),
    }
    print(json.dumps(report))
    if owns_session:  # never tear down a driver-owned session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
