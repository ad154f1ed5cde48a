"""Benchmark harness.

Default: run the headline flagship pipeline + a query suite over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and print ONE JSON line.

``--scaling``: run the headline pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and report both
throughputs + strong-scaling efficiency (the sandbox proxy for N vs 4N
nodes, per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# deterministic input replication for the scaling runs: the fixture table is
# small enough that un-amplified runs measure startup, not throughput
AMPLIFY = int(os.environ.get("RAY_GRAFT_AMPLIFY", "1"))
SCALING_AMPLIFY = int(os.environ.get("RAY_GRAFT_SCALING_AMPLIFY", "20"))

BENCH_QUERIES = [
    "pit_asof_join",
    "pit_lag_lead",
    "pit_sessionize",
    "pit_tumbling_window",
    "dedup_exact",
    "dedup_minhash",
    "text_word_freq_topk",
    "text_quality",
    "ann_topk",
    "tscan_features",
]


def _consume(ds) -> int:
    """Execute a Dataset fully without materializing it on the driver."""
    n = 0
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        n += batch.num_rows
    return n


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import __ray_entry__ as entrymod
    from tscan_ray.pipelines.flagship import flagship

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    for t in ("documents", "events", "embeddings", "lineitem"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    n_rows = n_docs * AMPLIFY
    n_entities = max(50, n_rows // 100)
    out_dir = f"/tmp/bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    flagship(
        SF_DIR,
        n_entities=n_entities,
        num_buckets=max(32, NUM_CPUS),
        featurizer_concurrency=None,  # flagship balances the CPU budget
        write_to=out_dir,
        amplify=AMPLIFY,
    )
    headline_sec = time.perf_counter() - t0

    queries = entrymod.queries()
    q_times: dict[str, float] = {}
    if not os.environ.get("RAY_GRAFT_SKIP_QUERIES"):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            _consume(queries[name](SF_DIR))
            q_times[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship_pipeline_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": n_rows,
        "amplify": AMPLIFY,
        "rows_per_sec": round(n_rows / headline_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_AMPLIFY=str(SCALING_AMPLIFY),
                   RAY_GRAFT_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    speedup = lo["value"] / hi["value"]
    eff = speedup / (32 / 8)
    return {
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "rows_per_sec_8": lo["rows_per_sec"],
        "rows_per_sec_32": hi["rows_per_sec"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
