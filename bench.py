"""Benchmark harness.

Default: run the headline flagship pipeline + a query suite over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and print ONE JSON line.

``--scaling``: run the headline pipeline in two fresh processes at
num_cpus=N and num_cpus=4N (``$RAY_GRAFT_SCALING_N``, default 4 -> 16)
on the same input and report both throughputs + strong-scaling
efficiency (the sandbox proxy for N vs 4N nodes, per BASELINE.md).
N=4 leaves half the box idle in BOTH legs so shared-tenant CPU steal
and Ray system processes (raylet/GCS/driver) land on spare cores
instead of skewing whichever leg is pinned tighter.
"""

from __future__ import annotations

import json
import math
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
SCALING_N = int(os.environ.get("RAY_GRAFT_SCALING_N", "4"))

BENCH_QUERIES = [
    "pit_asof_join",
    "pit_lag_lead",
    "pit_sessionize",
    "pit_tumbling_window",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_fast",
    "text_word_freq_topk",
    "text_quality",
    "ann_topk",
    "tscan_features",
    "text_surprisal",
    "join_supplier_nation_region",
    "agg_user_value_2phase",
    "pit_rolling_time_mean_sliced",
    "pit_expanding",
    "pit_interval_join",
    "agg_type_pivot",
    "agg_value_quantiles",
    "sample_hash_split",
    "join_orders_customer_shuffle",
    "agg_user_robust",
]


# calibration reference: aggregate spin throughput measured 2026-08-18 on
# this box at a quiet moment (see BASELINE.md "bench calibration").  The
# probe re-runs at bench time; calibration.spin_ratio < ~0.8 means the box
# was being stolen from and wall times are inflated by ~1/ratio.
_SPIN_REF_32 = 4.16e8   # 32-proc aggregate ops/sec
_SPIN_REF_1 = 2.18e7    # single-proc ops/sec


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _spin_probe(k: int, n: int = 6_000_000) -> float:
    """Aggregate spin throughput of k concurrent processes (ops/sec) —
    a ~0.5 s probe of how much CPU the box is actually delivering.
    Uses a SPAWN context: forking a process that holds live Ray/grpc
    threads is not fork-safe and can hang the bench."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(k) as p:
        t0 = time.perf_counter()
        p.map(_burn, [n] * k)
        return k * n / (time.perf_counter() - t0)


def _consume(ds) -> int:
    """Execute a Dataset fully without materializing it on the driver.
    (Small-result queries may return a pyarrow Table / pandas frame.)"""
    if not hasattr(ds, "iter_batches"):
        return ds.num_rows if hasattr(ds, "num_rows") else len(ds)
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
    from tscan_ray.pipelines.flagship import flagship, materialize_images

    # setup (untimed): transcode the input tables to /tmp with the
    # b'pandas' schema metadata STRIPPED — the driver-generated parquet
    # carries it, which makes pa.Schema unhashable and Ray's block-schema
    # dedup log 'Failed to hash the schemas' inside ReadParquet itself
    # (before any map can strip it).  Doubles as the page-cache warm-up
    # so we measure compute + shuffle, not first disk read.
    import pyarrow.parquet as pq

    sf_tag_in = os.path.basename(SF_DIR.rstrip("/"))
    sf_run = f"/tmp/bench_sf_{sf_tag_in}"
    if not os.path.isdir(sf_run):
        os.makedirs(sf_run + ".tmp", exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
            src = f"{SF_DIR}/{t}.parquet"
            if os.path.exists(src):
                pq.write_table(
                    pq.read_table(src).replace_schema_metadata(None),
                    f"{sf_run}.tmp/{t}.parquet")
        os.rename(sf_run + ".tmp", sf_run)

    n_docs = pq.read_metadata(f"{sf_run}/documents.parquet").num_rows
    for t in ("documents", "events", "embeddings", "lineitem"):
        pq.read_table(f"{sf_run}/{t}.parquet")

    # warm the Ray worker pool (untimed): the first dataset execution in a
    # session pays ~3s of worker-process spin-up that belongs to session
    # startup, not to any one query
    import ray.data as rd

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pyarrow").count()

    n_rows = n_docs * AMPLIFY
    n_entities = max(50, n_rows // 100)
    out_dir = f"/tmp/bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # setup (untimed): materialize the input images table once per
    # (sf, amplify) — the engine's job starts at the table, not the
    # synthesizer
    sf_tag = sf_tag_in
    images_path = f"/tmp/bench_images_{sf_tag}_x{AMPLIFY}"
    if not os.path.isdir(images_path):
        materialize_images(sf_run, images_path + ".tmp",
                           n_entities=n_entities, amplify=AMPLIFY)
        os.rename(images_path + ".tmp", images_path)

    # warm the images table's pages too (it is the timed pipeline's input)
    import glob

    for f in glob.glob(f"{images_path}/*.parquet"):
        pq.read_table(f)

    # pre-warm the flagship actor pools (untimed, BOTH scaling legs): a
    # tiny end-to-end pass pays the pool spin-up / per-actor import cost
    # that belongs to session startup, not steady-state throughput
    warm_path = f"/tmp/bench_images_{sf_tag}_warm"
    if not os.path.isdir(warm_path):
        rd.read_parquet(images_path).limit(512).repartition(4) \
            .write_parquet(warm_path + ".tmp")
        os.rename(warm_path + ".tmp", warm_path)
    flagship(sf_run, n_entities=n_entities, num_buckets=max(32, NUM_CPUS),
             featurizer_concurrency=None, write_to=f"{out_dir}.warm",
             images_path=warm_path)
    shutil.rmtree(f"{out_dir}.warm", ignore_errors=True)

    # noise discipline (this box has heavy, bursty co-tenant CPU steal:
    # identical code measured 5.9 s and 16.4 s an hour apart):
    #   * spin-probe calibration before and after the timed section,
    #     embedded in the output JSON against a documented reference —
    #     a low ratio proves wall times were inflated by the box;
    #   * 3 INTERLEAVED passes over headline + every query (pass 1 of
    #     everything, then pass 2, then pass 3) so a steal burst hits
    #     one pass of many queries, not all passes of one query;
    #   * per-measurement estimator = median of the 3 passes.
    # Scaling legs (RAY_GRAFT_SKIP_QUERIES) stay single-run: both legs
    # see the same noise regime and a second amplified pass would double
    # an already-long measurement.
    probe_k = min(NUM_CPUS, 32)
    spin_before = _spin_probe(probe_k)
    n_reps = 1 if os.environ.get("RAY_GRAFT_SKIP_QUERIES") else 3
    queries = entrymod.queries()
    run_queries = (
        [] if os.environ.get("RAY_GRAFT_SKIP_QUERIES") else BENCH_QUERIES)
    head_reps: list[float] = []
    q_reps: dict[str, list[float]] = {n: [] for n in run_queries}
    for rep in range(n_reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        flagship(
            sf_run,
            n_entities=n_entities,
            num_buckets=max(32, NUM_CPUS),
            featurizer_concurrency=None,  # flagship balances the CPU budget
            write_to=out_dir,
            images_path=images_path,
        )
        head_reps.append(time.perf_counter() - t0)
        for name in run_queries:
            t0 = time.perf_counter()
            _consume(queries[name](sf_run))
            q_reps[name].append(time.perf_counter() - t0)
    spin_after = _spin_probe(probe_k)

    def median(v: list[float]) -> float:
        return sorted(v)[len(v) // 2]

    headline_sec = median(head_reps)
    q_times = {n: round(median(v), 3) for n, v in q_reps.items()}
    # reference for probe_k processes: log-log interpolation between the
    # measured 1-proc and 32-proc aggregate throughputs (the box scales
    # sublinearly — a straight probe_k/32 scaling understates the
    # achievable aggregate at small k and inflates spin_ratio past 1.0).
    # The constants are per-box: flag when probe_k is outside the
    # calibrated range so readers on other hardware discount the ratio.
    if probe_k <= 1:
        spin_ref = _SPIN_REF_1
    elif probe_k >= 32:
        spin_ref = _SPIN_REF_32 * probe_k / 32
    else:
        frac = math.log(probe_k) / math.log(32)
        spin_ref = _SPIN_REF_1 * (_SPIN_REF_32 / _SPIN_REF_1) ** frac
    calib_note = ("calibrated-range" if 1 <= probe_k <= 32
                  else "extrapolated: constants are per-box")
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
        "headline_reps": [round(v, 3) for v in head_reps],
        "rows_per_sec_best": round(n_rows / min(head_reps), 1),
        "calibration": {
            "spin_ops_before": round(spin_before, 0),
            "spin_ops_after": round(spin_after, 0),
            "spin_reference": spin_ref,
            "spin_ratio": round(
                min(spin_before, spin_after) / spin_ref, 3),
            "probe_procs": probe_k,
            "reference_note": calib_note,
        },
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_AMPLIFY=str(SCALING_AMPLIFY),
                   RAY_GRAFT_SKIP_QUERIES="1")
        cmd = [sys.executable, os.path.abspath(__file__)]
        if shutil.which("taskset"):
            # pin to ncpu PHYSICAL cores: ray.init(num_cpus=N) only limits
            # scheduling slots — without the pin the "N-CPU" run bursts
            # onto every core and the N vs 4N comparison is meaningless
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def hw_ceiling() -> float:
        """Raw multiprocessing spin test at N vs 4N pinned cores: what this
        box can deliver AT BEST for N -> 4N (shared-tenant CPU steal makes
        it < 1.0 here; a real N -> 4N node cluster has no such cap)."""
        prog = (
            "import multiprocessing as mp,time,sys\n"
            "def burn(n):\n"
            "    x=0\n"
            "    for i in range(n): x+=i*i\n"
            "    return x\n"
            "if __name__=='__main__':\n"
            "    k=int(sys.argv[1]); n=15_000_000\n"
            "    with mp.Pool(k) as p:\n"
            "        t0=time.perf_counter(); p.map(burn,[n]*k*2)\n"
            "        print(2*k*n/(time.perf_counter()-t0))\n"
        )

        def throughput(k: int) -> float:
            cmd = [sys.executable, "-c", prog, str(k)]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{k - 1}"] + cmd
            return float(subprocess.run(cmd, capture_output=True, text=True,
                                        check=True).stdout.strip())

        return throughput(4 * SCALING_N) / throughput(SCALING_N) / 4.0

    # shared-tenant CPU steal on this sandbox swings by the minute; take
    # best-of-two in ABBA order so both configs sample similar conditions
    n, n4 = SCALING_N, 4 * SCALING_N
    lo, hi = run(n), run(n4)
    lo2, hi2 = run(n), run(n4)
    if lo2["value"] < lo["value"]:
        lo = lo2
    if hi2["value"] < hi["value"]:
        hi = hi2
    speedup = lo["value"] / hi["value"]
    eff = speedup / 4.0
    ceiling = round(sorted(hw_ceiling() for _ in range(3))[1], 3)
    return {
        "n": n,
        "sec_n": lo["value"],
        "sec_4n": hi["value"],
        "rows_per_sec_n": lo["rows_per_sec"],
        "rows_per_sec_4n": hi["rows_per_sec"],
        "speedup_n_to_4n": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "hw_ceiling_n_to_4n": ceiling,
        "efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
