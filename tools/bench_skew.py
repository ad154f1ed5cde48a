"""Hot-entity (Zipf) skew bench for the flagship timeline exchange.

VERDICT r3 #3: the fused ``add_timeline_features`` buckets whole
entities, so one pathological entity (SURVEY §4.2's hot phash bucket)
lands in one reduce task.  ``add_timeline_features_sliced`` salts hot
entities over (entity, ts-slice) keys.  This bench measures both
operators on the same inputs:

- uniform: N rows over E entities, balanced
- hot:     one entity holds HOT_FRAC of all rows (default 20%),
           the rest uniform

and reports wall times + the skew penalty ratio the salting removes.
Rows carry a caption (the windowed-diversity input) and the four
timeline feature columns, exactly like the flagship's exchange input.

Usage: RAY_GRAFT_CPUS=8 python tools/bench_skew.py [--rows 400000]
Prints one JSON line per scenario plus a summary line for BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_input(n_rows: int, n_entities: int, hot_frac: float, seed: int):
    """Deterministic synthetic feature table as a Ray Dataset (built
    distributed via range->map_batches, never materialized on the
    driver)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    vocab = np.array(["de", "kat", "hond", "loopt", "snel", "huis",
                      "groot", "boek", "stad", "werkt", "mooi", "klein",
                      "rood", "springt", "water", "licht"])

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(seed + int(ids[0]))
        n = len(ids)
        if hot_frac > 0:
            hot = rng.random(n) < hot_frac
            ent = np.where(hot, 0, rng.integers(1, n_entities, n))
        else:
            ent = rng.integers(0, n_entities, n)
        # timestamps: spread over ~30 days, hot entity dense
        ts = (np.int64(1_700_000_000_000_000)
              + ids * np.int64(2_000_000)
              + rng.integers(0, 1_000_000, n))
        k = 5
        words = vocab[rng.integers(0, len(vocab), (n, k))]
        captions = [" ".join(w) for w in words]
        return pd.DataFrame({
            "image_id": [f"img_{i:09d}" for i in ids],
            "entity_id": ent.astype(np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "caption": captions,
            "MTLD_wrd": rng.random(n) * 50,
            "TTR_wrd": rng.random(n),
            "Wrd_freq_log": rng.random(n) * 5,
            "wordCnt": rng.integers(3, 9, n).astype(np.int64),
        })

    return rd.range(n_rows).map_batches(gen, batch_format="pandas",
                                        batch_size=16384)


def consume(ds) -> int:
    total = 0
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        total += b.num_rows
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--entities", type=int, default=64)
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--slice-us", type=int, default=3_600_000_000)
    ap.add_argument("--diversity-window", type=int, default=5)
    args = ap.parse_args()

    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")

    from tscan_ray.pipelines.flagship import (
        add_timeline_features, add_timeline_features_sliced)

    scenarios = {
        "uniform_unsliced": (0.0, False),
        "hot_unsliced": (args.hot_frac, False),
        "hot_sliced": (args.hot_frac, True),
    }
    kw = dict(key="entity_id", ts="ts", order_col="image_id",
              rolling_window=5, snapshot_every=None,
              diversity_window=args.diversity_window, num_buckets=cpus * 4)

    walls: dict[str, list[float]] = {k: [] for k in scenarios}
    for rep in range(args.reps):
        for name, (hf, sliced) in scenarios.items():
            ds = make_input(args.rows, args.entities, hf, seed=17)
            t0 = time.perf_counter()
            if sliced:
                out = add_timeline_features_sliced(
                    ds, slice_us=args.slice_us, **kw)
            else:
                out = add_timeline_features(ds, **kw)
            n = consume(out)
            wall = time.perf_counter() - t0
            assert n == args.rows, (name, n)
            walls[name].append(wall)

    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    for name, w in med.items():
        print(json.dumps({"scenario": name, "wall_sec": round(w, 2),
                          "rows": args.rows, "num_cpus": cpus,
                          "reps": args.reps, "all": [round(x, 2)
                                                     for x in walls[name]]}))
    penalty = med["hot_unsliced"] / med["uniform_unsliced"]
    sliced_vs_uniform = med["hot_sliced"] / med["uniform_unsliced"]
    print(json.dumps({
        "summary": "hot-entity skew",
        "hot_penalty_unsliced": round(penalty, 2),
        "hot_sliced_vs_uniform": round(sliced_vs_uniform, 2),
        "sliced_speedup_on_hot": round(
            med["hot_unsliced"] / med["hot_sliced"], 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
