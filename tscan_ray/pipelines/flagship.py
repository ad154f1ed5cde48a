"""Flagship pipeline: image+caption table -> validated, featurized,
point-in-time-enriched feature table.

    documents ──synth──▶ images(image_id bytes w h fmt caption phash entity_id ts)
        │ decode+validate (PSNR>=40, ahash, drop bytes BEFORE any shuffle)
        │ caption featurizer (T-scan vector, actor pool, no shuffle)
        ▼
    timeline layer — ONE keyed exchange computing, per entity ordered by ts:
        lag-1 of selected features (strictly past), trailing rolling mean,
        gap-based session_id, and the snapshot as-of features
        ("feature vector as of the entity's last k-th-event snapshot" —
        right side ⊆ left rows, so the as-of reduces to a marked-row
        forward fill inside the same bucket UDF)
        ▼
    write_parquet partitioned output (resumable layout)

Scale shape: exactly ONE all-to-all exchange, carrying only the narrow
feature columns (binary payload dropped at decode).  Everything else
streams with backpressure.
"""

from __future__ import annotations

import pandas as pd

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.ops.keyed import grouped_apply
from tscan_ray.sources.images import synth_images
from tscan_ray.stages.decode import decode_validate
from tscan_ray.stages.featurizer import featurize

# features carried into the timeline layer (keep the shuffle narrow)
TIMELINE_FEATURES = ["MTLD_wrd", "TTR_wrd", "Wrd_freq_log", "wordCnt"]
KEEP_COLS = ["image_id", "caption", "phash", "entity_id", "ts", "psnr_db", "ahash"]


class DecodeFeaturize:
    """Fused decode+validate → caption-featurize actor (one pool, one
    handoff).  Composes the two stage classes — setup for both happens
    once per actor; each batch flows decoder → featurizer in-process."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG,
                 n_entities: int | None = 50,
                 keep_columns: list[str] | None = None, lm_ref=None):
        from tscan_ray.stages.decode import DecodeValidate
        from tscan_ray.stages.featurizer import CaptionFeaturizer

        self.decoder = DecodeValidate(cfg=cfg, drop_bytes=True,
                                      n_entities=n_entities)
        self.featurizer = CaptionFeaturizer(text_column="caption", cfg=cfg,
                                            keep_columns=keep_columns,
                                            lm_ref=lm_ref)

    def __call__(self, batch):
        return self.featurizer(self.decoder(batch))


def add_timeline_features(
    ds,
    key: str = "entity_id",
    ts: str = "ts",
    order_col: str = "image_id",
    feature_cols: list[str] = TIMELINE_FEATURES,
    rolling_window: int = 5,
    cfg: EngineConfig = DEFAULT_CONFIG,
    num_buckets: int | None = None,
    snapshot_every: int | None = None,
    n_entities: int | None = None,
    diversity_window: int | None = 5,
    text_col: str = "caption",
):
    """Lag-1 + trailing rolling mean + session_id + windowed TTR/MTLD over
    the entity's trailing captions — and, when ``snapshot_every`` is set,
    the snapshot as-of features — in ONE keyed exchange (fused bucket UDF
    instead of chained shuffles).  MTLD is non-decomposable, so the
    window recomputes from buffered tokens (SURVEY.md §7.4).

    The snapshot as-of is the degenerate-but-common case where the right
    side is a subset of the left rows: "latest snapshot row with
    ts' <= ts" then reduces to a per-entity forward-fill of the marked
    rows' values — no second exchange, no dataset fork (a lazy Dataset
    consumed by two branches would recompute its whole upstream).  The
    general two-sided operator is ops/asof.asof_join."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts, order_col], kind="mergesort")
        g = df.groupby(key, sort=False)
        for c in feature_cols:
            df[c + "_lag1"] = g[c].shift(1)
            df[c + f"_rmean{rolling_window}"] = g[c].transform(
                lambda s: s.rolling(rolling_window, min_periods=1).mean()
            )
        tsv = df[ts].astype("datetime64[us]").astype("int64")
        prev = tsv.groupby(df[key], sort=False).shift(1)
        new_session = prev.isna() | ((tsv - prev) > cfg.session_gap_us)
        df["session_id"] = (
            new_session.groupby(df[key], sort=False).cumsum().astype("int64") - 1
        )
        if diversity_window is not None and text_col in df.columns:
            from tscan_ray.ops.window import rolling_diversity_frame

            df = rolling_diversity_frame(df, key, text_col, diversity_window)
        if snapshot_every is not None:
            seq = df[order_col].str.slice(4).astype("int64") // (n_entities or 1)
            is_snap = (seq % snapshot_every) == 0
            df["ts_snap"] = df[ts].where(is_snap)
            df["ts_snap"] = df.groupby(key, sort=False)["ts_snap"].ffill()
            for c in feature_cols:
                df[c + "_snap"] = df[c].where(is_snap)
                df[c + "_snap"] = df.groupby(key, sort=False)[c + "_snap"].ffill()
        return df

    return grouped_apply(ds, key, fn, num_buckets or cfg.num_key_buckets)


def amplify_docs(docs, sf_dir: str, amplify: int):
    """Deterministically replicate the documents table ``amplify``x with
    fresh doc_ids, INSIDE one map op (a union of K read branches adds
    ~2K operators of fixed streaming-executor overhead), then re-split
    so downstream codec work fans out."""
    import pyarrow.parquet as pq

    import ray as _ray

    if amplify <= 1:
        return docs
    n0 = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def replicate(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        i = batch.column_names.index("doc_id")
        copies = [batch]
        for r in range(1, amplify):
            copies.append(batch.set_column(
                i, "doc_id",
                pc.add(batch.column("doc_id"), pa.scalar(r * n0))))
        return pa.concat_tables(copies)

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return docs.map_batches(replicate, batch_format="pyarrow",
                            zero_copy_batch=True).repartition(cpus * 4)


def materialize_images(
    sf_dir: str,
    out_path: str,
    n_entities: int = 50,
    amplify: int = 1,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> str:
    """Synthesize the image+caption table to parquet (benchmark setup /
    fixture generation — NOT part of the timed pipeline)."""
    import pyarrow.parquet as pq  # noqa: F401 (amplify_docs reads metadata)

    import ray.data as rd

    from tscan_ray.sources.io import read_table
    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = amplify_docs(docs, sf_dir, amplify)
    if amplify <= 1:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        docs = docs.repartition(cpus * 4)
    synth_images(docs, n_entities=n_entities, cfg=cfg).write_parquet(out_path)
    return out_path


def flagship(
    sf_dir: str,
    n_entities: int = 50,
    cfg: EngineConfig = DEFAULT_CONFIG,
    snapshot_every: int = 5,
    num_buckets: int | None = None,
    write_to: str | None = None,
    featurizer_concurrency=None,
    amplify: int = 1,
    images_path: str | None = None,
):
    """Run the full pipeline over {sf_dir}/documents.parquet.

    ``amplify=K`` deterministically replicates the input K× with fresh
    doc_ids (every synthesized value is a pure function of doc_id) — used
    by the scaling benchmark to measure steady-state throughput instead
    of fixed startup overhead on the small fixture tables.

    ``images_path``: read a pre-materialized images table (parquet dir)
    instead of synthesizing inline — the production shape, where the
    pipeline is read → decode/validate → featurize → timeline → sink and
    data generation is not on the clock.

    Returns the enriched Dataset (or writes partitioned parquet when
    ``write_to`` is given and returns the path)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    # CPU budget across the two actor-pool stages (actors RESERVE their
    # CPU; FIXED pools — autoscaling ramps one actor at a time and leaves
    # the stage serial on short runs).  Shares follow measured per-row
    # cost: featurize ~2.9 ms, decode+validate ~2.2 ms, synth ~0.8 ms →
    # featurizer ~45%, decode ~35%, remainder for read/synth/shuffle
    # tasks.  A pool sized to all CPUs starves the producers.
    explicit_concurrency = featurizer_concurrency is not None
    if featurizer_concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        featurizer_concurrency = max(1, int(cpus * 0.5))
        decode_concurrency = max(1, int(cpus * 0.4))
    else:
        decode_concurrency = (1, 8)

    if images_path is not None:
        from tscan_ray.sources.io import read_table

        images = read_table(images_path)  # Lance when available, else parquet
        # ONE fused decode+featurize pool: both stages are pure per-row
        # CPU, so splitting them bought nothing but a second pool's
        # process-spawn/import cost and an extra object-store handoff of
        # every row.  Fusing cuts the fixed startup that dominates the
        # strong-scaling denominator (BASELINE.md).
        from tscan_ray.stages.featurizer import pool_size

        feats = images.map_batches(
            DecodeFeaturize,
            fn_constructor_kwargs={"cfg": cfg, "n_entities": n_entities,
                                   "keep_columns": KEEP_COLS},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.featurizer_batch_size,
            concurrency=(featurizer_concurrency if explicit_concurrency
                         else pool_size()),
        )
        nb = num_buckets or cfg.num_key_buckets
        enriched = add_timeline_features(
            feats, cfg=cfg, num_buckets=nb,
            snapshot_every=snapshot_every, n_entities=n_entities,
        )
        if write_to:
            enriched.write_parquet(write_to)
            return write_to
        return enriched

    from tscan_ray.sources.io import read_table
    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = amplify_docs(docs, sf_dir, amplify)
    images = synth_images(docs, n_entities=n_entities, cfg=cfg)
    validated = decode_validate(images, cfg=cfg, drop_bytes=True,
                                n_entities=n_entities,
                                concurrency=decode_concurrency)
    feats = featurize(validated, "caption", cfg=cfg,
                      concurrency=featurizer_concurrency,
                      keep_columns=KEEP_COLS)
    nb = num_buckets or cfg.num_key_buckets
    enriched = add_timeline_features(
        feats, cfg=cfg, num_buckets=nb,
        snapshot_every=snapshot_every, n_entities=n_entities,
    )
    if write_to:
        enriched.write_parquet(write_to)
        return write_to
    return enriched
