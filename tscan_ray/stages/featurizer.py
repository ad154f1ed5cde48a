"""Caption featurizer stage: a stateful ``map_batches`` actor pool.

Lexicons are built ONCE per actor in ``__init__`` (the reference loads
its ~20 lexicon files once at startup, src/tscan.cxx:862-1119); each
``__call__`` processes one zero-copy Arrow batch and appends the flat
feature vector columns.

Usage::

    ds = ds.map_batches(
        CaptionFeaturizer,
        fn_constructor_kwargs={"text_column": "caption"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.featurizer_batch_size,
        concurrency=N,              # actor pool size
    )

Scale notes: the stage is embarrassingly parallel (a document never
spans rows, SURVEY.md §7.0) — no shuffle, no skew concern beyond row
size; hot phash-bucket entities do NOT affect this stage because it is
keyed by nothing.  Lexicons are a few MB → per-actor copies are cheap;
for very large lexicons pass ``lexicons_ref=ray.put(lex)`` so all actors
on a node share one object-store copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.text.features import feature_names, featurize_document
from tscan_ray.text.lexicons import default_lexicons


class CaptionFeaturizer:
    """Compute the T-scan feature vector for a text column, per batch."""

    def __init__(
        self,
        text_column: str = "caption",
        cfg: EngineConfig = DEFAULT_CONFIG,
        lexicons_ref=None,
        lm_ref=None,
        prefix: str = "",
        keep_columns: list[str] | None = None,
    ):
        # once-per-actor setup (NOT per batch).  lm_ref: ray.put() of a
        # corpus-fitted BigramLM (one object-store copy shared per node);
        # None -> packaged unigram default.
        self.text_column = text_column
        self.cfg = cfg
        self.prefix = prefix
        self.keep_columns = keep_columns
        self.lex = ray.get(lexicons_ref) if lexicons_ref is not None else default_lexicons()
        self.lm = ray.get(lm_ref) if lm_ref is not None else None
        self.names = feature_names()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        cols: dict[str, list] = {n: [] for n in self.names}
        for t in texts:
            feats = featurize_document(t or "", self.lex, self.cfg, lm=self.lm)
            for n in self.names:
                cols[n].append(feats[n])
        if self.keep_columns is not None:
            batch = batch.select(self.keep_columns)
        for n in self.names:
            vals = cols[n]
            # ints stay int64; anything that can be NaN becomes float64
            if all(isinstance(v, int) for v in vals):
                arr = pa.array(np.asarray(vals, dtype=np.int64), type=pa.int64())
            else:
                arr = pa.array(np.asarray(vals, dtype=np.float64), type=pa.float64())
            batch = batch.append_column(self.prefix + n, arr)
        return batch


def featurize(
    ds,
    text_column: str = "caption",
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency=None,
    batch_size: int | None = None,
    keep_columns: list[str] | None = None,
    lm_ref=None,
):
    """Attach the feature-vector columns to a Dataset (actor-pool stage)."""
    # Ray requires an explicit actor-pool size for callable classes; default
    # to an autoscaling pool rather than crashing when the caller omits it.
    kwargs = {"concurrency": concurrency if concurrency is not None else (1, 8)}
    return ds.map_batches(
        CaptionFeaturizer,
        fn_constructor_kwargs={
            "text_column": text_column,
            "cfg": cfg,
            "keep_columns": keep_columns,
            "lm_ref": lm_ref,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size or cfg.featurizer_batch_size,
        **kwargs,
    )
