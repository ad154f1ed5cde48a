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


def pool_size(cap: int = 32, headroom: int = 2) -> int:
    """Fixed actor-pool size that fits the current session: cluster CPUs
    minus headroom for read/shuffle tasks (an actor RESERVES its CPU for
    life — a pool equal to all CPUs starves every other stage)."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(cap, cpus - headroom))


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
        custom_groups: dict | None = None,
        annotations_column: str | None = None,
    ):
        # once-per-actor setup (NOT per batch).  lm_ref: ray.put() of a
        # corpus-fitted BigramLM (one object-store copy shared per node);
        # None -> packaged unigram default.
        #
        # custom_groups: the driver's register_feature_group() registry
        # does not exist in this (actor) process — the featurize() helper
        # snapshots it at pipeline-build time and re-registers here.
        if custom_groups:
            from tscan_ray.text import features as _fmod

            for gname, gfn in custom_groups.items():
                if gname not in _fmod._CUSTOM_GROUPS:
                    _fmod.register_feature_group(gname, gfn)
        self.text_column = text_column
        self.cfg = cfg
        self.prefix = prefix
        self.keep_columns = keep_columns
        # annotations_column: JSON per row (sources/folia.py
        # annotations_to_json) carrying precomputed Frog/Alpino
        # annotations — the reference's parse-cache pattern
        # (src/tscan.cxx:168-221) distributed: rows with a non-null
        # value bypass the heuristic tagger / reduced parser entirely
        self.annotations_column = annotations_column
        self.lex = ray.get(lexicons_ref) if lexicons_ref is not None else default_lexicons()
        self.lm = ray.get(lm_ref) if lm_ref is not None else None
        self.names = feature_names(cfg)
        # per-feature dtype for EMPTY batches (the per-batch int/float
        # sniff below would call every column int64 when there are no
        # values, clashing with non-empty blocks' float columns)
        probe = featurize_document("", self.lex, self.cfg, lm=self.lm)
        self._int_features = {n for n in self.names
                              if isinstance(probe[n], int)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        if (self.annotations_column is not None
                and self.annotations_column in batch.column_names):
            from tscan_ray.sources.folia import annotations_from_json

            rows = []
            for t, a in zip(texts,
                            batch.column(self.annotations_column).to_pylist()):
                if a:
                    paragraphs, lookup = annotations_from_json(a)
                    rows.append(featurize_document(
                        t or "", self.lex, self.cfg, lm=self.lm,
                        annotations=paragraphs, tree_lookup=lookup))
                else:
                    rows.append(featurize_document(t or "", self.lex,
                                                   self.cfg, lm=self.lm))
        else:
            rows = [featurize_document(t or "", self.lex, self.cfg,
                                       lm=self.lm)
                    for t in texts]
        if self.keep_columns is not None:
            batch = batch.select(self.keep_columns)
        # one arrow table construction (not 400 append_column copies)
        cols = {c: batch.column(c) for c in batch.column_names}
        for n in self.names:
            vals = [r[n] for r in rows]
            # ints stay int64; anything that can be NaN becomes float64.
            # Empty batches use the probe-derived dtype so the schema
            # unifies with non-empty blocks.
            is_int = (n in self._int_features if not vals
                      else all(isinstance(v, int) for v in vals))
            if is_int:
                arr = pa.array(np.asarray(vals, dtype=np.int64), type=pa.int64())
            else:
                arr = pa.array(np.asarray(vals, dtype=np.float64), type=pa.float64())
            cols[self.prefix + n] = arr
        return pa.table(cols)


def featurize(
    ds,
    text_column: str = "caption",
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency=None,
    batch_size: int | None = None,
    keep_columns: list[str] | None = None,
    lm_ref=None,
    lexicons_ref=None,
    annotations_column: str | None = None,
):
    """Attach the feature-vector columns to a Dataset (actor-pool stage).

    ``annotations_column``: name of a JSON annotation column
    (``sources/folia.annotations_to_json``) — rows carrying precomputed
    Frog/Alpino annotations are featurized from those instead of the
    heuristic tagger (the reference's ``alpino_lookup.data`` pattern,
    src/tscan.cxx:168-221, as a distributed column).

    ``concurrency``: int = fixed pre-started pool (best throughput; must
    fit the cluster), tuple = autoscaling, None = fixed pool sized to the
    session's CPUs minus headroom for the read/shuffle tasks.

    ``lexicons_ref``: ``ray.put()`` of a customized LexiconBundle (e.g.
    from :func:`with_custom_wordlist`) — the user-extension hook mirroring
    the reference's CLAM custom-wordlist upload
    (webservice/tscanservice/tscanwrapper.py:73-88): one object-store
    copy, fetched once per actor.
    """
    if concurrency is None:
        concurrency = pool_size()
    kwargs = {"concurrency": concurrency}
    from tscan_ray.text import features as _fmod

    return ds.map_batches(
        CaptionFeaturizer,
        fn_constructor_kwargs={
            "text_column": text_column,
            "cfg": cfg,
            "keep_columns": keep_columns,
            "lm_ref": lm_ref,
            "lexicons_ref": lexicons_ref,
            "annotations_column": annotations_column,
            # snapshot the driver-side plugin registry for the actors
            "custom_groups": dict(_fmod._CUSTOM_GROUPS) or None,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size or cfg.featurizer_batch_size,
        **kwargs,
    )


def with_custom_wordlist(wordlist, classification: str = "custom"):
    """Build a LexiconBundle with a user wordlist merged in (§2.10 hook;
    reference: `load_custom_wordlist`,
    webservice/tscanservice/tscanwrapper.py:73-88, feeding the
    my_classification lexicon, src/tscan.cxx:815-860).

    ``wordlist``: list of lemmas, a dict lemma->label, or a pyarrow Table
    / pandas DataFrame with columns (word, classification).  Returns the
    bundle — pass ``ray.put(bundle)`` to ``featurize(lexicons_ref=...)``.
    Words classified here count into ``myClassCnt`` per document.
    """
    import copy

    from tscan_ray.text.lexicons import default_lexicons

    import itertools

    from tscan_ray.text import lexicons as _lexmod

    lex = copy.deepcopy(default_lexicons())
    # a deepcopy keeps the source bundle's memo token; issue a fresh one
    # so the word-analysis memo cannot serve stale entries
    lex.memo_token = next(_lexmod._GEN_COUNTER)
    if hasattr(wordlist, "column_names"):  # pyarrow Table
        words = wordlist.column("word").to_pylist()
        labels = (wordlist.column("classification").to_pylist()
                  if "classification" in wordlist.column_names
                  else [classification] * len(words))
        mapping = dict(zip(words, labels))
    elif hasattr(wordlist, "columns"):  # pandas DataFrame
        words = wordlist["word"].tolist()
        labels = (wordlist["classification"].tolist()
                  if "classification" in wordlist.columns
                  else [classification] * len(words))
        mapping = dict(zip(words, labels))
    elif isinstance(wordlist, dict):
        mapping = dict(wordlist)
    else:
        mapping = {w: classification for w in wordlist}
    lex.my_classification = {str(k).lower(): str(v) for k, v in mapping.items()}
    return lex
