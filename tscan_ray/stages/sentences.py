"""Sentence-level exploded output (the reference's sentence CSV, S4).

One output row per sentence with the sentence-scoped measures the
reference emits at that level (reference src/structstats.cxx:89-121 row
emit; sentence counters from the sentStats ctor): token counts, content/
name counts, parse-derived AL mean/max + D-level + clause counts, and
the LM sentence metrics.  Same no-shuffle shape as the word explode —
a document's sentences never span input rows.
"""

from __future__ import annotations

import math

import pyarrow as pa

import ray

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.text.features import analyze_sentence
from tscan_ray.text.lexicons import default_lexicons
from tscan_ray.text.tokenize import segment

_COUNTER_COLS = (
    "wordCnt letCnt nameCnt contentCnt contentStrictCnt nounCnt verbCnt "
    "adjCnt propNegCnt morphNegCnt questCnt smainCnt ssubCnt sv1Cnt "
    "clauseCnt correctedClauseCnt npCnt indefNpCnt betrCnt impCnt"
).split()


class SentenceExploder:
    def __init__(
        self,
        text_column: str,
        id_columns: list[str],
        cfg: EngineConfig = DEFAULT_CONFIG,
        lexicons_ref=None,
        lm_ref=None,
        annotations_column: str | None = None,
    ):
        self.text_column = text_column
        self.id_columns = id_columns
        self.cfg = cfg
        self.annotations_column = annotations_column
        self.lex = (
            ray.get(lexicons_ref) if lexicons_ref is not None else default_lexicons()
        )
        if lm_ref is not None:
            self.lm = ray.get(lm_ref)
        else:
            from tscan_ray.text.surprisal import default_lm

            self.lm = default_lm()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        ids = {c: batch.column(c).to_pylist() for c in self.id_columns}
        out: dict[str, list] = {c: [] for c in self.id_columns}
        out.update({"par_idx": [], "sent_idx": [], "n_tokens": []})
        for c in _COUNTER_COLS:
            out[c] = []
        for c in ("al_gem", "al_max", "d_level", "avg_prob10_fwd",
                  "entropy_fwd", "perplexity_fwd"):
            out[c] = []
        ann_json = None
        if (self.annotations_column is not None
                and self.annotations_column in batch.column_names):
            ann_json = batch.column(self.annotations_column).to_pylist()
        for row, text in enumerate(texts):
            pre_doc = tree_lookup = None
            if ann_json is not None and ann_json[row]:
                from tscan_ray.sources.folia import annotations_from_json

                pre_doc, tree_lookup = annotations_from_json(ann_json[row])
            paragraphs = (pre_doc if pre_doc is not None
                          else segment(text or ""))
            for pi, para in enumerate(paragraphs):
                prev = None  # prev-sentence pointer resets per paragraph
                for si, sent in enumerate(para):
                    pre = sent if pre_doc is not None else None
                    toks = ([t.word for t in sent] if pre is not None
                            else sent)
                    tree = (tree_lookup(" ".join(toks))
                            if tree_lookup is not None else None)
                    f = analyze_sentence(toks, prev, self.lex, self.cfg,
                                         lm=self.lm, pre=pre,
                                         alpino_tree=tree)
                    prev = f
                    sent = toks
                    parse = f.parses[0]
                    surp = f.surps[0]["fwd"] if f.surps else {}
                    for c in self.id_columns:
                        out[c].append(ids[c][row])
                    out["par_idx"].append(pi)
                    out["sent_idx"].append(si)
                    out["n_tokens"].append(len(sent))
                    for c in _COUNTER_COLS:
                        out[c].append(int(f.c[c]))
                    out["al_gem"].append(parse.al_gem)
                    out["al_max"].append(parse.al_max)
                    out["d_level"].append(parse.d_level)
                    out["avg_prob10_fwd"].append(surp.get("avg_prob10", math.nan))
                    out["entropy_fwd"].append(surp.get("entropy", math.nan))
                    out["perplexity_fwd"].append(surp.get("perplexity", math.nan))
        arrays, names = [], []
        for c in self.id_columns:
            names.append(c)
            arrays.append(pa.array(out[c]))
        for name in ("par_idx", "sent_idx", "n_tokens"):
            names.append(name)
            arrays.append(pa.array(out[name], type=pa.int32()))
        for c in _COUNTER_COLS:
            names.append(c)
            arrays.append(pa.array(out[c], type=pa.int32()))
        names.append("d_level")
        arrays.append(pa.array(out["d_level"], type=pa.int32()))
        for c in ("al_gem", "al_max", "avg_prob10_fwd", "entropy_fwd",
                  "perplexity_fwd"):
            names.append(c)
            arrays.append(pa.array(out[c], type=pa.float64()))
        return pa.table(dict(zip(names, arrays)))


def explode_sentences(
    ds,
    text_column: str,
    id_columns: list[str],
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency=(1, 8),
    batch_size: int = 128,
    lexicons_ref=None,
    lm_ref=None,
    annotations_column: str | None = None,
):
    """One output row per sentence of ``text_column`` (actor-pool stage).

    ``annotations_column``: JSON annotation column (sources/folia) —
    rows with precomputed Frog/Alpino annotations bypass the heuristic
    tagger / reduced parser, like the featurizer and word table."""
    return ds.map_batches(
        SentenceExploder,
        fn_constructor_kwargs={
            "text_column": text_column,
            "id_columns": id_columns,
            "cfg": cfg,
            "lexicons_ref": lexicons_ref,
            "lm_ref": lm_ref,
            "annotations_column": annotations_column,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
