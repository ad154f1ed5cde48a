"""Word-level exploded output (the reference's word CSV, S4).

The reference writes one CSV row per word with the wordStats fields
(reference src/wordstats.cxx:381-407, emit per level
src/docstats.cxx:24-94).  The engine equivalent: explode each document
into one output row per token — a ``map_batches`` actor stage (lexicons
in ``__init__``) that turns N caption rows into ΣN_tokens word rows.
No shuffle: a document's words never span input rows.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.text import display as _d
from tscan_ray.text.lexicons import default_lexicons
from tscan_ray.text.tokenize import segment

# (name, arrow type, WordAnn attribute) — the word-level schema
_WORD_FIELDS = [
    ("word", pa.string(), "word"),
    ("lemma", pa.string(), "lemma"),
    ("tag", pa.string(), "tag"),
    ("prop", pa.string(), "prop"),
    ("wwform", pa.string(), "wwform"),
    ("sem_type", pa.string(), "sem_type"),
    ("conn_type", pa.string(), "conn_type"),
    ("ner", pa.string(), "ner"),
    ("char_cnt", pa.int32(), "char_cnt"),
    ("morph_cnt", pa.int32(), "morph_cnt"),
    ("is_content", pa.bool_(), "is_content"),
    ("is_content_strict", pa.bool_(), "is_content_strict"),
    ("is_nominal", pa.bool_(), "is_nominal"),
    ("is_prop_neg", pa.bool_(), "is_prop_neg"),
    ("is_morph_neg", pa.bool_(), "is_morph_neg"),
    ("position", pa.string(), "position"),
    ("sit_type", pa.string(), "sit_type"),
    ("is_pers_ref", pa.bool_(), "is_pers_ref"),
    ("is_pron_ref", pa.bool_(), "is_pron_ref"),
    ("archaic", pa.bool_(), "archaic"),
    ("is_imperative", pa.bool_(), "is_imperative"),
    # per-word argument overlap with the previous sentence
    # (wordStats::addMetrics word_overlap_count/lemma_overlap_count)
    ("word_overlap_cnt", pa.int32(), "word_overlap_cnt"),
    ("lemma_overlap_cnt", pa.int32(), "lemma_overlap_cnt"),
    ("top_freq", pa.int32(), "top_freq"),
    ("word_freq_log", pa.float64(), "word_freq_log"),
    ("lemma_freq_log", pa.float64(), "lemma_freq_log"),
    ("prevalence_p", pa.float64(), "prevalence_p"),
    ("prevalence_z", pa.float64(), "prevalence_z"),
    # Wopr columns of the reference word CSV (lprob10_fwd/bwd,
    # src/wordstats.cxx:668-676; NaN -> "NA"); NaN for punctuation and
    # for OOV words under an oov_missing LM (the -99 sentinel path)
    ("lprob_fwd", pa.float64(), "lprob_fwd"),
    ("lprob_bwd", pa.float64(), "lprob_bwd"),
]

# reference Dutch display columns (the word CSV / FoLiA metric
# vocabulary, text/display.py): name -> fn(WordAnn)
_DISPLAY_FIELDS = [
    ("property_nl", lambda a: _d.prop_nl(a.prop)),
    ("semtype_nl", lambda a: _d.semtype_nl(a.sem_type, a.tag)),
    ("connective_nl", lambda a: _d.conn_nl(a.conn_type)),
    ("situation_nl", lambda a: _d.sit_nl(a.sit_type)),
]


class WordExploder:
    """Explode a text column into one row per token (word-level S4)."""

    def __init__(
        self,
        text_column: str,
        id_columns: list[str],
        cfg: EngineConfig = DEFAULT_CONFIG,
        lexicons_ref=None,
        lm=None,
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
        if lm is None and lm_ref is not None:
            lm = ray.get(lm_ref)
        if lm is None:
            from tscan_ray.text.surprisal import default_lm

            lm = default_lm()
        self.lm = lm

    def __call__(self, batch: pa.Table) -> pa.Table:
        # full sentence-level analysis per sentence (analyze_sentence:
        # contextual passes — checkAls connectives, modifier demotion,
        # prev-sentence argument overlap, LM logprob attach — so the
        # word rows carry the same values the document fold counted;
        # the reference's word CSV is likewise emitted from the fully
        # analyzed wordStats, src/wordstats.cxx:381-407)
        from tscan_ray.text.features import analyze_sentence

        texts = batch.column(self.text_column).to_pylist()
        ann_json = None
        if (self.annotations_column is not None
                and self.annotations_column in batch.column_names):
            ann_json = batch.column(self.annotations_column).to_pylist()
        ids = {c: batch.column(c).to_pylist() for c in self.id_columns}
        out: dict[str, list] = {c: [] for c in self.id_columns}
        out.update({"par_idx": [], "sent_idx": [], "word_idx": []})
        for name, _, _ in _WORD_FIELDS:
            out[name] = []
        for name, _ in _DISPLAY_FIELDS:
            out[name] = []
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
                    fold = analyze_sentence(toks, prev, self.lex, self.cfg,
                                            lm=self.lm, pre=pre,
                                            alpino_tree=tree)
                    prev = fold
                    for wi, ann in enumerate(fold.words):
                        for c in self.id_columns:
                            out[c].append(ids[c][row])
                        out["par_idx"].append(pi)
                        out["sent_idx"].append(si)
                        out["word_idx"].append(wi)
                        for name, _, attr in _WORD_FIELDS:
                            out[name].append(getattr(ann, attr))
                        for name, fn in _DISPLAY_FIELDS:
                            out[name].append(fn(ann))
        arrays, names = [], []
        for c in self.id_columns:
            names.append(c)
            arrays.append(pa.array(out[c]))
        for name in ("par_idx", "sent_idx", "word_idx"):
            names.append(name)
            arrays.append(pa.array(out[name], type=pa.int32()))
        for name, typ, _ in _WORD_FIELDS:
            names.append(name)
            arrays.append(pa.array(out[name], type=typ))
        for name, _ in _DISPLAY_FIELDS:
            names.append(name)
            arrays.append(pa.array(out[name], type=pa.string()))
        return pa.table(dict(zip(names, arrays)))


def explode_words(
    ds,
    text_column: str,
    id_columns: list[str],
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency=(1, 8),
    batch_size: int = 256,
    lexicons_ref=None,
    lm_ref=None,
    annotations_column: str | None = None,
):
    """One output row per token of ``text_column`` (actor-pool stage).

    ``lm_ref``: ``ray.put`` handle of a corpus-fitted LM so word-level
    lprob_fwd/bwd come from the SAME model as the document-level
    surprisal aggregates (the reference feeds both CSV levels from one
    Wopr model); defaults to the packaged unigram LM."""
    return ds.map_batches(
        WordExploder,
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
