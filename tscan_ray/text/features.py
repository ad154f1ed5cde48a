"""Per-document T-scan feature computation (the fused word→sentence→document fold).

A caption/document is ONE row; the reference's 4-level containment
hierarchy (wordStats → sentStats → parStats → docStats, reference
include/tscan/stats.h:30-108) collapses into this pure function executed
inside a ``map_batches`` actor — no shuffle is ever needed for the
linguistic features (SURVEY.md §7.0).

Reference semantics mirrored here (file:line citations inline):

* word analysis  = wordStats ctor        (src/tscan.cxx:1669-1802)
* CGN props      = setCGNProps           (src/wordstats.cxx:144-249)
* common fold    = setCommonCounts       (src/sentstats.cxx:9-238)
* freq rollup    = sentStats/parStats/docStats normalizations
                   (src/tscan.cxx:2829-2864, 3026-3034, 3112-3122)
* prev-sentence overlap buffers          (src/tscan.cxx:2092-2103,
                   src/wordstats.cxx:313-360) — reset per paragraph
                   (parStats ctor src/tscan.cxx:3014-3035 starts prev=0)
* 50-word doc overlap ring buffer        (src/tscan.cxx:3039-3090)
* MTLD families  = calculate_MTLDs       (src/tscan.cxx:1877-1975)
* rarity         = docStats::rarity      (src/docstats.cxx:9-18)
* LiNT           = structStats emit      (src/structstats.cxx:1005-1040)

Deliberate, documented divergences (deterministic self-contained
annotators replace NLP services, SURVEY.md §7.0): POS/lemma/morphemes
come from the packaged lexicon tagger (unknown words default to N/noun);
verb-form classification (classifyVerb, src/Alpino.cxx:640-726) is
approximated lexically (copula/modal/time-aux lemma sets, else
HEAD_VERB); parse-tree features (dependency distances, d-level, clause
counts) are produced by the deterministic dependency annotator when its
columns are present, else NaN.
"""

from __future__ import annotations

import copy
import math
from collections import Counter
from dataclasses import dataclass, field

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.text import depparse, kernels
from tscan_ray.text.depparse import DD_TYPES, SentParse
from tscan_ray.text.kernels import NA, density, proportion
from tscan_ray.text.lexicons import (
    NEG_MINUS,
    NEG_MORPHS,
    NEGATIVES,
    NOMINAL_MORPHS,
    NOMINAL_TAILS,
    Lexicons,
    PosInfo,
    default_lexicons,
)
from tscan_ray.text.tokenize import is_punct, segment

# verb-form lexical approximation of classifyVerb (src/Alpino.cxx:640-726)
_COPULA_LEMMAS = frozenset({"zijn", "worden", "blijven", "lijken", "heten", "is"})
_MODAL_LEMMAS = frozenset({"kunnen", "moeten", "mogen", "willen", "zullen"})
_TIME_LEMMAS = frozenset({"hebben", "gaan", "komen"})

# tiny deterministic NER gazetteer (replaces Frog NER, src/ner.cxx:8-41)
_NER_PER = frozenset({"jan", "marie", "piet", "anna", "sophie", "daan"})
_NER_LOC = frozenset({"amsterdam", "rotterdam", "utrecht", "nederland", "europa"})
_NER_ORG = frozenset({"philips", "shell", "rabobank"})
# NER -> SEM fallback (src/ner.cxx:85-100)
_NER_TO_SEM = {"PER": "human", "ORG": "institut", "LOC": "place"}

_PRON_PERS_TYPES = frozenset({"pers", "refl", "pr", "bez"})
_PRON_EXCLUDED = frozenset({"men", "er", "het"})

_DEFAULT_POS = PosInfo("N", "", ())  # unknown word -> noun, lemma = lword


@dataclass
class WordAnn:
    """Resolved per-word annotation — the engine's wordStats record."""

    word: str
    lword: str
    lemma: str
    tag: str
    conjtype: str = ""  # VG: "neven" | "onder" (drives clause split + d-level)
    prop: str = ""  # ISLET ISNAME ISVD ISINF ISOD ISPVTGW ISPVVERL ISPPRON1/2/3 ISAANW
    position: str = ""  # NOMIN PRENOM VRIJ
    wwform: str = ""  # HEAD_VERB PASSIVE_VERB MODAL_VERB TIME_VERB COPULA
    morphemes: tuple[str, ...] = ()
    full_lemma: str = ""
    char_cnt: int = 0
    morph_cnt: int = 0
    is_content: bool = False
    is_content_strict: bool = False
    is_prop_neg: bool = False
    is_morph_neg: bool = False
    is_pers_ref: bool = False
    is_pron_ref: bool = False
    archaic: bool = False
    is_nominal: bool = False
    is_imperative: bool = False
    on_stoplist: bool = False
    conn_type: str = ""
    sit_type: str = ""
    sem_type: str = ""
    ner: str = ""
    intensify_type: str = ""
    formal_type: str = ""
    general_noun_type: str = ""
    general_verb_type: str = ""
    adverb_type: str = ""
    adverb_subtype: str = ""
    afk_type: str = ""
    my_class: str = ""
    top_freq: int = 0  # 0 = notFound, else band 1000..20000
    word_freq: int = 0
    word_freq_log: float = NA
    lemma_freq: int = 0
    lemma_freq_log: float = NA
    prevalence_p: float = NA
    prevalence_z: float = NA
    f50: bool = False
    f65: bool = False
    f77: bool = False
    f80: bool = False
    word_overlap_cnt: int = 0
    lemma_overlap_cnt: int = 0
    lprob_fwd: float = NA  # log10 P(w | prev)  (W26; Wopr lprob10 stand-in)
    lprob_bwd: float = NA  # log10 P(w | next)

    def is_overlap_candidate(self) -> bool:
        # reference src/wordstats.cxx:313-331
        return (
            (self.tag == "VNW" and self.prop != "ISAANW")
            or self.tag == "N"
            or self.prop == "ISNAME"
            or (self.tag == "WW" and self.wwform == "HEAD_VERB")
        )


# Per-process memo of the context-independent word analysis: natural text
# reuses a small vocabulary, so the ~50 lexicon probes per token run once
# per (word, sentence-initial) pair and later occurrences pay one shallow
# dataclass copy.  Context-dependent fields (overlap counts, logprobs,
# conn/sit types from multiword scans, imperative) are mutated only on the
# per-occurrence copy — the cached template stays pristine.
_ANALYZE_CACHE: dict = {}
_ANALYZE_CACHE_LIMIT = 250_000  # bound worker heap on open-vocabulary data


def analyze_word(token: str, sent_initial: bool, lex: Lexicons) -> WordAnn:
    """Word-level analysis: the wordStats ctor (src/tscan.cxx:1669-1802).
    Memoized per (lexicon generation, token, sent_initial); returns a
    fresh copy.  The key uses the bundle's memo_token, not id() — a
    freed bundle's address can be reused, which would serve stale
    analyses from the previous lexicon."""
    ck = (lex.memo_token, token, sent_initial)
    tmpl = _ANALYZE_CACHE.get(ck)
    if tmpl is None:
        tmpl = _analyze_word_uncached(token, sent_initial, lex)
        if len(_ANALYZE_CACHE) >= _ANALYZE_CACHE_LIMIT:
            _ANALYZE_CACHE.clear()
        _ANALYZE_CACHE[ck] = tmpl
    return copy.copy(tmpl)


def _analyze_word_uncached(token: str, sent_initial: bool, lex: Lexicons) -> WordAnn:
    lword = token.lower()
    if is_punct(token):
        w = WordAnn(word=token, lword=lword, lemma=token, tag="LET", prop="ISLET")
        return w

    info = lex.pos.get(lword, None)
    is_name = token[0].isupper() and (not sent_initial or info is None)
    if is_name:
        ann = WordAnn(
            word=token, lword=lword, lemma=token, tag="SPEC", prop="ISNAME",
            morphemes=(lword,),
        )
        ner = (
            "PER" if lword in _NER_PER
            else "LOC" if lword in _NER_LOC
            else "ORG" if lword in _NER_ORG
            else "MISC"
        )
        ann.ner = ner
        # name sem lookup is by word (src/tscan.cxx:1337-1464); fall back to NER
        ann.sem_type = lex.noun_sem.get(lword) or _NER_TO_SEM.get(ner, "")
    else:
        if info is None:
            info = PosInfo("N", lword, (lword,))
        ann = WordAnn(
            word=token, lword=lword, lemma=info.lemma, tag=info.tag,
            morphemes=info.morphemes or (lword,),
        )
        _set_cgn_props(ann, info)
        _set_sem_type(ann, lex)
        if ann.tag == "VG":
            ann.conjtype = info.feat("conjtype")

    ann.char_cnt = len(token)
    ann.morph_cnt = max(1, len(ann.morphemes))

    if ann.tag == "WW":
        ann.wwform = _classify_verb(ann)

    # negation (src/wordstats.cxx:274-305)
    ann.is_prop_neg = lword in NEGATIVES or (
        ann.tag == "BW" and lword in ("moeilijk", "weg")
    )
    ann.is_morph_neg = _check_morph_neg(ann)

    # content predicates (src/wordstats.cxx:17-33)
    if ann.tag == "BW":
        at = lex.adverbs.get(lword)
        if at:
            ann.adverb_type, ann.adverb_subtype = at
    ann.is_content = _check_content(ann, strict=False)
    ann.is_content_strict = _check_content(ann, strict=True)

    # nominalization (src/wordstats.cxx:59-138; morph rules only — the
    # Alpino verb-under-NP rule needs the parse annotation)
    ann.is_nominal = _check_nominal(ann)

    # lexicon families
    if ann.tag in ("VG", "VZ", "BW"):
        ann.conn_type = lex.conn_single.get(ann.lemma, "")
    ann.sit_type = lex.sit_single.get(ann.lemma, "")
    ann.intensify_type = lex.intensify.get(ann.lemma, "")
    formal = kernels.find_inflected(lex.formal, ann.lemma)
    ann.formal_type = formal or ""
    if ann.tag == "N":
        ann.general_noun_type = lex.general_nouns.get(ann.lemma, "")
    if ann.tag == "WW":
        ann.general_verb_type = lex.general_verbs.get(ann.lemma, "")
    if ann.tag in ("N", "SPEC"):
        ann.afk_type = lex.afkos.get(lword, "")
    ann.on_stoplist = ann.lemma in lex.stop_lemmata
    ann.my_class = lex.my_classification.get(ann.lemma, "")

    # frequency features (src/tscan.cxx:1597-1667)
    ann.top_freq = lex.top_freq.get(lword, 0)
    ann.word_freq = lex.word_freq.get(lword, 0)
    ann.word_freq_log = kernels.freq_log(ann.word_freq, lex.word_total)
    lf = lex.lemma_freq.get(ann.full_lemma) if ann.full_lemma else None
    if lf is None:
        lf = lex.lemma_freq.get(ann.lemma.lower(), 0)
    ann.lemma_freq = lf
    ann.lemma_freq_log = kernels.freq_log(ann.lemma_freq, lex.lemma_total)
    prev = lex.prevalence.get(ann.lemma.lower())
    if prev:
        ann.prevalence_p, ann.prevalence_z = prev
    staph = lex.staph_freq.get(lword)
    if staph is not None:
        ann.f50 = staph <= 50
        ann.f65 = staph <= 65
        ann.f77 = staph <= 77
        ann.f80 = staph <= 80

    ann.is_pron_ref = (
        ann.prop == "ISPPRON3" and ann.tag == "VNW"
    ) or ann.prop == "ISAANW"
    ann.is_pers_ref = (
        ann.sem_type == "human"
        or ann.ner == "PER"
        or ann.prop in ("ISPPRON1", "ISPPRON2", "ISPPRON3")
    )
    return ann


def _set_cgn_props(ann: WordAnn, info: PosInfo) -> None:
    """setCGNProps (src/wordstats.cxx:144-249)."""
    if ann.tag == "WW":
        wvorm = info.feat("wvorm")
        if wvorm in ("inf", "vd", "od"):
            ann.prop = {"inf": "ISINF", "vd": "ISVD", "od": "ISOD"}[wvorm]
            pos = info.feat("positie")
            ann.position = {"vrij": "VRIJ", "prenom": "PRENOM", "nom": "NOMIN"}.get(
                pos, "VRIJ"
            )
        elif wvorm == "pv":
            tijd = info.feat("pvtijd")
            if tijd == "tgw":
                ann.prop = "ISPVTGW"
            elif tijd == "verl":
                ann.prop = "ISPVVERL"
            elif tijd == "conj":
                ann.prop = "ISSUBJ"
    elif ann.tag == "VNW":
        if ann.lword not in _PRON_EXCLUDED:
            vwtype = info.feat("vwtype")
            cas = info.feat("naamval")
            ann.archaic = cas in ("gen", "dat")
            if vwtype in _PRON_PERS_TYPES:
                persoon = info.feat("persoon")
                if persoon.startswith("1"):
                    ann.prop = "ISPPRON1"
                elif persoon.startswith("2"):
                    ann.prop = "ISPPRON2"
                elif persoon.startswith("3"):
                    ann.prop = "ISPPRON3"
            elif vwtype == "aanw":
                ann.prop = "ISAANW"
    elif ann.tag == "LID":
        ann.archaic = info.feat("naamval") in ("gen", "dat")


def _set_sem_type(ann: WordAnn, lex: Lexicons) -> None:
    """checkSemProps (src/tscan.cxx:1337-1464): noun via lemma; adj with
    inflection fallback; verb via full_lemma then lemma."""
    if ann.tag == "N":
        ann.sem_type = lex.noun_sem.get(ann.lemma, "UNFOUND_NOUN")
    elif ann.tag == "ADJ":
        st = kernels.find_inflected(lex.adj_sem, ann.lemma)
        ann.sem_type = st if st is not None else "UNFOUND_ADJ"
    elif ann.tag == "WW":
        st = lex.verb_sem.get(ann.full_lemma) if ann.full_lemma else None
        if st is None:
            st = lex.verb_sem.get(ann.lemma)
        ann.sem_type = st if st is not None else "UNFOUND_VERB"


def _classify_verb(ann: WordAnn) -> str:
    """Lexical approximation of classifyVerb (src/Alpino.cxx:640-726)."""
    if ann.lemma in _COPULA_LEMMAS:
        return "COPULA"
    if ann.lemma in _MODAL_LEMMAS:
        return "MODAL_VERB"
    if ann.lemma in _TIME_LEMMAS:
        return "TIME_VERB"
    return "HEAD_VERB"


def _check_morph_neg(ann: WordAnn) -> bool:
    """checkMorphNeg (src/wordstats.cxx:288-305)."""
    m1 = ann.morphemes[0] if ann.morphemes else ""
    m2 = ann.morphemes[1] if len(ann.morphemes) > 1 else ""
    if m1 in NEG_MORPHS and m2 != "en" and m2 != "":
        return True
    return any(m in ann.word for m in NEG_MINUS)


def _check_content(ann: WordAnn, strict: bool) -> bool:
    """checkContent (src/wordstats.cxx:17-33)."""
    if ann.tag == "WW":
        return ann.wwform == "HEAD_VERB"
    if ann.tag == "BW":
        # strict: only MANNER adverbs are content (src/adverb.cxx:57-59)
        return (not strict) or ann.adverb_subtype == "MANNER"
    return ann.prop == "ISNAME" or ann.tag in ("N", "ADJ")


def _check_nominal(ann: WordAnn) -> bool:
    """checkNominal morph/tail rules (src/wordstats.cxx:59-138)."""
    if ann.tag == "N" and len(ann.morphemes) > 1:
        last = ann.morphemes[-1]
        if last in ("en", "s", "n"):
            last = ann.morphemes[-2]
        if last in NOMINAL_MORPHS:
            return True
        if len(last) > 4 and any(last.endswith(t) for t in NOMINAL_TAILS):
            return True
    if len(ann.morphemes) < 2 and len(ann.word) > 4:
        if any(ann.word.endswith(t) for t in NOMINAL_TAILS):
            return True
    return False


# ---------------------------------------------------------------------------
# Sentence / document fold
# ---------------------------------------------------------------------------

_COUNT_KEYS = (
    "wordCnt letCnt wordInclCnt nameCnt nameInclCnt contentCnt contentInclCnt "
    "contentStrictCnt contentStrictInclCnt nounCnt verbCnt adjCnt "
    "nounInclCnt verbInclCnt adjInclCnt vgCnt tswCnt specCnt bwCnt vnwCnt "
    "lidCnt twCnt vzCnt pastCnt presentCnt subjonctCnt pron1Cnt pron2Cnt "
    "pron3Cnt vdCnt infCnt odCnt passiveCnt modalCnt timeVCnt koppelCnt "
    "propNegCnt morphNegCnt multiNegCnt persRefCnt pronRefCnt archaicsCnt "
    "impCnt nominalCnt charCnt charCntExNames morphCnt morphCntExNames "
    "f50Cnt f65Cnt f77Cnt f80Cnt top1000Cnt top2000Cnt top3000Cnt top5000Cnt "
    "top10000Cnt top20000Cnt top1000ContentCnt top5000ContentCnt "
    "generalAdverbCnt specificAdverbCnt intensCnt intensBvbwCnt "
    "intensCombiCnt formalCnt formalMultiCnt generalNounCnt generalVerbCnt "
    "afkCnt stoplistCnt myClassCnt questCnt sentCnt "
    "tempConnCnt opsomWgConnCnt opsomZinConnCnt contrastConnCnt "
    "comparConnCnt causeConnCnt timeSitCnt causalSitCnt spaceSitCnt "
    "emoSitCnt prepExprCnt wordOverlapCnt lemmaOverlapCnt nerCnt "
    "humanCnt uncoveredNounCnt uncoveredAdjCnt uncoveredVerbCnt broadNounCnt "
    "smainCnt ssubCnt sv1Cnt clauseCnt correctedClauseCnt npCnt indefNpCnt "
    "npSizeSum npModCnt adjNpModCnt betrCnt dLevelGt4Cnt"
).split()

# broad-concrete noun semtypes (reference broadNounCnt: every covered noun
# type that is not abstract/undefined feeds conc_nw_ruim_p,
# src/structstats.cxx:1009)
_CONCRETE_BROAD = frozenset({
    "concrete_other", "human", "nonhuman", "artefact", "place", "time",
    "measure", "institut",
})

_SUM_KEYS = (
    "word_freq word_freq_n word_freq_strict word_freq_n_strict "
    "lemma_freq lemma_freq_n lemma_freq_strict lemma_freq_n_strict "
    "prevalenceP_sum prevalenceZ_sum prevalenceCovered "
    "prob_fwd_content prob_fwd_ex_names prob_fwd_content_ex_names "
    "prob_bwd_content prob_bwd_ex_names prob_bwd_content_ex_names"
).split()

_CONN_KEY = {
    "TEMPOREEL": "tempConnCnt",
    "OPSOMMEND_WG": "opsomWgConnCnt",
    "OPSOMMEND_ZIN": "opsomZinConnCnt",
    "CONTRASTIEF": "contrastConnCnt",
    "COMPARATIEF": "comparConnCnt",
    "CAUSAAL": "causeConnCnt",
}
_SIT_KEY = {
    "TIME_SIT": "timeSitCnt",
    "CAUSAL_SIT": "causalSitCnt",
    "SPACE_SIT": "spaceSitCnt",
    "EMO_SIT": "emoSitCnt",
}


@dataclass
class Fold:
    """Accumulated counters + unique-token maps (the structStats record)."""

    c: Counter = field(default_factory=Counter)
    s: dict[str, float] = field(default_factory=dict)
    unique_words: Counter = field(default_factory=Counter)
    unique_lemmas: Counter = field(default_factory=Counter)
    unique_names: Counter = field(default_factory=Counter)
    unique_contents: Counter = field(default_factory=Counter)
    unique_contents_strict: Counter = field(default_factory=Counter)
    words: list[WordAnn] = field(default_factory=list)
    parses: list[SentParse] = field(default_factory=list)
    surps: list[dict] = field(default_factory=list)  # per-sentence LM stats

    def __post_init__(self):
        for k in _SUM_KEYS:
            self.s.setdefault(k, 0.0)


def _multiword_scan(lowers: list[str], table: dict[str, str], max_n: int,
                    min_n: int = 2) -> list[tuple[int, int, str]]:
    """Greedy left-to-right longest-match n-gram scan (resolveMultiWord
    template, include/tscan/stats.h:966-991): returns (start, length, type)
    and skips past each match."""
    hits = []
    i = 0
    n = len(lowers)
    while i < n:
        matched = 0
        mtype = ""
        for k in range(min(max_n, n - i), min_n - 1, -1):
            gram = " ".join(lowers[i : i + k])
            t = table.get(gram)
            if t is not None:
                matched, mtype = k, t
                break
        if matched:
            hits.append((i, matched, mtype))
            i += matched
        else:
            i += 1
    return hits


def analyze_sentence(
    tokens: list[str],
    prev: Fold | None,
    lex: Lexicons,
    cfg: EngineConfig,
    lm=None,
) -> Fold:
    """Sentence-level analysis + fold (sentStats ctor, src/tscan.cxx:2126-2865)."""
    f = Fold()
    c = f.c
    anns = [analyze_word(t, i == 0, lex) for i, t in enumerate(tokens)]
    f.words = anns

    # separable-verb resolution (sentence context): a listed particle
    # elsewhere in the sentence gives the verb its full lemma, and the
    # full-lemma-first lookups (verb_sem, lemma_freq — reference
    # src/tscan.cxx:1430-1434, 1640-1650) re-run on the fresh copies
    if lex.separable_verbs:
        sent_words = {a.lword for a in anns}
        for a in anns:
            if a.tag != "WW":
                continue
            parts = lex.separable_verbs.get(a.lemma)
            if not parts:
                continue
            hit = sorted(parts & (sent_words - {a.lword}))
            if hit:
                a.full_lemma = hit[0] + a.lemma
                lf = lex.lemma_freq.get(a.full_lemma)
                if lf is not None:
                    a.lemma_freq = lf
                    a.lemma_freq_log = kernels.freq_log(lf, lex.lemma_total)
                _set_sem_type(a, lex)
                a.is_content = _check_content(a, False)
                a.is_content_strict = _check_content(a, True)

    # surprisal attach (W26/T13; Wopr stand-in — text/surprisal.py)
    if lm is not None:
        content_words = [(i, a.lword) for i, a in enumerate(anns) if a.prop != "ISLET"]
        for k, (i, w) in enumerate(content_words):
            prev_w = content_words[k - 1][1] if k > 0 else None
            next_w = content_words[k + 1][1] if k + 1 < len(content_words) else None
            anns[i].lprob_fwd = lm.logprob10(w, prev_w)
            anns[i].lprob_bwd = lm.logprob10_bwd(w, next_w)
        from tscan_ray.text.surprisal import sentence_stats

        fwd = sentence_stats([anns[i].lprob_fwd for i, _ in content_words])
        bwd = sentence_stats([anns[i].lprob_bwd for i, _ in content_words])
        f.surps.append({"fwd": fwd, "bwd": bwd})

    # previous-sentence overlap buffers (src/tscan.cxx:2092-2103)
    wordbuffer: list[str] = []
    lemmabuffer: list[str] = []
    if prev is not None:
        for pw in prev.words:
            if pw.is_overlap_candidate():
                wordbuffer.append(pw.lword)
                lemmabuffer.append(pw.lemma.lower())

    # multiword resolvers operate on lowercased surface words (conn/intensify/
    # formal/prep expr) or lemmas (situations)
    lowers = [a.lword for a in anns]
    lemmas = [a.lemma.lower() for a in anns]
    for start, length, t in _multiword_scan(lowers, lex.conn_multi, 3):
        anns[start].conn_type = t  # type assigned to expression head
    for start, length, t in _multiword_scan(lemmas, lex.sit_multi, 4):
        # reference: only last word of expression keeps the type
        # (src/tscan.cxx:2891-2908)
        anns[start + length - 1].sit_type = t
    intens_hits = _multiword_scan(lowers, lex.intensify_multi, 5)
    formal_hits = _multiword_scan(lowers, lex.formal_multi, 5)
    prep_hits = _multiword_scan(lowers, {g: "X" for g in lex.vzexpr}, 4)
    c["intensCombiCnt"] += len(intens_hits)
    c["intensCnt"] += len(intens_hits)
    c["formalMultiCnt"] += len(formal_hits)
    c["formalCnt"] += len(formal_hits)
    c["prepExprCnt"] += len(prep_hits)

    # parse-derived resolution pass (T7-T12; reduced deterministic parser)
    parse = depparse.parse_sentence(anns)
    f.parses.append(parse)
    if parse.imperative_idx >= 0:
        anns[parse.imperative_idx].is_imperative = True
    for key, val in (
        ("smainCnt", parse.smain_cnt), ("ssubCnt", parse.ssub_cnt),
        ("sv1Cnt", parse.sv1_cnt), ("clauseCnt", parse.clause_cnt),
        ("correctedClauseCnt", parse.corrected_clause_cnt),
        ("npCnt", parse.np_cnt), ("indefNpCnt", parse.indef_np_cnt),
        ("npSizeSum", parse.np_size_sum), ("npModCnt", parse.np_mod_cnt),
        ("adjNpModCnt", parse.adj_np_mod_cnt), ("betrCnt", parse.betr_cnt),
        ("dLevelGt4Cnt", parse.d_level_gt4),
    ):
        if val:
            c[key] += val

    question = False
    for ann in anns:
        if ann.lemma and ann.lemma[-1] == "?":
            question = True
        if prev is not None and ann.is_overlap_candidate():
            # getSentenceOverlap (src/wordstats.cxx:333-360)
            ann.word_overlap_cnt = kernels.argument_overlap_count(ann.lword, wordbuffer)
            ann.lemma_overlap_cnt = kernels.argument_overlap_count(
                ann.lemma.lower(), lemmabuffer
            )
        if ann.prop == "ISLET":
            c["letCnt"] += 1
            continue
        if ann.on_stoplist:
            c["stoplistCnt"] += 1
            _common_counts(f, ann)
            continue

        c["wordCnt"] += 1
        if ann.prop == "ISNAME":
            c["nameCnt"] += 1
        if ann.is_content:
            c["contentCnt"] += 1
        if ann.is_content_strict:
            c["contentStrictCnt"] += 1
        if ann.tag == "N":
            c["nounCnt"] += 1
        if ann.tag == "WW":
            c["verbCnt"] += 1
        if ann.tag == "ADJ":
            c["adjCnt"] += 1
        if ann.ner:
            c["nerCnt"] += 1
        if ann.sem_type == "human":
            c["humanCnt"] += 1
        if ann.sem_type == "UNFOUND_NOUN":
            c["uncoveredNounCnt"] += 1
        if ann.sem_type == "UNFOUND_ADJ":
            c["uncoveredAdjCnt"] += 1
        if ann.sem_type == "UNFOUND_VERB":
            c["uncoveredVerbCnt"] += 1
        if ann.sem_type in _CONCRETE_BROAD and (
            ann.tag == "N" or ann.prop == "ISNAME"
        ):
            c["broadNounCnt"] += 1

        _common_counts(f, ann)

        c["charCnt"] += ann.char_cnt
        c["morphCnt"] += ann.morph_cnt
        if ann.prop != "ISNAME":
            c["charCntExNames"] += ann.char_cnt
            c["morphCntExNames"] += ann.morph_cnt

        s = f.s
        if ann.is_content:
            s["word_freq"] += ann.word_freq_log
            s["lemma_freq"] += ann.lemma_freq_log
            if ann.prop != "ISNAME":
                s["word_freq_n"] += ann.word_freq_log
                s["lemma_freq_n"] += ann.lemma_freq_log
        if ann.is_content_strict:
            s["word_freq_strict"] += ann.word_freq_log
            s["lemma_freq_strict"] += ann.lemma_freq_log
            if ann.prop != "ISNAME":
                s["word_freq_n_strict"] += ann.word_freq_log
                s["lemma_freq_n_strict"] += ann.lemma_freq_log
        if not math.isnan(ann.prevalence_p):
            s["prevalenceP_sum"] += ann.prevalence_p
            s["prevalenceZ_sum"] += ann.prevalence_z
            s["prevalenceCovered"] += 1
        if not math.isnan(ann.lprob_fwd):
            # Wopr per-word sums (src/tscan.cxx:2855-2860 normalizers)
            if ann.is_content:
                s["prob_fwd_content"] += ann.lprob_fwd
                s["prob_bwd_content"] += ann.lprob_bwd
                if ann.prop != "ISNAME":
                    s["prob_fwd_content_ex_names"] += ann.lprob_fwd
                    s["prob_bwd_content_ex_names"] += ann.lprob_bwd
            if ann.prop != "ISNAME":
                s["prob_fwd_ex_names"] += ann.lprob_fwd
                s["prob_bwd_ex_names"] += ann.lprob_bwd

        if ann.is_nominal:
            c["nominalCnt"] += 1
        if ann.f50:
            c["f50Cnt"] += 1
        if ann.f65:
            c["f65Cnt"] += 1
        if ann.f77:
            c["f77Cnt"] += 1
        if ann.f80:
            c["f80Cnt"] += 1

        # cumulative top-k bands (fallthrough switch, src/tscan.cxx:2366-2400)
        if ann.top_freq:
            for band, key in ((1000, "top1000Cnt"), (2000, "top2000Cnt"),
                              (3000, "top3000Cnt"), (5000, "top5000Cnt"),
                              (10000, "top10000Cnt"), (20000, "top20000Cnt")):
                if ann.top_freq <= band:
                    c[key] += 1
            if ann.top_freq <= 1000 and ann.is_content:
                c["top1000ContentCnt"] += 1
            if ann.top_freq <= 5000 and ann.is_content:
                c["top5000ContentCnt"] += 1

    if question:
        c["questCnt"] = 1
    if c["morphNegCnt"] + c["propNegCnt"] > 1:
        c["multiNegCnt"] = 1
    c["sentCnt"] = 1 if c["wordCnt"] > 0 else 0
    return f


def _common_counts(f: Fold, ann: WordAnn) -> None:
    """setCommonCounts (src/sentstats.cxx:9-238) — on- and off-stoplist words."""
    c = f.c
    c["wordInclCnt"] += 1
    prop_key = {
        "ISNAME": "nameInclCnt", "ISPVVERL": "pastCnt", "ISPVTGW": "presentCnt",
        "ISSUBJ": "subjonctCnt", "ISPPRON1": "pron1Cnt", "ISPPRON2": "pron2Cnt",
        "ISPPRON3": "pron3Cnt", "ISVD": "vdCnt", "ISINF": "infCnt",
        "ISOD": "odCnt",
    }.get(ann.prop)
    if prop_key:
        c[prop_key] += 1
    if ann.prop == "ISNAME":
        f.unique_names[ann.lword] += 1
    tag_key = {
        "N": "nounInclCnt", "ADJ": "adjInclCnt", "WW": "verbInclCnt",
        "VG": "vgCnt", "TSW": "tswCnt", "SPEC": "specCnt", "BW": "bwCnt",
        "VNW": "vnwCnt", "LID": "lidCnt", "TW": "twCnt", "VZ": "vzCnt",
    }.get(ann.tag)
    if tag_key:
        c[tag_key] += 1
    ww_key = {
        "PASSIVE_VERB": "passiveCnt", "MODAL_VERB": "modalCnt",
        "TIME_VERB": "timeVCnt", "COPULA": "koppelCnt",
    }.get(ann.wwform)
    if ww_key:
        c[ww_key] += 1
    if ann.is_prop_neg:
        c["propNegCnt"] += 1
    if ann.is_morph_neg:
        c["morphNegCnt"] += 1
    if ann.is_pers_ref:
        c["persRefCnt"] += 1
    if ann.is_pron_ref:
        c["pronRefCnt"] += 1
    if ann.archaic:
        c["archaicsCnt"] += 1
    if ann.is_imperative:
        c["impCnt"] += 1
    f.unique_words[ann.lword] += 1
    f.unique_lemmas[ann.lemma] += 1
    c["wordOverlapCnt"] += ann.word_overlap_cnt
    c["lemmaOverlapCnt"] += ann.lemma_overlap_cnt
    if ann.is_content:
        c["contentInclCnt"] += 1
        f.unique_contents[ann.lword] += 1
    if ann.is_content_strict:
        c["contentStrictInclCnt"] += 1
        f.unique_contents_strict[ann.lword] += 1
    if ann.afk_type:
        c["afkCnt"] += 1
    if ann.adverb_type == "GENERAL":
        c["generalAdverbCnt"] += 1
    elif ann.adverb_type == "SPECIFIC":
        c["specificAdverbCnt"] += 1
    if ann.intensify_type:
        c["intensCnt"] += 1
        if ann.intensify_type == "BVBW":
            c["intensBvbwCnt"] += 1
    if ann.formal_type:
        c["formalCnt"] += 1
    if ann.general_noun_type:
        c["generalNounCnt"] += 1
    if ann.general_verb_type:
        c["generalVerbCnt"] += 1
    if ann.my_class:
        c["myClassCnt"] += 1
    if ann.conn_type in _CONN_KEY:
        c[_CONN_KEY[ann.conn_type]] += 1
    if ann.sit_type in _SIT_KEY:
        c[_SIT_KEY[ann.sit_type]] += 1


def merge_folds(folds: list[Fold]) -> Fold:
    """structStats::merge (src/structstats.cxx:1374-1695): commutative sums
    + map unions; word lists concatenated in document order."""
    out = Fold()
    for f in folds:
        out.c.update(f.c)
        for k in _SUM_KEYS:
            out.s[k] += f.s[k]
        out.unique_words.update(f.unique_words)
        out.unique_lemmas.update(f.unique_lemmas)
        out.unique_names.update(f.unique_names)
        out.unique_contents.update(f.unique_contents)
        out.unique_contents_strict.update(f.unique_contents_strict)
        out.words.extend(f.words)
        out.parses.extend(f.parses)
        out.surps.extend(f.surps)
    return out


def _doc_overlap(words: list[WordAnn], overlap_size: int) -> tuple[int, int]:
    """50-word sliding-window document overlap (src/tscan.cxx:3039-3090)."""
    non_punct = [w for w in words if w.prop != "ISLET"]
    if len(non_punct) < overlap_size:
        return 0, 0
    wordbuffer: list[str] = []
    lemmabuffer: list[str] = []
    wcnt = lcnt = 0
    for w in non_punct:
        lw, ll = w.lword, w.lemma.lower()
        if len(wordbuffer) >= overlap_size:
            if w.is_overlap_candidate():
                wcnt += kernels.argument_overlap_count(lw, wordbuffer)
                lcnt += kernels.argument_overlap_count(ll, lemmabuffer)
            wordbuffer.pop(0)
            lemmabuffer.pop(0)
        wordbuffer.append(lw)
        lemmabuffer.append(ll)
    return wcnt, lcnt


def _mtld_families(words: list[WordAnn]) -> dict[str, float]:
    """calculate_MTLDs (src/tscan.cxx:1877-1975)."""
    lists: dict[str, list[str]] = {
        "wrd": [], "lem": [], "inhwrd": [], "inhwrd_strict": [], "naam": [],
        "temp_conn": [], "reeks_wg_conn": [], "reeks_zin_conn": [],
        "contr_conn": [], "comp_conn": [], "cause_conn": [],
        "tijd_sit": [], "ruimte_sit": [], "cause_sit": [], "emo_sit": [],
    }
    conn_map = {
        "TEMPOREEL": "temp_conn", "OPSOMMEND_WG": "reeks_wg_conn",
        "OPSOMMEND_ZIN": "reeks_zin_conn", "CONTRASTIEF": "contr_conn",
        "COMPARATIEF": "comp_conn", "CAUSAAL": "cause_conn",
    }
    sit_map = {
        "TIME_SIT": "tijd_sit", "CAUSAL_SIT": "cause_sit",
        "SPACE_SIT": "ruimte_sit", "EMO_SIT": "emo_sit",
    }
    for w in words:
        if w.prop == "ISLET":
            continue
        lists["wrd"].append(w.lword)
        lists["lem"].append(w.lemma.lower())
        if w.is_content:
            lists["inhwrd"].append(w.lword)
        if w.is_content_strict:
            lists["inhwrd_strict"].append(w.lword)
        if w.prop == "ISNAME":
            lists["naam"].append(w.lword)
        ck = conn_map.get(w.conn_type)
        if ck:
            lists[ck].append(w.lword)
        sk = sit_map.get(w.sit_type)
        if sk:
            lists[sk].append(w.lemma)
    out = {f"MTLD_{k}": kernels.average_mtld(v) for k, v in lists.items()}
    # combined connective MTLD excludes reeks_wg (src/tscan.cxx:1963-1974)
    all_conn = (lists["temp_conn"] + lists["reeks_zin_conn"] + lists["contr_conn"]
                + lists["comp_conn"] + lists["cause_conn"])
    out["MTLD_alle_conn"] = kernels.average_mtld(all_conn)
    return out


def featurize_document(
    text: str,
    lex: Lexicons | None = None,
    cfg: EngineConfig = DEFAULT_CONFIG,
    lm=None,
) -> dict[str, float]:
    """Compute the full document feature vector for one text.

    The docStats ctor (src/tscan.cxx:3092-3127): paragraphs of sentences,
    prev-sentence pointer reset per paragraph, merge-then-normalize.
    ``lm`` is the surprisal lookup LM (default: unigram from the packaged
    lexicon; pass a corpus-fitted BigramLM for real context sensitivity).
    Returns a flat dict (stable key set = the output schema).
    """
    lex = lex or default_lexicons()
    if lm is None:
        from tscan_ray.text.surprisal import default_lm

        lm = default_lm()
    paragraphs = segment(text)
    sent_folds: list[Fold] = []
    for para in paragraphs:
        prev: Fold | None = None  # prev resets per paragraph (src/tscan.cxx:3018)
        for sent_tokens in para:
            f = analyze_sentence(sent_tokens, prev, lex, cfg, lm=lm)
            prev = f
            sent_folds.append(f)
    doc = merge_folds(sent_folds)
    c, s = doc.c, doc.s

    out: dict[str, float] = {}
    # raw counts (ints)
    for k in _COUNT_KEYS:
        out[k] = int(c[k])
    out["parCnt"] = len(paragraphs)

    # per-structure proportions (reference sentDifficulties/wordDifficulties)
    out["Wrd_per_zin"] = proportion(c["wordCnt"], c["sentCnt"])
    out["Zin_per_wrd"] = proportion(c["sentCnt"], c["wordCnt"])
    out["Let_per_wrd"] = proportion(c["charCnt"], c["wordCnt"])
    out["Let_per_wrd_zn"] = proportion(c["charCntExNames"], c["wordCnt"] - c["nameCnt"])
    out["Morf_per_wrd"] = proportion(c["morphCnt"], c["wordCnt"])
    out["Morf_per_wrd_zn"] = proportion(c["morphCntExNames"], c["wordCnt"] - c["nameCnt"])

    # TTRs (src/structstats.cxx:462-474 emit proportion(unique, incl))
    out["TTR_wrd"] = proportion(len(doc.unique_words), c["wordInclCnt"])
    out["TTR_lem"] = proportion(len(doc.unique_lemmas), c["wordInclCnt"])
    out["TTR_namen"] = proportion(len(doc.unique_names), c["nameInclCnt"])
    out["TTR_inhwrd"] = proportion(len(doc.unique_contents), c["contentInclCnt"])
    out["TTR_inhwrd_strict"] = proportion(
        len(doc.unique_contents_strict), c["contentStrictInclCnt"]
    )

    out.update(_mtld_families(doc.words))

    # frequency rollups (src/tscan.cxx:3114-3122: merged sums / merged counts)
    out["Wrd_freq_log"] = proportion(s["word_freq"], c["contentCnt"])
    out["Lem_freq_log"] = proportion(s["lemma_freq"], c["contentCnt"])
    out["Wrd_freq_zn_log"] = proportion(s["word_freq_n"], c["contentCnt"] - c["nameCnt"])
    out["Lem_freq_zn_log"] = proportion(s["lemma_freq_n"], c["contentCnt"] - c["nameCnt"])
    out["Wrd_freq_log_strikt"] = proportion(s["word_freq_strict"], c["contentStrictCnt"])
    out["Lem_freq_log_strikt"] = proportion(s["lemma_freq_strict"], c["contentStrictCnt"])
    out["Wrd_freq_zn_log_strikt"] = proportion(
        s["word_freq_n_strict"], c["contentStrictCnt"] - c["nameCnt"]
    )
    out["Lem_freq_zn_log_strikt"] = proportion(
        s["lemma_freq_n_strict"], c["contentStrictCnt"] - c["nameCnt"]
    )
    out["Prev_p"] = proportion(s["prevalenceP_sum"], s["prevalenceCovered"])
    out["Prev_z"] = proportion(s["prevalenceZ_sum"], s["prevalenceCovered"])
    out["Prev_coverage"] = proportion(s["prevalenceCovered"], c["wordCnt"])

    # densities / proportions over word count
    wc = c["wordCnt"]
    out["Inhwrd_d"] = density(c["contentCnt"], wc)
    out["Inhwrd_dz"] = density(c["contentStrictCnt"], wc)
    out["Naam_d"] = density(c["nameCnt"], wc)
    out["Pers_ref_d"] = density(c["persRefCnt"], wc)
    out["Pers_vnw_d"] = density(c["pron1Cnt"] + c["pron2Cnt"] + c["pron3Cnt"], wc)
    out["Alg_nw_d"] = density(c["generalNounCnt"], wc)
    out["Alg_ww_d"] = density(c["generalVerbCnt"], wc)
    out["Nom_d"] = density(c["nominalCnt"], wc)
    out["Ontk_tot_d"] = density(c["propNegCnt"] + c["morphNegCnt"], wc)
    out["Intens_d"] = density(c["intensCnt"], wc)
    out["Formeel_d"] = density(c["formalCnt"], wc)
    out["Conn_d"] = density(
        c["tempConnCnt"] + c["opsomWgConnCnt"] + c["opsomZinConnCnt"]
        + c["contrastConnCnt"] + c["comparConnCnt"] + c["causeConnCnt"], wc
    )
    out["Vzexpr_d"] = density(c["prepExprCnt"], wc)
    out["Arch_d"] = density(c["archaicsCnt"], wc)
    out["Afk_d"] = density(c["afkCnt"], wc)

    # top-k band proportions (src/structstats.cxx freq emit)
    for band in (1000, 2000, 3000, 5000, 10000, 20000):
        out[f"Freq{band}"] = proportion(c[f"top{band}Cnt"], wc)
    out["Freq50_staph"] = proportion(c["f50Cnt"], wc)
    out["Freq65_staph"] = proportion(c["f65Cnt"], wc)
    out["Freq77_staph"] = proportion(c["f77Cnt"], wc)
    out["Freq80_staph"] = proportion(c["f80Cnt"], wc)

    # overlap features (T5 sentence-lag, T6 doc window)
    out["Wrd_overlap_sent"] = int(c["wordOverlapCnt"])
    out["Lem_overlap_sent"] = int(c["lemmaOverlapCnt"])
    dw, dl = _doc_overlap(doc.words, cfg.overlap_size)
    out["Wrd_overlap_doc"] = dw
    out["Lem_overlap_doc"] = dl

    # rarity (src/docstats.cxx:9-18)
    out["Rar_index"] = kernels.rarity(dict(doc.unique_lemmas), cfg.rarity_level)

    # --- parse-derived features (T7-T12 via the reduced parser) -----------
    # per-type dependency-length means: doc pools the map-unioned distance
    # bags (MMtoString per type, src/Alpino.cxx:29-42)
    pooled: dict[str, list[int]] = {}
    for p in doc.parses:
        for t, vals in p.distances.items():
            pooled.setdefault(t, []).extend(vals)
    for t in DD_TYPES:
        vals = pooled.get(t)
        out[f"AL_{t.lower()}"] = (sum(vals) / len(vals)) if vals else NA
    # doc AL_gem / AL_max are MEANS OF SENTENCE means/maxes
    # (src/structstats.cxx:28-54), not pooled means
    out["AL_gem"] = depparse.doc_mean_al([p.al_gem for p in doc.parses])
    al_max = depparse.doc_mean_al([p.al_max for p in doc.parses])
    out["AL_max"] = al_max

    # D-level (sentinel merge src/structstats.cxx:1620-1625)
    dlevel_sum = depparse.merge_d_level([p.d_level for p in doc.parses])
    out["Dlevel"] = dlevel_sum
    out["Dlevel_per_zin"] = (
        proportion(dlevel_sum, c["sentCnt"]) if dlevel_sum >= 0 else NA
    )
    out["Dlevel_gt4_prop"] = proportion(c["dLevelGt4Cnt"], c["sentCnt"])

    # clause / embedding measures (src/sentstats.cxx:684-691 counts)
    out["Bijzin_per_zin"] = proportion(c["ssubCnt"], c["sentCnt"])
    out["Pv_per_zin"] = proportion(c["clauseCnt"], c["sentCnt"])
    out["Wrd_per_dz"] = proportion(c["wordCnt"], c["correctedClauseCnt"])

    # NP stats (T11)
    out["NP_d"] = density(c["npCnt"], wc)
    out["NP_size"] = proportion(c["npSizeSum"], c["npCnt"])
    out["Indef_np_p"] = proportion(c["indefNpCnt"], c["npCnt"])
    out["Bijv_bep_d"] = density(c["npModCnt"], wc)
    out["Betr_bijzin_per_zin"] = proportion(c["betrCnt"], c["sentCnt"])

    # --- surprisal (W26/T13; doc = mean over sentences of the sentence
    #     metrics, reference emits proportion(sum, sentCnt)) ---------------
    n_sent = c["sentCnt"]
    for direction in ("fwd", "bwd"):
        for metric, out_name in (
            ("avg_prob10", f"Avg_prob10_{direction}"),
            ("entropy", f"Entropy_{direction}"),
            ("perplexity", f"Perplexity_{direction}"),
            ("entropy_norm", f"Entropy_{direction}_norm"),
            ("perplexity_norm", f"Perplexity_{direction}_norm"),
        ):
            vals = [sp[direction][metric] for sp in doc.surps
                    if not math.isnan(sp[direction][metric])]
            out[out_name] = proportion(sum(vals), n_sent) if vals else NA
    out["Avg_prob10_fwd_content"] = proportion(s["prob_fwd_content"], c["contentCnt"])
    out["Avg_prob10_bwd_content"] = proportion(s["prob_bwd_content"], c["contentCnt"])
    out["Avg_prob10_fwd_ex_names"] = proportion(
        s["prob_fwd_ex_names"], c["wordCnt"] - c["nameCnt"])
    out["Avg_prob10_bwd_ex_names"] = proportion(
        s["prob_bwd_ex_names"], c["wordCnt"] - c["nameCnt"])
    out["Avg_prob10_fwd_content_ex_names"] = proportion(
        s["prob_fwd_content_ex_names"], c["contentCnt"] - c["nameCnt"])
    out["Avg_prob10_bwd_content_ex_names"] = proportion(
        s["prob_bwd_content_ex_names"], c["contentCnt"] - c["nameCnt"])

    # --- LiNT, full inputs (src/structstats.cxx:1005-1040) ----------------
    wrd_freq_log_zn_corr = proportion(s["word_freq_n"], c["contentCnt"] - c["nameCnt"])
    bijv_bep_dz_zbijzin = proportion(
        max(0, c["npModCnt"] - c["betrCnt"]), c["correctedClauseCnt"]
    )
    inhwrd_dz_zonder_abw = proportion(
        c["contentStrictInclCnt"], c["correctedClauseCnt"]
    )
    conc_nw_ruim_p = proportion(
        c["broadNounCnt"], c["nounCnt"] + c["nameCnt"] - c["uncoveredNounCnt"]
    )
    s1, l1, s2, l2 = kernels.lint_scores(
        wrd_freq_log_zn_corr, bijv_bep_dz_zbijzin, out["Alg_nw_d"], al_max,
        inhwrd_dz_zonder_abw, conc_nw_ruim_p,
    )
    out["LiNT_score1"] = s1
    out["LiNT_level1"] = l1
    out["LiNT_score2"] = s2
    out["LiNT_level2"] = l2
    return out


def feature_names() -> list[str]:
    """Stable output schema (computed once from an empty document)."""
    return list(featurize_document("x .").keys())
