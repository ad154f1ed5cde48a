"""Real-format lexicon loaders (SURVEY S6) over the vendored published
data lists in ``tscan_ray/text/data/``.

The files are verbatim copies of the reference's published lexicon DATA
(reference ``data/*.lst|*.txt|*.data``) — word lists, not code.  The
loaders reimplement the reference's file formats:

* connector / situation lists — ``fill_connectors``
  (reference src/tscan.cxx:536-597): one entry per line; ``#`` comments;
  1-4 space-separated words; a single word may carry a TAB + CGN tag
  restriction (multiword entries may not).
* prep expressions — ``fill_vzexpr`` (src/tscan.cxx:599-648): 2-4 word
  phrases.
* formal lexicon — ``fill_formal`` (src/tscan.cxx:744-771): word TAB
  Dutch class name, mapped per Formal::classify (src/formal.cxx:40-58).
* adverbs — word TAB type TAB subtype, mapped per Adverb::classifyType /
  classifySubType (src/adverb.cxx:17-55).
* abbreviations — word TAB domain, mapped per Afk::classify
  (src/afk.cxx:29-52).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _lines(name: str) -> list[str]:
    with open(os.path.join(_DATA_DIR, name), encoding="utf-8") as fh:
        out = []
        for raw in fh:
            line = raw.lstrip("﻿").strip()
            if not line or line.startswith("#"):
                continue
            out.append(line)
        return out


@dataclass
class TaggedWordSet:
    """One connector/situation list: untagged entries match any CGN tag,
    tagged entries only their tag; 2-4-word entries go to ``multi``
    (space-joined), mirroring fill_connectors."""

    unass: set = field(default_factory=set)
    tagged: dict = field(default_factory=dict)  # tag -> set[lemma]
    multi: set = field(default_factory=set)

    def matches(self, lemma: str, tag: str) -> bool:
        """checkConnective / checkSituation membership: the tag-specific
        set first, then the UNASS set (src/tscan.cxx:1138-1180)."""
        ts = self.tagged.get(tag)
        if ts is not None and lemma in ts:
            return True
        return lemma in self.unass

    def add(self, entry: str, tag: str | None = None) -> None:
        if " " in entry:
            self.multi.add(entry)
        elif tag:
            self.tagged.setdefault(tag, set()).add(entry)
        else:
            self.unass.add(entry)


def read_tagged_words(name: str) -> TaggedWordSet:
    out = TaggedWordSet()
    for line in _lines(name):
        parts = line.split("\t")
        if len(parts) > 2:
            continue  # reference skips malformed lines
        entry = parts[0].strip()
        tag = parts[1].strip() if len(parts) == 2 else None
        if not entry or entry.count(" ") > 3:
            continue
        if tag and " " in entry:
            continue  # no tag info allowed for multiword entries
        out.add(entry, tag)
    return out


def read_vzexpr(name: str = "voorzetseluitdrukkingen.txt") -> set[str]:
    out: set[str] = set()
    for line in _lines(name):
        n = line.count(" ") + 1
        if 2 <= n <= 4:
            out.add(line)
    return out


# Dutch class name -> engine Formal enum label (src/formal.cxx:40-58);
# "afkorting" classifies INVALID in the reference, which no per-class or
# total formal counter ever matches (sentstats.cxx:200-245 switch) — so
# those entries are skipped outright.
_FORMAL_CLASSES = {
    "adjectief": "BVNW", "bijwoord": "BW", "voegwoord": "VGW",
    "voornaamwoord": "VNW", "voorzetsel": "VZ", "voorzetselgroep": "VZG",
    "werkwoord": "WW", "zelfstandig naamwoord": "ZNW",
}


def read_formal(name: str = "formal.data") -> tuple[dict, dict]:
    """(single-word lemma -> class, multiword phrase -> class)."""
    single: dict[str, str] = {}
    multi: dict[str, str] = {}
    for line in _lines(name):
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        word, cls = parts[0].strip(), _FORMAL_CLASSES.get(parts[1].strip().lower())
        if not word or cls is None:
            continue
        (multi if " " in word else single)[word] = cls
    return single, multi


_ADVERB_TYPES = {"algemeen": "GENERAL", "specifiek": "SPECIFIC"}
_ADVERB_SUBTYPES = {
    "ambigu": "AMBIGUOUS", "anaforisch": "ANAPHORIC", "graad": "GRADE",
    "kwantiteit": "QUANTITY", "modaal": "MODAL",
    "modaal partikel": "MODAL_PARTICLE", "negatie": "NEGATION",
    "relatiemarkering": "RELATION", "ruimte": "SPACE",
    "ruimte-tijd": "SPACE_TIME", "tijd": "TIME",
    "tussenwerpsel": "INTERJECTION", "wijze": "MANNER",
    "overig algemeen": "OTHER",
}


def read_adverbs(name: str = "adverbs.data") -> dict[str, tuple[str, str]]:
    out: dict[str, tuple[str, str]] = {}
    for line in _lines(name):
        parts = line.split("\t")
        if len(parts) != 3:
            continue
        word = parts[0].strip()
        typ = _ADVERB_TYPES.get(parts[1].strip())
        sub = _ADVERB_SUBTYPES.get(parts[2].strip())
        if word and typ and sub:
            out[word] = (typ, sub)
    return out


# file domain -> engine counter key suffix (afk_{suffix}Cnt; Afk::toString
# values, src/afk.cxx:6-27)
_AFK_DOMAINS = {
    "Generiek": "generiek", "Internationaal": "internationaal",
    "Juridisch": "juridisch", "Media": "media", "Onderwijs": "onderwijs",
    "Overheid_Politiek": "overheid", "Overig": "overige", "Zorg": "zorg",
}


def read_afkos(name: str = "afkortingen.lst") -> dict[str, str]:
    """CASE-SENSITIVE verbatim keys: the reference looks the raw word
    form up (checkAfk, src/tscan.cxx:1559-1567 — ``DE`` the country code
    is an abbreviation, ``de`` the article is not).  The fill routine
    splits on spaces OR tabs and joins 3/4-field lines into multiword
    keys (src/tscan.cxx:650-690)."""
    import re

    out: dict[str, str] = {}
    for line in _lines(name):
        parts = [p for p in re.split(r"[ \t]+", line) if p]
        if not 2 <= len(parts) <= 4:
            continue
        dom = _AFK_DOMAINS.get(parts[-1])
        if dom:
            out[" ".join(parts[:-1])] = dom
    return out


# ADJ file value (+ optional subtype) -> engine adj_sem label
# (SEM::classifyADJ, src/sem.cxx:227-275)
_ADJ_SEM = {
    "undefined": "undefined", "waarn_mens": "human", "emosoc": "emo",
    "technisch": "tech", "time": "time", "place": "place",
    "spec_positief": "spec_pos", "spec_negatief": "spec_neg",
    "alg_positief": "pos", "alg_negatief": "neg",
    "alg_evaluatief": "evaluative", "ep_positief": "epi_pos",
    "ep_negatief": "epi_neg", "abstract_ov": "abstract",
}
_ADJ_NONHUMAN_SUB = {
    "vorm_omvang": "shape", "kleur": "color", "stof": "matter",
    "geluid": "sound", "waarn_niet_mens_ov": "nonhuman_other",
}
_NOUN_SEM = {
    "undefined", "concrother", "institut", "substance_conc", "artefact",
    "nonhuman", "human", "voed_verz", "dynamic_conc", "substance_abstr",
    "dynamic_abstr", "nondynamic", "place", "time", "measure",
}
_VERB_S = {"undefined", "state", "action", "process"}
_VERB_C = {"abstract": "abstract", "concreet": "concrete",
           "undefined": "undefined"}


def read_noun_sem(name: str = "nouns_semtype.data"):
    """(lemma -> semtype, lemma -> (head, sat, parts)) per fillN
    (src/tscan.cxx:222-251): 3 cols for plain nouns, 6 for compounds."""
    sem: dict[str, str] = {}
    compounds: dict[str, tuple[str, str, int]] = {}
    for line in _lines(name):
        parts = line.split("\t")
        if len(parts) not in (3, 6):
            continue
        lemma = parts[0].strip()
        if parts[1].strip() in _NOUN_SEM:
            sem[lemma] = parts[1].strip()
        if len(parts) == 6 and parts[2].strip() == "1":
            try:
                n = int(parts[5])
            except ValueError:
                continue
            compounds[lemma] = (parts[3].strip(), parts[4].strip(), n)
    return sem, compounds


def read_adj_sem(name: str = "adjs_semtype.data") -> dict[str, str]:
    """lemma -> adj semtype per fillADJ (src/tscan.cxx:286-316): 2 or 3
    tab-separated cols; the waarn_niet_mens class fans out by subtype."""
    out: dict[str, str] = {}
    for line in _lines(name):
        parts = [p.strip() for p in line.split("\t")]
        parts = [p for p in parts if p]  # trailing tab on 2-col lines
        if len(parts) not in (2, 3):
            continue
        if parts[1] == "waarn_niet_mens":
            sub = _ADJ_NONHUMAN_SUB.get(parts[2]) if len(parts) == 3 else None
            if sub:
                out[parts[0].lower()] = sub
        else:
            sem = _ADJ_SEM.get(parts[1])
            if sem:
                out[parts[0].lower()] = sem
    return out


def read_verb_sem(name: str = "verbs_semtype.data") -> dict[str, str]:
    """lemma -> verb semtype per fillWW (src/tscan.cxx:264-284) +
    SEM::classifyWW (src/sem.cxx:194-225): '<c>_<s>' engine labels,
    plain 'undefined' for undefined/undefined."""
    out: dict[str, str] = {}
    for line in _lines(name):
        parts = [p.strip() for p in line.split("\t")]
        if len(parts) != 3 or parts[1] not in _VERB_S or parts[2] not in _VERB_C:
            continue
        s, c = parts[1], _VERB_C[parts[2]]
        out[parts[0]] = "undefined" if (s, c) == ("undefined", "undefined") \
            else f"{c}_{s}"
    return out
