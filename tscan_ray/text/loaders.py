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
