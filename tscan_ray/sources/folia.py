"""FoLiA reader — precomputed Frog annotations as engine input.

The reference consumes FoLiA XML documents whose words carry Frog
POS/lemma/morphology annotations (wordStats ctor, reference
src/tscan.cxx:1700-1727 reads ``pos``/``lemma``/``morphology`` off each
``folia::Word``).  This module parses that layout into the engine's
``TokenAnnotation`` records so annotated corpora — including the
reference's own golden ``.example.ok`` fixtures — can drive the feature
math directly through ``featurize_document(annotations=...)``,
independent of the heuristic tagger.

Also extracts the ``<metric>`` elements the reference writes back into
its output FoLiA (addMetrics, src/structstats.cxx:1327-1617) — the
golden expected values the conformance tests assert against.

Plain XML parsing, no Ray: used inside stage actors / test fixtures.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from tscan_ray.text.features import TokenAnnotation

_NS = "{http://ilk.uvt.nl/folia}"


@dataclass
class FoliaDoc:
    """Parsed FoLiA document: annotations + golden metrics per level."""

    # paragraphs -> sentences -> tokens
    paragraphs: list[list[list[TokenAnnotation]]] = field(default_factory=list)
    doc_metrics: dict[str, str] = field(default_factory=dict)
    par_metrics: list[dict[str, str]] = field(default_factory=list)
    # flattened sentence order (matches featurize_document's fold order)
    sent_metrics: list[dict[str, str]] = field(default_factory=list)
    word_metrics: list[list[dict[str, str]]] = field(default_factory=list)

    def sentences(self) -> list[list[TokenAnnotation]]:
        return [s for p in self.paragraphs for s in p]


def _metrics(el: ET.Element) -> dict[str, str]:
    return {m.get("class"): m.get("value")
            for m in el.findall(_NS + "metric")}


def _morphemes(w: ET.Element) -> tuple[str, ...]:
    """Flat morpheme list: the LEAF morphemes' texts in document order
    (get_full_morph_analysis flattens the deep-morph tree the same way —
    '[ge][houd][en]' for 'gehouden')."""
    morph = w.find(_NS + "morphology")
    if morph is None:
        return ()
    out: list[str] = []

    def walk(m: ET.Element) -> None:
        subs = m.findall(_NS + "morpheme")
        if not subs:
            t = m.find(_NS + "t")
            if t is not None and t.text:
                out.append(t.text)
            return
        for sub in subs:
            walk(sub)

    for m in morph.findall(_NS + "morpheme"):
        walk(m)
    return tuple(out)


def _token(w: ET.Element) -> TokenAnnotation:
    t = w.find(_NS + "t")
    word = t.text if t is not None and t.text else ""
    pos = w.find(_NS + "pos")
    full_tag = pos.get("class", "") if pos is not None else ""
    head = pos.get("head", "") if pos is not None else ""
    if not head:
        head = full_tag.split("(", 1)[0]
    feats: tuple[tuple[str, str], ...] = ()
    if pos is not None:
        feats = tuple((f.get("subset", ""), f.get("class", ""))
                      for f in pos.findall(_NS + "feat"))
    lem = w.find(_NS + "lemma")
    lemma = lem.get("class", word) if lem is not None else word
    return TokenAnnotation(word=word, lemma=lemma, tag=head,
                           full_tag=full_tag, feats=feats,
                           morphemes=_morphemes(w))


def parse_folia(xml_text: str) -> FoliaDoc:
    """Parse a FoLiA document string."""
    return _parse(ET.fromstring(xml_text))


def parse_folia_file(path: str) -> FoliaDoc:
    return _parse(ET.parse(path).getroot())


def _parse(root: ET.Element) -> FoliaDoc:
    doc = FoliaDoc()
    text = root.find(_NS + "text")
    if text is None:
        return doc
    doc.doc_metrics = _metrics(text)
    _xmlid = "{http://www.w3.org/XML/1998/namespace}id"
    for p in text.findall(_NS + "p"):
        para: list[list[TokenAnnotation]] = []
        doc.par_metrics.append(_metrics(p))
        for s in p.findall(_NS + "s"):
            # Frog NER entities: word id -> (class, is-entity-initial)
            # (NER::lookupNer, reference src/ner.cxx:8-41)
            ner: dict[str, tuple[str, bool]] = {}
            ents = s.find(_NS + "entities")
            if ents is not None:
                for ent in ents.findall(_NS + "entity"):
                    cls = ent.get("class", "").upper()
                    for j, wref in enumerate(ent.findall(_NS + "wref")):
                        ner[wref.get("id", "")] = (cls, j == 0)
            toks = []
            for w in s.findall(_NS + "w"):
                tok = _token(w)
                hit = ner.get(w.get(_xmlid, ""))
                if hit is not None:
                    tok.ner, tok.ner_begin = hit
                toks.append(tok)
            para.append(toks)
            doc.sent_metrics.append(_metrics(s))
            doc.word_metrics.append(
                [_metrics(w) for w in s.findall(_NS + "w")])
        doc.paragraphs.append(para)
    return doc


__all__ = ["FoliaDoc", "parse_folia", "parse_folia_file"]
