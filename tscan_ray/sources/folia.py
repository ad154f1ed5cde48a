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
            # Frog chunker: word id -> (chunk class, is-chunk-initial)
            # (np_length consumes NP chunks, src/tscan.cxx:2105-2124)
            chunks: dict[str, tuple[str, bool]] = {}
            chk = s.find(_NS + "chunking")
            if chk is not None:
                for ch in chk.findall(_NS + "chunk"):
                    ccls = ch.get("class", "")
                    for j, wref in enumerate(ch.findall(_NS + "wref")):
                        chunks[wref.get("id", "")] = (ccls, j == 0)
            toks = []
            for w in s.findall(_NS + "w"):
                tok = _token(w)
                hit = ner.get(w.get(_xmlid, ""))
                if hit is not None:
                    tok.ner, tok.ner_begin = hit
                chit = chunks.get(w.get(_xmlid, ""))
                if chit is not None:
                    tok.chunk, tok.chunk_begin = chit
                toks.append(tok)
            para.append(toks)
            doc.sent_metrics.append(_metrics(s))
            wms = []
            for w in s.findall(_NS + "w"):
                wm = _metrics(w)
                # the reference appends a SECOND pos annotation
                # class="wwform(...)" in set tscan-set (addMetrics,
                # src/wordstats.cxx:694-699) — surface it as a
                # pseudo-metric for the conformance tests
                for pos in w.findall(_NS + "pos"):
                    cls = pos.get("class", "")
                    if cls.startswith("wwform(") and cls.endswith(")"):
                        wm["wwform"] = cls[7:-1]
                wms.append(wm)
            doc.word_metrics.append(wms)
        doc.paragraphs.append(para)
    return doc


# ---------------------------------------------------------------------------
# annotation-column serialization: precomputed annotations (+ optional
# Alpino trees) as ONE JSON string column, so annotated corpora flow
# through the distributed featurizer (stages/featurizer.py
# ``annotations_column``) exactly like raw text does.
# ---------------------------------------------------------------------------

def annotations_to_json(paragraphs, trees=None) -> str:
    """Serialize paragraphs-of-sentences-of-TokenAnnotation (+ optional
    flat per-sentence Alpino ``alpino_ds`` XML strings) to one JSON
    string — the schema of the engine's annotation column."""
    import json

    return json.dumps({
        "p": [[[{"w": t.word, "l": t.lemma, "t": t.tag, "ft": t.full_tag,
                 "f": list(map(list, t.feats)), "m": list(t.morphemes),
                 "n": t.ner, "nb": t.ner_begin,
                 "ck": t.chunk, "ckb": t.chunk_begin}
                for t in sent] for sent in para] for para in paragraphs],
        "trees": list(trees) if trees else None,
    }, ensure_ascii=False)


def annotations_from_json(s: str):
    """Inverse of :func:`annotations_to_json`.  Returns
    ``(paragraphs, tree_lookup)`` where ``tree_lookup`` is a stateful
    callable yielding each sentence's parsed AlpTree in flattened
    document order (or None) — exactly the ``featurize_document``
    contract, which consults the lookup once per sentence in order."""
    import json

    d = json.loads(s)
    paragraphs = [[[TokenAnnotation(
        word=t["w"], lemma=t["l"], tag=t["t"], full_tag=t.get("ft", ""),
        feats=tuple((a, b) for a, b in t.get("f", ())),
        morphemes=tuple(t.get("m", ())), ner=t.get("n", ""),
        ner_begin=t.get("nb", True), chunk=t.get("ck", ""),
        chunk_begin=t.get("ckb", True))
        for t in sent] for sent in para] for para in d["p"]]
    trees = d.get("trees")
    if not trees:
        return paragraphs, None
    from tscan_ray.text.alpino import load_treebank

    parsed = iter([load_treebank(x)[0] if x else None for x in trees])

    def lookup(_key: str):
        return next(parsed, None)

    return paragraphs, lookup


def folia_to_row(xml_text: str, doc_id: str = "") -> dict:
    """One FoLiA document -> an engine input row (doc_id, text,
    annotations JSON) — trees are not part of FoLiA; join them via
    ``annotations_to_json(paragraphs, trees=...)`` when a treebank
    exists."""
    doc = parse_folia(xml_text)
    text = "\n".join(" ".join(t.word for t in s) for p in doc.paragraphs
                     for s in p)
    return {"doc_id": doc_id, "text": text,
            "annotations": annotations_to_json(doc.paragraphs)}


def read_folia(paths, annotations_col: str = "annotations"):
    """Distributed FoLiA reader: a directory / list of FoLiA XML files
    -> Dataset of (doc_id, text, annotations).  Built on
    ``read_binary_files`` so documents stream block-wise at scale; XML
    parsing happens inside the map tasks, never on the driver."""
    import os

    import pyarrow as pa

    import ray.data as rd

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f) for f in os.listdir(paths)
            if f.endswith((".xml", ".folia", ".ok")))
    ds = rd.read_binary_files(paths, include_paths=True)

    def parse_batch(batch: pa.Table) -> pa.Table:
        rows = [folia_to_row(b.decode("utf-8"),
                             os.path.basename(p))
                for b, p in zip(batch.column("bytes").to_pylist(),
                                batch.column("path").to_pylist())]
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            annotations_col: pa.array([r["annotations"] for r in rows],
                                      pa.string()),
        })

    return ds.map_batches(parse_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


__all__ = ["FoliaDoc", "parse_folia", "parse_folia_file",
           "annotations_to_json", "annotations_from_json",
           "folia_to_row", "read_folia"]
