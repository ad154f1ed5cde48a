"""Precomputed Alpino-annotation support (the reference's alpino_lookup
pattern, src/tscan.cxx:3237-3262 + reference tests/*.example.alpino).

The reference can consume PRE-PARSED Alpino dependency trees instead of
calling the parser: a lookup maps each tokenized sentence to an
``alpino_ds`` XML tree, and every parse-derived feature is computed by
walking that DOM.  This module is the engine's equivalent: it parses
``alpino_ds`` XML into a light tree and transcribes the reference's
tree-walking algorithms —

* ``get_dependency_dist``  (src/Alpino.cxx:269-614, the 17 DD types)
* ``classify_verb``        (src/Alpino.cxx:630-726)
* ``get_d_level``          (src/Alpino.cxx:728-954)
* ``check_imp`` / ``check_modifier``  (src/Alpino.cxx:956-984)
* ``mod_stats``            (src/Alpino.cxx:988-997)
* ``resolve_adverbials``   (src/tscan.cxx:2997-3012)
* ``resolve_relative_clauses`` (src/sentstats.cxx:544-677)
* ``resolve_finite_verbs`` / ``resolve_conjunctions`` /
  ``resolve_small_conjunctions`` (src/sentstats.cxx:684-715)

— so that, given the same tree, the engine produces the same
``SentParse`` record the reference derives.  When no tree is supplied
the featurizer falls back to the reduced deterministic parser
(text/depparse.py); the tree path exists for (a) conformance fixtures
driven by the reference's own ``.example.alpino`` trees and (b)
production tables that carry a parse-annotation column computed by an
external Alpino service.

Pure Python over one (short) sentence tree; runs inside featurizer
actors' batch UDFs — never touches Ray.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from tscan_ray.text.depparse import SentParse, _store

# classifyVerb word sets (src/Alpino.cxx:199-206)
MODALS = frozenset({"kunnen", "moeten", "hoeven", "behoeven", "mogen",
                    "willen", "blijken", "lijken", "schijnen", "heten"})
KOPPELS = frozenset({"zijn", "worden", "blijven", "lijken", "schijnen",
                     "heten", "blijken", "dunken", "voorkomen"})
_SCHIJN_WORDS = frozenset({"zon", "ster", "maan", "lamp", "licht"})


class ANode:
    """One ``<node>`` element of an alpino_ds tree."""

    __slots__ = ("attrs", "children", "parent")

    def __init__(self, attrs: dict, parent: "ANode | None"):
        self.attrs = attrs
        self.children: list[ANode] = []
        self.parent = parent

    def get(self, key: str) -> str:
        return self.attrs.get(key, "")

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"ANode({self.attrs.get('rel')}/{self.attrs.get('cat')}" \
               f"/{self.attrs.get('word', '')})"


class AlpTree:
    """One parsed alpino_ds: node tree + document-order index."""

    def __init__(self, top: ANode, sentence: str, index_nodes: list[ANode]):
        self.top = top  # the cat="top" node (child of alpino_ds)
        self.sentence = sentence  # tokenized sentence text
        self.index_nodes = index_nodes
        # FindNodes(doc, "//node"): every node element, document order
        self.all_nodes: list[ANode] = []
        stack = [top]
        while stack:
            n = stack.pop()
            self.all_nodes.append(n)
            stack.extend(reversed(n.children))

    def word_node(self, i: int) -> ANode | None:
        """getAlpNodeWord (src/Alpino.cxx:69-99): first node in document
        order with end == i+1 that is exactly one token long."""
        if not hasattr(self, "_word_nodes"):
            cache: dict[int, ANode] = {}
            for n in self.all_nodes:
                b, e = n.get("begin"), n.get("end")
                if b and e and int(b) + 1 == int(e) and int(b) not in cache:
                    cache[int(b)] = n
            self._word_nodes = cache
        return self._word_nodes.get(i)

    def leaves(self) -> list[ANode]:
        """Word leaves (nodes with a ``word`` attribute) by position."""
        out = [n for n in self.all_nodes if "word" in n.attrs]
        out.sort(key=lambda n: int(n.get("begin")))
        return out


def _convert(el: ET.Element, parent: ANode | None) -> ANode:
    node = ANode(dict(el.attrib), parent)
    for child in el:
        if child.tag == "node":
            node.children.append(_convert(child, node))
    return node


def _tree_from_ds(ds: ET.Element) -> AlpTree:
    top_el = next((c for c in ds if c.tag == "node"), None)
    if top_el is None:
        raise ValueError("alpino_ds without a node tree")
    sent_el = ds.find("sentence")
    sentence = (sent_el.text or "") if sent_el is not None else ""
    top = _convert(top_el, None)

    # getIndexNodes (src/Alpino.cxx:171-197): the reference walks the
    # children of the ROOT ELEMENT'S FIRST CHILD.  For lookup-loaded
    # trees the first child is the <parser> element (childless), so no
    # index nodes are ever found and coindexed refs resolve to their own
    # begin/end — the behavior the reference's golden outputs encode.
    # Transcribed literally (including that quirk) for bit-parity.
    index_nodes: list[ANode] = []
    first_child = next(iter(ds), None)
    if first_child is not None and first_child.tag == "node":
        _get_index_nodes_from(top, index_nodes)
    return AlpTree(top, sentence, index_nodes)


def _get_index_nodes_from(node: ANode, result: list[ANode]) -> None:
    """get_index_nodes (src/Alpino.cxx:171-187)."""
    for child in node.children:
        if child.get("index") != "" and not (
                child.get("pos") == "" and child.get("cat") == ""):
            result.append(child)
        elif child.get("root") == "":
            _get_index_nodes_from(child, result)


def load_treebank(xml_text: str) -> list[AlpTree]:
    """Parse ``<treebank>`` (or a single ``<alpino_ds>``) XML into trees."""
    root = ET.fromstring(xml_text)
    if root.tag == "alpino_ds":
        return [_tree_from_ds(root)]
    return [_tree_from_ds(ds) for ds in root.iter("alpino_ds")]


def load_treebank_file(path: str) -> list[AlpTree]:
    with open(path, encoding="utf-8") as f:
        return load_treebank(f.read())


# ---------------------------------------------------------------------------
# low-level search helpers (src/Alpino.cxx:101-169)
# ---------------------------------------------------------------------------

def siblings(node: ANode) -> list[ANode]:
    """getSibblings: all sibling node elements, excluding ``node``."""
    if node.parent is None:
        return []
    return [c for c in node.parent.children if c is not node]


def node_search(node: ANode, att: str, val) -> ANode | None:
    """node_search (src/Alpino.cxx:113-169): check the direct children
    first, then recurse into each NON-LEAF child (root attribute empty).
    ``val`` may be a string or a set of strings."""
    values = {val} if isinstance(val, str) else val
    for child in node.children:
        if child.get(att) in values:
            return child
    for child in node.children:
        if child.get("root") == "":
            found = node_search(child, att, values)
            if found is not None:
                return found
    return None


def _descendants(node: ANode):
    for child in node.children:
        yield child
        yield from _descendants(child)


# ---------------------------------------------------------------------------
# dependency distances (getDependencyDist, src/Alpino.cxx:269-614)
# ---------------------------------------------------------------------------

def _resolve_index_ref(tree: AlpTree, sib: ANode) -> ANode:
    """The coindexed-ref resolution of geval 2/3/4 (src/Alpino.cxx:310-335,
    repeated for obj1/obj2).  With lookup-loaded trees ``index_nodes`` is
    empty (see _tree_from_ds) and the ref node itself is the target —
    its begin is the antecedent NP's first token."""
    target = sib
    for inode in tree.index_nodes:
        if inode.get("index") == sib.get("index"):
            target = inode
            break
    if target.children:
        res = node_search(target, "rel", "cnj")
        if res is not None:
            if res.get("root") != "":
                target = res
        else:
            res = node_search(target, "rel", "hd")
            if res is not None:
                target = res
    return target


def get_dependency_dist(tree: AlpTree, head_node: ANode,
                        puncts: set[int]) -> dict[str, list[int]]:
    """getDependencyDist (src/Alpino.cxx:294-614) for one word node."""
    result: dict[str, list[int]] = {}

    def store(typ: str, n1: ANode, n2: ANode) -> None:
        _store_nodes(result, typ, n1, n2, puncts)

    head_rel = head_node.get("rel")
    head_pos = head_node.get("pos")
    parent = head_node.parent
    parent_cat = parent.get("cat") if parent is not None else ""

    if head_rel == "hd" and head_pos == "verb":
        for sib in siblings(head_node):
            rel = sib.get("rel")
            if rel in ("su", "sup") or rel in ("obj1", "obj2"):
                typ = ("SUB_VERB" if rel in ("su", "sup")
                       else "OBJ1_VERB" if rel == "obj1" else "OBJ2_VERB")
                if not sib.children:
                    target = sib
                    if sib.get("index") != "" and sib.get("pos") == "" \
                            and sib.get("cat") == "":
                        target = _resolve_index_ref(tree, sib)
                    store(typ, head_node, target)
                else:
                    res = node_search(sib, "rel", "hd")
                    if res is not None:
                        store(typ, head_node, res)
                    res = node_search(sib, "rel", "cnj")
                    if res is not None:
                        store(typ, head_node, res)
            elif rel == "vc":
                res = node_search(sib, "rel", "hd")
                if res is not None:
                    store("VERB_VC", head_node, res)
            elif rel == "svp":
                if sib.get("lcat") == "part":
                    store("VERB_SVP", head_node, sib)
            elif rel == "predc":
                if sib.get("lcat") == "np":
                    store("VERB_PREDC_N", head_node, sib)
                elif sib.get("lcat") == "ap":
                    store("VERB_PREDC_A", head_node, sib)
                res = node_search(sib, "rel", "hd")
                if res is not None:
                    lcat = res.get("lcat")
                    if lcat == "np":
                        store("VERB_PREDC_N", head_node, res)
                    elif lcat == "ap":
                        store("VERB_PREDC_A", head_node, res)
            elif rel == "mod":
                lcat = sib.get("lcat")
                if lcat == "advp":
                    store("VERB_MOD_BW", head_node, sib)
                elif lcat == "ap":
                    store("VERB_MOD_A", head_node, sib)
                elif lcat == "np":
                    store("VERB_NOUN", head_node, sib)
                res = node_search(sib, "rel", "hd")
                if res is not None:
                    lcat = res.get("lcat")
                    if lcat == "advp":
                        store("VERB_MOD_BW", head_node, res)
                    elif lcat == "ap":
                        store("VERB_MOD_A", head_node, res)
                    elif lcat == "np":
                        store("VERB_NOUN", head_node, res)
            # cat checks run IN ADDITION to the rel dispatch
            # (src/Alpino.cxx:494-506)
            cat = sib.get("cat")
            if cat == "cp":
                res = node_search(sib, "rel", "cmp")
                if res is not None:
                    store("VERB_COMP", head_node, res)
            elif cat == "pp":
                res = node_search(sib, "rel", "hd")
                if res is not None:
                    store("VERB_PP", head_node, res)

    elif head_rel == "hd" and head_pos == "noun" and parent_cat == "np":
        for sib in siblings(head_node):
            rel = sib.get("rel")
            if rel == "det":
                if not sib.children:
                    store("NOUN_DET", head_node, sib)
                else:
                    res = node_search(sib, "rel", "hd")
                    if res is not None:
                        store("NOUN_DET", head_node, res)
                    res = node_search(sib, "rel", "mpw")
                    if res is not None and sib.get("root") != "":
                        store("NOUN_DET", head_node, res)
            if rel == "vc":
                res = node_search(sib, "rel", "hd")
                if res is not None:
                    store("NOUN_VC", head_node, res)

    elif head_rel == "hd" and head_pos == "prep" and parent_cat == "pp":
        for sib in siblings(head_node):
            if sib.get("rel") == "obj1":
                if not sib.children:
                    store("PREP_OBJ1", head_node, sib)
                else:
                    res = node_search(sib, "rel", "hd")
                    if res is not None:
                        store("PREP_OBJ1", head_node, res)
                    res = node_search(sib, "rel", "cnj")
                    # conjoined prep object stores as NOUN_DET — the
                    # reference does exactly this (src/Alpino.cxx:560-564)
                    if res is not None and res.get("root") != "":
                        store("NOUN_DET", head_node, res)

    elif head_rel == "crd":
        for sib in siblings(head_node):
            if sib.get("rel") == "cnj":
                if not sib.children:
                    store("CRD_CNJ", head_node, sib)
                else:
                    res = node_search(sib, "rel", "hd")
                    if res is not None:
                        store("CRD_CNJ", head_node, res)

    elif head_rel == "cmp" and head_pos in ("comp", "comparative"):
        if head_node.get("word") != "te":
            for sib in siblings(head_node):
                if sib.get("rel") == "body":
                    res = node_search(sib, "rel", "hd")
                    if res is not None:
                        store("COMP_BODY", head_node, res)
                    res = node_search(sib, "rel", "cnj")
                    if res is not None:
                        store("COMP_BODY", head_node, res)
    return result


def _store_nodes(result: dict[str, list[int]], typ: str,
                 n1: ANode, n2: ANode, puncts: set[int]) -> None:
    """store_result (src/Alpino.cxx:274-292) over node begins."""
    p1 = int(n1.get("begin"))
    p2 = int(n2.get("begin"))
    if p1 > p2:
        p1, p2 = p2, p1
    dist = p2 - p1 - 1
    for i in range(p1, p2 + 1):
        if i in puncts:
            dist -= 1
    if dist >= 0:
        result.setdefault(typ, []).append(dist)


# ---------------------------------------------------------------------------
# verb classification / imperative / modifier (src/Alpino.cxx:630-984)
# ---------------------------------------------------------------------------

def classify_verb(node: ANode | None, lemma: str) -> tuple[str, str]:
    """classifyVerb (src/Alpino.cxx:630-726): (wwform, full_lemma)."""
    if node is None:
        return "", ""
    sibs = siblings(node)
    if lemma in ("zijn", "worden") and node.get("sc") == "passive":
        return "PASSIVE_VERB", ""
    if lemma in KOPPELS:
        for sib in sibs:
            if sib.get("rel") == "predc":
                return "COPULA", ""
    if lemma == "schijnen":
        for sib in sibs:
            if sib.get("rel") == "su":
                if node_search(sib, "root", _SCHIJN_WORDS) is not None:
                    return "HEAD_VERB", ""
    if lemma == "zullen":
        return "TIME_VERB", ""
    if lemma in MODALS:
        return "MODAL_VERB", ""
    if lemma == "hebben":
        for sib in sibs:
            if sib.get("rel") == "vc" and sib.get("cat") in ("ppart", "inf"):
                return "TIME_VERB", ""
        return "HEAD_VERB", ""
    if lemma == "zijn":
        return "TIME_VERB", ""
    full_lemma = ""
    for sib in sibs:
        if sib.get("rel") == "svp" and sib.get("lcat") == "part":
            full_lemma = sib.get("word") + lemma
    return "HEAD_VERB", full_lemma


def check_imp(node: ANode) -> bool:
    """checkImp (src/Alpino.cxx:956-966): no su/sup sibling = imperative."""
    return not any(s.get("rel") in ("su", "sup") for s in siblings(node))


def check_modifier(node: ANode | None) -> bool:
    """checkModifier (src/Alpino.cxx:968-984)."""
    if node is None:
        return False
    p_cat = node.parent.get("cat") if node.parent is not None else ""
    if p_cat in ("ap", "ppart", "ppres", "inf"):
        return True
    return node.get("rel") == "mod" and p_cat in ("smain", "ssub")


def check_nominal_verb(node: ANode | None) -> bool:
    """The Alpino clause of checkNominal (src/wordstats.cxx:121-131):
    a pos=verb word directly under an np node is a nominalization."""
    if node is None or node.get("pos") != "verb":
        return False
    parent = node.parent
    return parent is not None and parent.get("cat") == "np"


# ---------------------------------------------------------------------------
# D-level (get_d_level, src/Alpino.cxx:728-954)
# ---------------------------------------------------------------------------

def get_d_level(tree: AlpTree, anns: list) -> int:
    """The tree-based D-level ladder.  ``anns`` supply the CGN tag info
    the reference reads from Frog (WW wvorm=pv, VG conjtype)."""
    pv_counter = sum(
        1 for a in anns
        if a.tag == "WW" and a.prop in ("ISPVTGW", "ISPVVERL", "ISSUBJ"))
    neven_counter = sum(
        1 for a in anns if a.tag == "VG" and a.conjtype == "neven")
    if pv_counter - neven_counter > 2:
        return 7

    nodes = tree.all_nodes
    for node in nodes:
        rel, cat = node.get("rel"), node.get("cat")
        pattrs = node.parent.attrs if node.parent is not None else {}
        if rel == "mod" and cat == "rel":
            if pattrs.get("rel") == "su":
                return 6
        elif rel == "su" and cat in ("cp", "whsub", "whrel",
                                     "ti", "oti", "inf"):
            return 6
        elif node.get("pos") == "verb":
            if pattrs.get("rel") == "su" and pattrs.get("cat") == "np":
                return 6

    for a in anns:
        if a.tag == "VG" and a.conjtype == "onder" and a.word != "dat":
            return 5

    for node in nodes:
        if node.get("rel") == "obcomp":
            return 4
    vcnodes = [n for n in nodes if n.get("rel") == "vc"]
    found4 = False  # deliberately not reset per node (src/Alpino.cxx:836)
    for node in vcnodes:
        index = ""
        for child in node.children:
            index = child.get("index")
            if index != "" and child.get("rel") == "su":
                found4 = True
                break
        if found4:
            for sib in siblings(node):
                if sib.get("index") == index and sib.get("rel") == "obj":
                    return 4

    for node in nodes:
        rel, cat = node.get("rel"), node.get("cat")
        pattrs = node.parent.attrs if node.parent is not None else {}
        if rel == "mod" and cat == "rel":
            if pattrs.get("rel") == "obj1":
                return 3
        elif node.get("pos") == "verb":
            if pattrs.get("rel") == "obj1" and pattrs.get("cat") == "np":
                return 3
        elif rel == "vc" and cat in ("cp", "whsub"):
            return 3
        elif rel == "sup":
            return 3

    if neven_counter > 0:
        return 2

    for node in nodes:
        if node.get("rel") == "vc" and node.get("cat") in ("ti", "oti",
                                                           "inf"):
            su_node = node_search(node, "rel", "su")
            if su_node is not None:
                node_index = su_node.get("index")
                if node_index != "":
                    for sib in siblings(node):
                        if sib.get("rel") == "su" \
                                and sib.get("index") == node_index:
                            return 1
    return 0


# ---------------------------------------------------------------------------
# sentence-level node counters (src/Alpino.cxx:988-1040,
# src/sentstats.cxx:544-715, src/tscan.cxx:2997-3012)
# ---------------------------------------------------------------------------

def mod_stats(tree: AlpTree) -> tuple[int, int]:
    """mod_stats (src/Alpino.cxx:988-997): (adjNpMod, npMod)."""
    adj_np_mod = 0
    np_mod = 0
    for node in tree.all_nodes:
        if node.get("cat") != "np":
            continue
        for c in node.children:
            if c.get("rel") == "mod" and c.get("pos") == "adj":
                adj_np_mod += 1
            if (c.get("rel") == "det" and c.get("pt") in ("tw", "n")) \
                    or c.get("rel") in ("mod", "app", "vc"):
                np_mod += 1
    return adj_np_mod, np_mod


_VERBY_CATS = frozenset({"smain", "ssub", "sv1", "inf", "ti",
                         "ppart", "ppresent"})


def adverbial_nodes(tree: AlpTree) -> list[ANode]:
    """getAdverbialNodes (src/Alpino.cxx:1032-1036): mod/predm directly
    below a verby clause node."""
    out = []
    for node in tree.all_nodes:
        if node.get("cat") in _VERBY_CATS:
            for c in node.children:
                if c.get("rel") in ("mod", "predm"):
                    out.append(c)
    return out


def resolve_adverbials(tree: AlpTree, adverb_type_fn) -> tuple[int, int]:
    """resolveAdverbials (src/tscan.cxx:2997-3012): (vcMod, vcModSingle).
    ``adverb_type_fn(lword) -> str`` is checkAdverbType for CGN::BW."""
    nodes = adverbial_nodes(tree)
    single = 0
    for node in nodes:
        word = node.get("word")
        if word != "" and adverb_type_fn(word.lower()) == "GENERAL":
            single += 1
    return len(nodes), single


def _scope(ctx) -> list[ANode]:
    """The ``.//node`` axis: for an AlpTree the context is the document
    root (alpino_ds), whose node descendants are ALL nodes including
    top; for an ANode, its proper descendants."""
    if isinstance(ctx, AlpTree):
        return ctx.all_nodes
    return list(_descendants(ctx))


def _rel_cat_nodes(scope: list[ANode], rel: str, cat: str) -> list[ANode]:
    """getNodesByRelCat without the extra path."""
    return [n for n in scope
            if n.get("rel") == rel and n.get("cat") == cat]


def _under(nodes: list[ANode], pred, direct: bool) -> list[ANode]:
    """Apply a trailing //node[pred] (direct=False) or /node[pred]
    (direct=True) step to each node; concatenates (list::merge)."""
    out: list[ANode] = []
    for n in nodes:
        if direct:
            out.extend(c for c in n.children if pred(c))
        else:
            out.extend(d for d in _descendants(n) if pred(d))
    return out


def _is_ssub(n: ANode) -> bool:
    return n.get("cat") == "ssub"


def _is_ssub_or_sv1(n: ANode) -> bool:
    return n.get("cat") in ("ssub", "sv1")


def _node_id(n: ANode) -> str:
    return n.get("id")


def _complement(nodes_a: list[ANode], nodes_b: list[ANode]) -> list[ANode]:
    """complementNodes (src/Alpino.cxx:1085-1102): multiset difference
    of A and B ordered by string id."""
    a = sorted(nodes_a, key=_node_id)
    b = sorted(nodes_b, key=_node_id)
    out: list[ANode] = []
    i = j = 0
    while i < len(a) and j < len(b):
        ia, ib = _node_id(a[i]), _node_id(b[j])
        if ia < ib:
            out.append(a[i])
            i += 1
        elif ib < ia:
            j += 1
        else:
            i += 1
            j += 1
    out.extend(a[i:])
    return out


def _rel_clause_queries(ctx) -> dict[str, list[ANode]]:
    """The XPath set of resolveRelativeClauses (src/sentstats.cxx:544-677),
    evaluated relative to ``ctx`` (AlpTree = doc level, ANode = embedded
    re-run); returns each named node list."""
    scope = _scope(ctx)

    def rel_cat_under(rel: str, cat: str, pred) -> list[ANode]:
        return _under(_rel_cat_nodes(scope, rel, cat), pred, direct=False)

    # relNodes: ssub under mod-rel / mod-whrel, plus direct-child ssub of
    # rel/whrel conjuncts under a mod-conj
    rel_nodes = rel_cat_under("mod", "rel", _is_ssub)
    rel_nodes += rel_cat_under("mod", "whrel", _is_ssub)
    conj_rel = []
    for mc in _rel_cat_nodes(scope, "mod", "conj"):
        for d in _descendants(mc):
            if d.get("rel") == "cnj" and d.get("cat") in ("rel", "whrel"):
                conj_rel.extend(c for c in d.children if _is_ssub(c))
    rel_nodes += conj_rel

    # cpNodes (adverbial clauses), parts a-d
    cp_nodes = rel_cat_under("mod", "cp", _is_ssub_or_sv1)
    for mc in _rel_cat_nodes(scope, "mod", "conj"):
        for d in _descendants(mc):
            if d.get("rel") == "cnj" and d.get("cat") == "cp":
                cp_nodes.extend(c for c in d.children if _is_ssub_or_sv1(c))
    # b: sv1/cp with a following nucl sibling, unless a cp governing
    # cnj-ssub (then case d applies)
    for n in scope:
        if n.get("cat") not in ("sv1", "cp") or n.parent is None:
            continue
        sibs_after = n.parent.children[n.parent.children.index(n) + 1:]
        if not any(s.get("rel") == "nucl" for s in sibs_after):
            continue
        if n.get("cat") == "cp" and any(
                d.get("rel") == "cnj" and d.get("cat") == "ssub"
                for d in _descendants(n)):
            continue
        cp_nodes.append(n)
    # c + d: sat next to a nucl — direct cnj-sv1 children and descendant
    # cnj-ssub nodes
    for n in scope:
        if n.get("rel") != "sat" or n.parent is None:
            continue
        if not any(s.get("rel") == "nucl" for s in n.parent.children
                   if s is not n):
            continue
        cp_nodes.extend(c for c in n.children
                        if c.get("rel") == "cnj" and c.get("cat") == "sv1")
        cp_nodes.extend(d for d in _descendants(n)
                        if d.get("rel") == "cnj" and d.get("cat") == "ssub")

    # complNodes: finite complement clauses; notTop = descendant with a
    # cat attribute != top
    def not_top_children(cat_pred, rel_not_sat: bool) -> list[ANode]:
        out = []
        for n in scope:
            if "cat" not in n.attrs or n.get("cat") == "top":
                continue
            for c in n.children:
                if rel_not_sat and ("rel" not in c.attrs
                                    or c.get("rel") == "sat"):
                    continue
                if cat_pred(c):
                    out.append(c)
        return out

    whsub_hosts = not_top_children(lambda c: c.get("cat") == "whsub", False)
    whrel_hosts = not_top_children(lambda c: c.get("cat") == "whrel", False)
    cp_hosts = not_top_children(lambda c: c.get("cat") == "cp", True)
    compl_nodes = _under(whsub_hosts, _is_ssub, direct=False)
    compl_nodes += _complement(_under(whrel_hosts, _is_ssub, direct=False),
                               rel_nodes)
    compl_nodes += _complement(_under(cp_hosts, _is_ssub, direct=False),
                               cp_nodes)

    # ti/oti complements: ti always; oti only without a nested ti/oti
    # (the reference XPath's and/or precedence, src/sentstats.cxx:614)
    ti_bep_nodes = []
    for n in scope:
        if "cat" not in n.attrs or n.get("cat") == "top":
            continue
        for c in n.children:
            if c.get("cat") == "ti" or (
                    c.get("cat") == "oti"
                    and not any(d.get("cat") in ("ti", "oti")
                                for d in _descendants(c))):
                ti_bep_nodes.append(c)

    return {"rel": rel_nodes, "cp": cp_nodes, "compl": compl_nodes,
            "ti_bep": ti_bep_nodes}


def resolve_relative_clauses(tree: AlpTree) -> dict[str, int]:
    """resolveRelativeClauses (src/sentstats.cxx:544-677)."""
    q = _rel_clause_queries(tree)
    out = {
        "betrCnt": len(q["rel"]),
        "bijwCnt": len(q["cp"]),
        "complCnt": len(q["compl"]),
        "infinComplBepCnt": len(q["ti_bep"]),
    }

    # multiply-embedded finite clauses: re-run the queries relative to
    # each found clause node, collect ids (set semantics)
    all_nodes = q["rel"] + q["cp"] + q["compl"]
    fin_ids: set[str] = set()
    for node in all_nodes:
        sub = _rel_clause_queries(node)
        for key in ("rel", "cp", "compl"):
            fin_ids.update(_node_id(n) for n in sub[key])
    out["mvFinInbedCnt"] = len(fin_ids)

    all_ids: set[str] = set()
    for node in all_nodes + q["ti_bep"]:
        sub = _rel_clause_queries(node)
        for key in ("rel", "cp", "compl"):
            all_ids.update(_node_id(n) for n in sub[key])
        all_ids.update(_node_id(d) for d in _descendants(node)
                       if d.get("cat") == "ti")
    out["mvInbedCnt"] = len(all_ids)

    # loose clauses directly under the top node
    los_betr = 0
    los_bijw = 0
    for c in tree.top.children:
        if c.get("cat") in ("rel", "whrel"):
            los_betr += sum(1 for d in _descendants(c) if _is_ssub(d))
        if c.get("cat") == "cp":
            los_bijw += sum(1 for d in _descendants(c) if _is_ssub(d))
    out["losBetrCnt"] = los_betr
    out["losBijwCnt"] = los_bijw
    return out


def resolve_finite_verbs(tree: AlpTree) -> tuple[int, int, int]:
    """resolveFiniteVerbs (src/sentstats.cxx:684-691)."""
    smain = ssub = sv1 = 0
    for n in tree.all_nodes:
        cat = n.get("cat")
        if cat == "smain":
            smain += 1
        elif cat == "ssub":
            ssub += 1
        elif cat == "sv1":
            sv1 += 1
    return smain, ssub, sv1


def resolve_conjunctions(tree: AlpTree) -> tuple[int, int, int]:
    """resolveConjunctions (src/sentstats.cxx:698-703)."""
    smain_cnj = sum(1 for n in tree.all_nodes
                    if n.get("rel") == "cnj" and n.get("cat") == "smain")
    ssub_cnj = sum(1 for n in tree.all_nodes
                   if n.get("rel") == "cnj" and (
                       n.get("cat") == "ssub"
                       or any(d.get("cat") == "ssub"
                              for d in _descendants(n))))
    sv1_cnj = sum(1 for n in tree.all_nodes
                  if n.get("rel") == "cnj" and n.get("cat") == "sv1")
    return smain_cnj, ssub_cnj, sv1_cnj


_BIG_CATS = frozenset({"smain", "ssub", "sv1", "rel", "whrel", "cp",
                       "oti", "ti", "whsub"})


def resolve_small_conjunctions(tree: AlpTree) -> tuple[int, int]:
    """resolveSmallConjunctions (src/sentstats.cxx:706-715)."""
    small = sum(1 for n in tree.all_nodes
                if n.get("rel") == "cnj" and n.get("cat") not in _BIG_CATS)
    groups = sum(1 for n in tree.all_nodes
                 if n.get("cat") == "conj" and not any(
                     d.get("cat") in _BIG_CATS for d in _descendants(n)))
    return small, small - groups


# ---------------------------------------------------------------------------
# SentParse assembly — the per-sentence record the featurizer folds
# (mirrors the alpDoc section of the sentStats ctor, src/tscan.cxx:2140-2241)
# ---------------------------------------------------------------------------

def sent_parse_from_tree(tree: AlpTree, anns: list,
                         adverb_type_fn=None) -> SentParse:
    """Derive the engine's SentParse from a precomputed Alpino tree.

    ``anns`` are the sentence's WordAnn records (token order); their LET
    tags define the punctuation set (src/tscan.cxx:2211-2218).  NP
    length counters (npCnt/indefNpCnt/npSizeSum) come from the Frog
    CHUNKER in the reference (np_length, src/tscan.cxx:2105-2124), not
    the tree — the caller keeps the reduced NP scan for those.
    """
    parse = SentParse()
    puncts = {i for i, a in enumerate(anns) if a.prop == "ISLET"}

    # per-word dependency distances, aggregated (src/tscan.cxx:2332)
    for i in range(len(anns)):
        wn = tree.word_node(i)
        if wn is None:
            continue
        for typ, dists in get_dependency_dist(tree, wn, puncts).items():
            parse.distances.setdefault(typ, []).extend(dists)

    dists = parse.all_distances()
    if dists:
        parse.al_gem = sum(dists) / len(dists)
        parse.al_max = float(max(dists))

    parse.d_level = get_d_level(tree, anns)
    parse.d_level_gt4 = 1 if parse.d_level > 4 else 0
    parse.adj_np_mod_cnt, parse.np_mod_cnt = mod_stats(tree)
    if adverb_type_fn is not None:
        parse.vc_mod_cnt, parse.vc_mod_single_cnt = resolve_adverbials(
            tree, adverb_type_fn)
    else:
        parse.vc_mod_cnt = len(adverbial_nodes(tree))
    rc = resolve_relative_clauses(tree)
    parse.betr_cnt = rc["betrCnt"]
    parse.bijw_cnt = rc["bijwCnt"]
    parse.compl_cnt = rc["complCnt"]
    parse.infin_compl_bep_cnt = rc["infinComplBepCnt"]
    parse.mv_fin_inbed_cnt = rc["mvFinInbedCnt"]
    parse.mv_inbed_cnt = rc["mvInbedCnt"]
    parse.los_betr_cnt = rc["losBetrCnt"]
    parse.los_bijw_cnt = rc["losBijwCnt"]
    parse.smain_cnt, parse.ssub_cnt, parse.sv1_cnt = resolve_finite_verbs(tree)
    parse.clause_cnt = parse.smain_cnt + parse.ssub_cnt + parse.sv1_cnt
    parse.corrected_clause_cnt = parse.clause_cnt if parse.clause_cnt > 0 else 1
    (parse.smain_cnj_cnt, parse.ssub_cnj_cnt,
     parse.sv1_cnj_cnt) = resolve_conjunctions(tree)
    (parse.small_cnj_cnt,
     parse.small_cnj_extra_cnt) = resolve_small_conjunctions(tree)
    return parse


__all__ = [
    "ANode", "AlpTree", "load_treebank", "load_treebank_file",
    "siblings", "node_search", "get_dependency_dist", "classify_verb",
    "check_imp", "check_modifier", "check_nominal_verb", "get_d_level",
    "mod_stats", "resolve_adverbials", "resolve_relative_clauses",
    "resolve_finite_verbs", "resolve_conjunctions",
    "resolve_small_conjunctions", "sent_parse_from_tree",
]
