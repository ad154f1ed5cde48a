"""Per-sentence golden-vs-heuristic diff for one reference fixture.

For a case + 1-based flat sentence index, runs BOTH paths —
annotated (reference's own Frog tokens + Alpino tree; 100% exact) and
heuristic (raw tokens through text/tagger.py + text/depparse.py) — and
prints a word-level tag/lemma/morpheme table plus the parse-derived
distance lists and counters side by side.  Debug aid for shrinking the
heuristic-path divergence (FIXTURES.md §7).

Usage: python tools/sent_diff.py CASE SENT_IDX [--words-only]
Pure Python, no Ray.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TESTS = "/root/reference/tests"


def make_tree_lookup():
    from tscan_ray.text.alpino import load_treebank_file

    table: dict[str, tuple[str, int]] = {}
    with open(os.path.join(REF_TESTS, "alpino_lookup.data"),
              encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                toks, fname, idx = line.split("\t")
                table[toks] = (fname, int(idx))
    cache: dict[str, list] = {}

    def lookup(key: str):
        hit = table.get(key)
        if hit is None:
            return None
        fname, idx = hit
        if fname not in cache:
            cache[fname] = load_treebank_file(os.path.join(REF_TESTS, fname))
        return cache[fname][idx - 1]

    return lookup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case")
    ap.add_argument("sent", type=int)
    ap.add_argument("--words-only", action="store_true")
    args = ap.parse_args()

    from tscan_ray.sources.folia import parse_folia_file
    from tscan_ray.text.features import DEFAULT_CONFIG, analyze_sentence
    from tscan_ray.text.lexicons import reference_test_lexicons

    lex = reference_test_lexicons()
    lookup = make_tree_lookup()
    doc = parse_folia_file(os.path.join(REF_TESTS,
                                        f"{args.case}.example.ok"))
    flat = 0
    for para in doc.paragraphs:
        gprev = hprev = None
        for sent in para:
            flat += 1
            sm = doc.sent_metrics[flat - 1]
            words = [t.word for t in sent]
            key = " ".join(words)
            tree = lookup(key)
            gfold = analyze_sentence(words, gprev, lex, DEFAULT_CONFIG,
                                     pre=sent, alpino_tree=tree)
            hfold = analyze_sentence(words, hprev, lex, DEFAULT_CONFIG)
            gprev, hprev = gfold, hfold
            if flat != args.sent:
                continue

            print(f"== {args.case} s{flat}: {key}")
            hdr = (f"{'i':>3} {'word':<18} {'g.tag':<6} {'h.tag':<6} "
                   f"{'g.lemma':<16} {'h.lemma':<16} {'gM':>2} {'hM':>2} "
                   f"{'g.prop':<10} {'h.prop':<10}")
            print(hdr)
            for i, (g, h) in enumerate(zip(gfold.words, hfold.words)):
                mark = " " if (g.tag == h.tag and g.lemma == h.lemma
                               and len(g.morphemes) == len(h.morphemes)
                               ) else "*"
                print(f"{i:>3} {g.word:<18} {g.tag:<6} {h.tag:<6} "
                      f"{g.lemma:<16} {h.lemma:<16} "
                      f"{len(g.morphemes):>2} {len(h.morphemes):>2} "
                      f"{g.prop:<10} {h.prop:<10}{mark}")
            if args.words_only:
                return
            gp, hp = gfold.parses[0], hfold.parses[0]
            print("\n-- distances (golden | heuristic)")
            for typ in sorted(set(gp.distances) | set(hp.distances)):
                gv, hv = gp.distances.get(typ), hp.distances.get(typ)
                mark = " " if gv == hv else "*"
                print(f"  {typ:<14} {gv!s:<22} {hv!s:<22}{mark}")
            print("\n-- parse fields (golden | heuristic)")
            for fk in ("d_level", "smain_cnt", "ssub_cnt", "sv1_cnt",
                       "clause_cnt", "np_cnt", "np_mod_cnt",
                       "adj_np_mod_cnt", "betr_cnt", "bijw_cnt",
                       "compl_cnt", "smain_cnj_cnt", "ssub_cnj_cnt",
                       "sv1_cnj_cnt", "small_cnj_cnt",
                       "small_cnj_extra_cnt", "vc_mod_cnt",
                       "vc_mod_single_cnt", "al_gem", "al_max"):
                gv, hv = getattr(gp, fk), getattr(hp, fk)
                mark = " " if gv == hv else "*"
                print(f"  {fk:<20} {gv!s:<12} {hv!s:<12}{mark}")
            print("\n-- counters that differ (golden | heuristic)")
            for ck in sorted(set(gfold.c) | set(hfold.c)):
                gv, hv = gfold.c.get(ck, 0), hfold.c.get(ck, 0)
                if gv != hv:
                    print(f"  {ck:<28} {gv!s:<10} {hv!s:<10}*")
            return
    print(f"sentence {args.sent} not found (case has {flat})")


if __name__ == "__main__":
    main()
