"""Corpus-wide word-level heuristic-vs-golden mismatch aggregation.

Runs both paths over every reference fixture (like sent_diff.py does for
one sentence) and aggregates word-level mismatches by kind:

  tag     golden CGN head tag != heuristic tag
  lemma   golden lemma != heuristic lemma
  morph   golden morpheme count != heuristic morpheme count

sorted by frequency so the top tagger/morphology families can be fixed
in priority order (FIXTURES.md §7 grind).

Usage: python tools/word_diff_agg.py [--kind tag|lemma|morph] [--top N]
Pure Python, no Ray.
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TESTS = "/root/reference/tests"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="morph",
                    choices=("tag", "lemma", "morph"))
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    from tests.test_golden_folia import CASES
    from tscan_ray.sources.folia import parse_folia_file
    from tscan_ray.text.features import DEFAULT_CONFIG, analyze_sentence
    from tscan_ray.text.lexicons import reference_test_lexicons

    lex = reference_test_lexicons()
    counts: Counter = Counter()
    where: dict = {}
    total = bad = 0
    for case in CASES:
        doc = parse_folia_file(os.path.join(REF_TESTS,
                                            f"{case}.example.ok"))
        flat = 0
        for para in doc.paragraphs:
            gprev = hprev = None
            for sent in para:
                flat += 1
                words = [t.word for t in sent]
                gfold = analyze_sentence(words, gprev, lex,
                                         DEFAULT_CONFIG, pre=sent)
                hfold = analyze_sentence(words, hprev, lex,
                                         DEFAULT_CONFIG)
                gprev, hprev = gfold, hfold
                for g, h in zip(gfold.words, hfold.words):
                    total += 1
                    if args.kind == "tag":
                        kg, kh = g.tag, h.tag
                    elif args.kind == "lemma":
                        kg, kh = g.lemma, h.lemma
                    else:
                        kg, kh = len(g.morphemes), len(h.morphemes)
                    if kg != kh:
                        bad += 1
                        key = (g.word.lower(), g.tag, str(kg), str(kh))
                        counts[key] += 1
                        if key not in where:
                            gm = "+".join(
                                m for m in g.morphemes) if args.kind == \
                                "morph" else ""
                            hm = "+".join(
                                m for m in h.morphemes) if args.kind == \
                                "morph" else ""
                            where[key] = (case, flat, gm, hm)
    if not total:
        sys.exit(f"no fixture words found under {REF_TESTS}")
    print(f"{args.kind}: {bad}/{total} words mismatch "
          f"({100*(1-bad/total):.2f}% exact)")
    for key, n in counts.most_common(args.top):
        w, gtag, kg, kh = key
        case, s, gm, hm = where[key]
        extra = f" g[{gm}] h[{hm}]" if gm or hm else ""
        print(f"{n:>4}  {w:<22} {gtag:<6} want={kg:<14} got={kh:<14} "
              f"{case} s{s}{extra}")


if __name__ == "__main__":
    main()
