"""Measure the raw-text heuristic path against the reference goldens.

For every reference fixture (`/root/reference/tests/<case>.example.ok`)
this runs the engine WITHOUT the annotation column — raw tokens through
the lexicon tagger (`text/lexicons.py`) and the reduced parser
(`text/depparse.py`) — and compares every sentence metric against the
golden FoLiA values, exactly like ``tests/test_golden_folia.py`` does
for the annotated path (which is 100% exact).

Output: overall exact rate + a ranked per-metric mismatch inventory so
the failing heuristic families (tagger POS errors vs reduced-parser
attachment) can be fixed in priority order.  FIXTURES.md §7 records the
headline number per round.

Usage: python tools/heuristic_divergence.py [--cases case1,case2] [--metric MK]
Pure Python, no Ray.
"""
from __future__ import annotations

import argparse
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TESTS = "/root/reference/tests"


def iter_checks(cases=None, verbose_metric=None):
    from tests.test_golden_folia import (
        CASES, COUNTER_METRICS, DIST_METRICS, PARSE_METRICS)
    from tscan_ray.sources.folia import parse_folia_file
    from tscan_ray.text.features import DEFAULT_CONFIG, analyze_sentence
    from tscan_ray.text.lexicons import reference_test_lexicons

    lex = reference_test_lexicons()
    for case in (cases or CASES):
        doc = parse_folia_file(os.path.join(REF_TESTS, f"{case}.example.ok"))
        flat = 0
        for para in doc.paragraphs:
            prev = None
            for sent in para:
                sm = doc.sent_metrics[flat]
                flat += 1
                words = [t.word for t in sent]
                key = " ".join(words)
                # HEURISTIC path: no pre=, no alpino_tree=
                fold = analyze_sentence(words, prev, lex, DEFAULT_CONFIG)
                prev = fold
                p = fold.parses[0]
                ctx = (case, flat, key)
                for mk, fk in PARSE_METRICS.items():
                    if mk in sm:
                        got = getattr(p, fk)
                        yield ctx, mk, int(sm[mk]), got
                for mk, dt in DIST_METRICS.items():
                    want = sm.get(mk)
                    got = p.distances.get(dt)
                    if want is None:
                        continue
                    if want == "NA":
                        yield ctx, mk, None, (sum(got) / len(got)) if got else None
                    else:
                        yield ctx, mk, float(want), \
                            (sum(got) / len(got)) if got else None
                all_d = p.all_distances()
                if sm.get("deplen") not in (None, "NA"):
                    yield ctx, "deplen", float(sm["deplen"]), \
                        (sum(all_d) / len(all_d)) if all_d else None
                if sm.get("max_deplen") not in (None, "NA"):
                    yield ctx, "max_deplen", int(float(sm["max_deplen"])), \
                        (max(all_d) if all_d else 0)
                for mk, ck in COUNTER_METRICS.items():
                    if mk in sm:
                        yield ctx, mk, int(sm[mk]), fold.c.get(ck, 0)


def is_exact(want, got):
    if want is None:  # expected NA
        return got is None
    if got is None:
        return False
    if isinstance(want, int):
        return got == want
    return abs(got - want) < 2e-4 or (
        want != 0 and abs(got / want - 1.0) < 5e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None)
    ap.add_argument("--metric", default=None,
                    help="print each mismatch for this metric")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by-sentence", action="store_true",
                    help="rank (case, sentence) pairs by mismatch count")
    args = ap.parse_args()
    cases = args.cases.split(",") if args.cases else None

    tot = ok = 0
    miss_by_metric: Counter = Counter()
    tot_by_metric: Counter = Counter()
    miss_by_case: Counter = Counter()
    miss_by_sent: Counter = Counter()
    examples = defaultdict(list)
    for ctx, mk, want, got in iter_checks(cases):
        tot += 1
        tot_by_metric[mk] += 1
        if is_exact(want, got):
            ok += 1
        else:
            miss_by_metric[mk] += 1
            miss_by_case[ctx[0]] += 1
            miss_by_sent[(ctx[0], ctx[1])] += 1
            if len(examples[mk]) < 4:
                examples[mk].append((ctx, want, got))
            if args.metric == mk:
                print(f"  {ctx[0]} s{ctx[1]}: want={want} got={got} "
                      f"| {ctx[2][:90]}")

    print(f"\nHEURISTIC path vs golden: {ok}/{tot} sentence metrics exact "
          f"= {ok / tot:.1%}\n")
    print(f"{'metric':34s} {'miss':>5s} {'of':>6s}  worst examples")
    for mk, n in miss_by_metric.most_common(args.top):
        ex = examples[mk][0]
        print(f"{mk:34s} {n:5d} {tot_by_metric[mk]:6d}  "
              f"{ex[0][0]} s{ex[0][1]} want={ex[1]} got={ex[2]}")
    print("\nworst cases:", miss_by_case.most_common(15))
    if args.by_sentence:
        print("\nworst sentences:")
        for (case, s), n in miss_by_sent.most_common(args.top):
            print(f"  {case} s{s}: {n}")


if __name__ == "__main__":
    main()
