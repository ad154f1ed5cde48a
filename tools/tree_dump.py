"""Print the golden Alpino tree for one fixture sentence.

Debug aid for the heuristic-parity grind: when the reduced parser
disagrees with the golden metrics, the first question is what the
golden tree ACTUALLY looks like (Alpino fragment/failed parses are
frequent in the bug* fixtures).  This prints the node hierarchy with
rel/cat/word/pos attributes, indented.

Usage: python tools/tree_dump.py CASE SENT_IDX
Pure Python, no Ray.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TESTS = "/root/reference/tests"


def main():
    case, sent_idx = sys.argv[1], int(sys.argv[2])
    from tools.sent_diff import make_tree_lookup
    from tscan_ray.sources.folia import parse_folia_file

    doc = parse_folia_file(os.path.join(REF_TESTS, f"{case}.example.ok"))
    lookup = make_tree_lookup()
    flat = 0
    for para in doc.paragraphs:
        for sent in para:
            flat += 1
            if flat != sent_idx:
                continue
            key = " ".join(t.word for t in sent)
            tree = lookup(key)
            if tree is None:
                print(f"no golden tree for: {key}")
                return
            print(f"== {case} s{flat}: {key}\n")

            def walk(n, depth):
                a = n.attrs
                bits = [a.get("rel", "?")]
                for k in ("cat", "pt", "pos", "word", "lemma", "index",
                          "positie", "wvorm", "pvtijd", "lcat"):
                    if a.get(k):
                        bits.append(f"{k}={a[k]}")
                span = f"[{a.get('begin', '?')}:{a.get('end', '?')}]"
                print("  " * depth + " ".join(bits) + " " + span)
                for c in n.children:
                    walk(c, depth + 1)

            walk(tree.top, 0)
            return
    print(f"sentence {sent_idx} not found (case has {flat})")


if __name__ == "__main__":
    main()
