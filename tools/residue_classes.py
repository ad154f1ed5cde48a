"""Classify the heuristic-parity residue by golden-tree shape.

Splits the mismatched checks (tools/heuristic_divergence.py) into:
  - du-fragment: the golden Alpino tree contains a cat='du' node, i.e.
    Alpino itself failed/fragmented — matching it needs replicating the
    failure, not better parsing;
  - normal: the golden tree is a regular parse the reduced parser
    should in principle reproduce.

Usage: python tools/residue_classes.py
Pure Python, no Ray.
"""
from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.heuristic_divergence import is_exact, iter_checks
from tools.sent_diff import make_tree_lookup


def main():
    lookup = make_tree_lookup()
    has_du: dict[str, bool] = {}

    def du_frag(key: str) -> bool:
        if key not in has_du:
            tree = lookup(key)
            flag = False
            if tree is not None:
                for n in tree.all_nodes:
                    if n.get("cat") == "du":
                        flag = True
                        break
            has_du[key] = flag
        return has_du[key]

    tot = Counter()
    miss = Counter()
    miss_sent = {"du": Counter(), "normal": Counter()}
    for ctx, mk, want, got in iter_checks():
        cls = "du" if du_frag(ctx[2]) else "normal"
        tot[cls] += 1
        if not is_exact(want, got):
            miss[cls] += 1
            miss_sent[cls][(ctx[0], ctx[1])] += 1

    for cls in ("du", "normal"):
        n_sents = len(miss_sent[cls])
        print(f"{cls:>8}: {miss[cls]:>5} misses / {tot[cls]} checks "
              f"({n_sents} sentences)")
    print("\nworst NORMAL sentences:")
    for (case, s), c in miss_sent["normal"].most_common(40):
        print(f"  {case} s{s}: {c}")


if __name__ == "__main__":
    main()
