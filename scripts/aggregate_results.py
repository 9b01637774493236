"""Aggregate robustness results over the seed x data-seed protocol.

The reference protocol averages robust accuracy over 3 seed_ids x 8-64
data_ids by hand (ref README.md:86-91,173-176). This walks the run-dir
layout exp/<image_folder>/<classifier>/<diffusion>_<version>/seed*/data*/
(ref eval_sde_adv.py:212-216), parses each log.txt for the final accuracy
lines, and prints mean +/- std per experiment.
"""
import argparse
import os
import re
from collections import defaultdict

import numpy as np

ACC_RE = re.compile(
    r"(defended robust acc|robust accuracy of defended model|robust acc)"
    r"[^0-9]*([0-9.]+)%")


def parse_log(path: str):
    """Last defended-robust-accuracy value in a log.txt, or None."""
    acc = None
    with open(path) as f:
        for line in f:
            m = ACC_RE.search(line)
            if m:
                acc = float(m.group(2)) / 100.0
    return acc


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="exp_results")
    args = parser.parse_args()

    results = defaultdict(list)
    for root, dirs, files in os.walk(args.exp):
        if "log.txt" in files and "/seed" in root.replace(os.sep, "/"):
            acc = parse_log(os.path.join(root, "log.txt"))
            if acc is None:
                continue
            # experiment key = path up to the seed dir
            parts = root.replace(os.sep, "/").split("/")
            cut = next(i for i, p in enumerate(parts)
                       if p.startswith("seed"))
            results["/".join(parts[:cut])].append(acc)

    if not results:
        print(f"no completed runs under {args.exp}")
        return
    for exp, accs in sorted(results.items()):
        a = np.asarray(accs)
        print(f"{exp}: robust acc {a.mean():.2%} +/- {a.std():.2%} "
              f"(n={len(a)})")


if __name__ == "__main__":
    main()
