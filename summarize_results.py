"""Aggregate every committed eval JSON under results/ into markdown tables
(one row per result file, one column per object count) for ROUND*.md.

Usage: python summarize_results.py [--metric success_rate|success_rate_topk]
"""

import argparse
import glob
import json
import os
import statistics


def load_rows(metric):
    rows = []
    for f in sorted(glob.glob("results/*/*.json")):
        base = os.path.basename(f)
        if base in ("config.json",) or "tuning" in base:
            continue
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        counts = {k: v for k, v in d.items()
                  if k.isdigit() and isinstance(v, dict) and metric in v}
        if not counts:
            continue
        label = f"{os.path.basename(os.path.dirname(f))}/{base[:-5]}"
        row = {"label": label}
        for k, v in counts.items():
            row[int(k)] = v[metric]
        secs = [v.get("sec_per_graph_per_try") for v in counts.values()
                if isinstance(v.get("sec_per_graph_per_try"), (int, float))]
        if secs:
            # median across counts: the first count's launch absorbs the
            # chain compile (no persistent cache on this backend), which
            # would skew a mean
            row["ms/graph/try"] = 1000 * statistics.median(secs)
        accs = [v.get("mcmc_acceptance") for v in counts.values()
                if isinstance(v.get("mcmc_acceptance"), (int, float))]
        if accs:
            row["accept"] = sum(accs) / len(accs)
        rows.append(row)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metric", default="success_rate")
    args = p.parse_args()

    for metric in ([args.metric] if args.metric != "both"
                   else ["success_rate", "success_rate_topk"]):
        rows = load_rows(metric)
        counts = sorted({c for r in rows for c in r if isinstance(c, int)})
        hdr = ["result"] + [f"{c} obj" for c in counts] + ["ms/graph/try",
                                                           "accept"]
        print(f"\n### {metric}\n")
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in rows:
            cells = [r["label"]]
            for c in counts:
                cells.append(f"{r[c]:.2f}" if c in r else "")
            cells.append(f"{r['ms/graph/try']:.1f}"
                         if "ms/graph/try" in r else "")
            cells.append(f"{r['accept']:.2f}" if "accept" in r else "")
            print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
