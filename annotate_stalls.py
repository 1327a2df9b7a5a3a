"""Annotate tunnel-stall timing outliers in committed protocol JSONs
(VERDICT r4 item 9 / weak #8).

A per-count ``sec_per_graph_per_try`` more than THRESH x the row median of
its sibling counts is a transport stall (the chain-profile decomposition
``results/chain_profile.json`` showed identical static workloads per count;
the spread is tunnel noise), not a property of the workload. Re-running every
historical row is wasteful; instead mark the outlier in place with
``"stalled": true`` and ``"stall_factor"`` so a reader computing speedups
from the JSONs alone is never misled.
"""

from __future__ import annotations

import glob
import json
import statistics

THRESH = 5.0


def annotate(path: str) -> int:
    with open(path) as f:
        d = json.load(f)
    rows = {
        k: v for k, v in d.items()
        if isinstance(v, dict) and "sec_per_graph_per_try" in v
    }
    if len(rows) < 3:
        return 0
    n = 0
    times = {k: v["sec_per_graph_per_try"] for k, v in rows.items()}
    for k, v in rows.items():
        others = [t for kk, t in times.items() if kk != k]
        med = statistics.median(others)
        if med > 0 and times[k] > THRESH * med:
            factor = times[k] / med
            if not v.get("stalled"):
                v["stalled"] = True
                v["stall_factor"] = round(factor, 1)
                v["stall_note"] = (
                    "tunnel transport stall: wall-clock is "
                    f"{factor:.1f}x the sibling-count median; the static "
                    "workload is count-independent (chain_profile.json)"
                )
                n += 1
        elif v.get("stalled") and times[k] <= THRESH * med:
            # stale annotation from a previous pass after a re-run
            for key in ("stalled", "stall_factor", "stall_note"):
                v.pop(key, None)
            n += 1
    if n:
        with open(path, "w") as f:
            json.dump(d, f, indent=2)
    return n


def main():
    total = 0
    for path in sorted(glob.glob("results/*/*.json")) + sorted(
        glob.glob("results/rejection_*.json")
    ):
        n = annotate(path)
        if n:
            print(f"{path}: annotated {n} count(s)")
            total += n
    print(f"total annotations: {total}")


if __name__ == "__main__":
    main()
