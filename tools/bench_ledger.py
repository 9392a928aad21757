"""Render the per-query r2/r3/r4 bench ledger (VERDICT r3 ask 8) as a
markdown table from the driver BENCH_r{N}.json snapshots plus an optional
fresh r4 run JSON.

    python tools/bench_ledger.py [r4.json]   # default: BENCH_r04_local.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    """Driver snapshots wrap the bench JSON line inside a 'tail' field of
    captured stdout; a local run IS the JSON line."""
    import re

    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    m = re.search(r'\{"metric".*', d.get("tail", ""))
    if not m:
        raise ValueError(f"no bench JSON found in {path}")
    return json.loads(m.group(0))


def main():
    r2 = load(os.path.join(REPO, "BENCH_r02.json"))["queries"]
    r3 = load(os.path.join(REPO, "BENCH_r03.json"))["queries"]
    r4_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_r04_local.json")
    r4all = load(r4_path)
    r4 = r4all["queries"]

    names = list(dict.fromkeys(list(r2) + list(r3) + list(r4)))
    print("| query | r2 (s) | r3 (s) | r4 (s) | note |")
    print("|---|---|---|---|---|")
    for q in names:
        v2, v3, v4 = r2.get(q), r3.get(q), r4.get(q)
        note = ""
        if v3 is not None and v4 is not None:
            d = (v4 - v3) / max(v3, 0.01)
            if d <= -0.2:
                note = f"{-d:.0%} faster"
            elif d >= 0.2:
                note = f"{d:.0%} slower"
        fmt = lambda v: "—" if v is None else f"{v:.2f}"
        print(f"| {q} | {fmt(v2)} | {fmt(v3)} | {fmt(v4)} | {note} |")
    print()
    print(f"r4 total {r4all['value']}s, pages/s {r4all.get('pages_per_sec')}")


if __name__ == "__main__":
    main()
