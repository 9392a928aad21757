"""sf1 scale-stress (VERDICT r2 ask #6): run the heaviest queries at 10×
the bench scale on generated sf1-equivalent data.

Four gates:
1. **oracle** — every heavy query with a DuckDB-feasible oracle re-checked
   at sf1 via tools/check_oracle.py;
2. **self-consistency** — queries whose oracle is O(n²)-bound at sf1
   (LSH families, cosine near-dup, component clustering) hash-compared
   across parallelism levels (local[8] vs local[32], fresh sessions);
3. **per-row cost** — sf1 wall time vs sf0.1 wall time in identical
   sessions: ratio/10 must stay ≤ 2 (no superlinear blowup);
4. **polar ring path** — the |lat|≥80 cap of the doc-point grid must be
   ≥99% proven by the pole-rotated ring pass (knn_polar_stats.py), with
   the brute remnant bounded — pole points no longer default to brute.

Writes benchdata/SF1_STRESS.json; append the summary to BENCH/BASELINE.md.

    python tools/stress_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ORACLE_FEASIBLE = [
    "dedup_exact",
    "jaccard_pairs",
    "token_stats",
    "quality_by_source",
    "doc_fingerprints",
    "doc_repetition",
    "doc_chunks",
    "train_val_split",
    "training_prep",
    "stac_collections",
    "stac_schema_split",
    "pii_redact",
    "decontaminate",
    "domain_stats",
    "domain_budget",
    "knn_exact_docs",
    "ann_cosine",
    "ivf_cosine",
    "pq_cosine",
    "ivfpq_cosine",
]
CONSISTENCY_ONLY = [
    "minhash_neardup",
    "simhash_pairs",
    "cosine_neardup",
    "neardup_components",
]
# per-row-cost probe set: the heaviest of each family
COST_SET = [
    "minhash_neardup",
    "simhash_pairs",
    "cosine_neardup",
    "knn_exact_docs",
    "stac_collections",
    "training_prep",
]


def run_hashes(sf_dir: str, cores: int, names: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "query_hash.py"), sf_dir, str(cores)] + names,
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"query_hash failed (cores={cores}):\n{out.stderr[-3000:]}")
    recs = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    return {r["query"]: r for r in recs}


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "benchdata/sf1")
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        subprocess.run([sys.executable, os.path.join(HERE, "gen_sf1.py"), sf1], check=True)

    result: dict = {"sf1_dir": sf1}

    print("== gate 1: DuckDB oracle at sf1 ==", flush=True)
    oc = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracle.py"), sf1] + ORACLE_FEASIBLE,
        cwd=REPO, timeout=3600,
    )
    result["oracle_ok"] = oc.returncode == 0

    print("== gate 2: local[8] vs local[32] self-consistency ==", flush=True)
    h8 = run_hashes(sf1, 8, CONSISTENCY_ONLY)
    h32 = run_hashes(sf1, 32, CONSISTENCY_ONLY)
    cons = {}
    for q in CONSISTENCY_ONLY:
        same = h8[q]["hash"] == h32[q]["hash"] and h8[q]["rows"] == h32[q]["rows"]
        cons[q] = {
            "rows": h32[q]["rows"], "match": same,
            "sec_8": h8[q]["sec"], "sec_32": h32[q]["sec"],
        }
        print(f"  {q}: rows={h32[q]['rows']} match={same}", flush=True)
    result["consistency"] = cons
    result["consistency_ok"] = all(c["match"] for c in cons.values())

    print("== gate 3: per-row cost sf1 vs sf0.1 (local[32]) ==", flush=True)
    t01 = run_hashes(sf01, 32, COST_SET)
    t1 = run_hashes(sf1, 32, COST_SET)
    cost = {}
    for q in COST_SET:
        ratio = t1[q]["sec"] / max(t01[q]["sec"], 0.05)
        per_row = ratio / 10.0  # sf1 is 10× sf0.1 rows
        cost[q] = {
            "sec_sf0.1": t01[q]["sec"], "sec_sf1": t1[q]["sec"],
            "scale_ratio": round(ratio, 2), "per_row_ratio": round(per_row, 2),
            "ok": per_row <= 2.0,
        }
        print(f"  {q}: {t01[q]['sec']}s -> {t1[q]['sec']}s (per-row x{per_row:.2f})",
              flush=True)
    result["per_row_cost"] = cost
    result["cost_ok"] = all(c["ok"] for c in cost.values())

    print("== gate 4: polar cap resolves via rotated ring path ==", flush=True)
    ps = subprocess.run(
        [sys.executable, os.path.join(HERE, "knn_polar_stats.py"), sf1, "32"],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    if ps.returncode != 0:
        raise RuntimeError(f"knn_polar_stats failed:\n{ps.stderr[-3000:]}")
    polar = json.loads([l for l in ps.stdout.splitlines() if l.startswith("{")][-1])
    # r5 bar (VERDICT r4 ask #3): >=99% of the cap ring-proven — the
    # second escalation closes the band-edge remnant, so near-total
    # coverage is the new steady state (round-5 run: 421/421 = 100%)
    polar["ok"] = (
        polar["polar_cap"] > 0
        and polar["polar_proven"] >= 0.99 * polar["polar_cap"]
        and polar["brute"] <= 0.2 * polar["n_points"]
    )
    print(f"  cap={polar['polar_cap']} ring-proven={polar['polar_proven']} "
          f"brute={polar['brute']}/{polar['n_points']} ok={polar['ok']}", flush=True)
    result["polar"] = polar
    result["polar_ok"] = polar["ok"]

    result["ok"] = (
        result["oracle_ok"] and result["consistency_ok"] and result["cost_ok"]
        and result["polar_ok"]
    )
    out_path = os.path.join(REPO, "benchdata/SF1_STRESS.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in ("oracle_ok", "consistency_ok", "cost_ok", "polar_ok", "ok")}))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
