"""One-command verification matrix — everything the round gates check,
in dependency order, fail-fast:

1. oracle type audit (seconds, no Spark)
2. full pytest suite (RuntimeWarning-as-error)
3. driver-strict Spark-vs-DuckDB oracle sweep at sf0.01
4. bench.py (one JSON line; informational, never fails the run)
5. optional: --scaling (1 vs 4 executor JVMs), --stress (sf1, 4 gates)

    python tools/verify_all.py [--scaling] [--stress] [--fast]

--fast skips pytest (use when iterating on a single query's oracle).
Exit 0 only when every selected gate passes.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(name: str, cmd: list[str], timeout: int, fatal: bool = True) -> bool:
    print(f"== {name} ==", flush=True)
    t0 = time.time()
    p = subprocess.run(cmd, cwd=REPO, timeout=timeout)
    ok = p.returncode == 0
    print(f"== {name}: {'OK' if ok else 'FAIL'} [{time.time() - t0:.0f}s] ==", flush=True)
    if fatal and not ok:
        sys.exit(1)
    return ok


def main():
    args = set(sys.argv[1:])
    py = sys.executable

    run("oracle type audit", [py, os.path.join(HERE, "audit_oracle_types.py")], 300)
    if "--fast" not in args:
        run("pytest suite", [py, "-m", "pytest", "tests/", "-q"], 3600)
    run(
        "driver-strict oracle sweep (sf0.01)",
        [py, os.path.join(HERE, "check_oracle.py"), "/root/testdata/sf0.01"],
        3600,
    )
    run("bench", [py, os.path.join(REPO, "bench.py")], 1800, fatal=False)
    if "--scaling" in args:
        run("scaling 1→4 executors", [py, os.path.join(HERE, "bench_scaling.py"),
                                      "2000000", "1", "4", "cluster", "2"], 1800)
    if "--stress" in args:
        run("sf1 stress (4 gates)", [py, os.path.join(HERE, "stress_sf1.py")], 7200)
    print("ALL SELECTED GATES GREEN")


if __name__ == "__main__":
    main()
