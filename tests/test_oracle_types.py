"""Oracle type-surface regression gate (r4): no oracle may emit a DuckDB
type (HUGEINT/DECIMAL/unsigned) whose pandas materialization changes the
lexical value vs Spark's — the r3 domain_stats hash-fail class."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_oracle_output_types_within_allowlist():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "audit_oracle_types.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
