"""Per-run JSONL structured log for the CLI verbs — the Spark reading of
the reference's JSONLogFormatter run log (/root/reference/STACpopulator/
log.py:53-94; emit sites populators.py:263-303).

The reference logs one JSON record per item with extras (item_loc, loader,
running counter/failure totals). At 10^12 rows a record per item IS the
bottleneck, so the analogue is one record per STAGE, carrying the same
information aggregated: row counts, dead-letter failure counts by reason
(from the errors table — never a driver-side loop), and free-form extras.
Record shape mirrors the reference formatter: always ``message`` +
``timestamp`` (UTC ISO), plus every extra key at the top level.
"""

from __future__ import annotations

import datetime as dt
import json
import os


class RunLog:
    """Append-only JSONL run log. One instance per CLI run."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # truncate: the log describes THIS run (the reference opens a
            # fresh file handler per invocation, log.py:40-50)
            open(path, "w").close()

    def event(self, message: str, **extra) -> dict:
        rec = {
            "message": message,
            "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
            **extra,
        }
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=str) + "\n")
        return rec

    def stage(self, stage: str, rows: int, **extra) -> dict:
        return self.event(f"stage {stage}: {rows} rows", stage=stage, rows=rows, **extra)

    def failures(self, stage: str, errors_df) -> dict:
        """Aggregate the dead-letter table into failure counts by reason —
        the run-level analogue of the reference's per-item
        'Processed N data items. M failures' counters
        (populators.py:268-274, 302-303)."""
        from pyspark.sql import functions as F

        counts = {
            r["failure_reason"]: r["n"]
            for r in errors_df.groupBy("failure_reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(counts.values())
        return self.event(
            f"stage {stage}: {total} failures",
            stage=stage,
            failures=total,
            failure_counts=counts,
        )


def read_runlog(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
