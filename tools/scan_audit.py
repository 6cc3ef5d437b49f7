"""Registry-wide scan-sharing audit: for EVERY registry query, count
parquet scans per source table in the executed plan and flag queries
that scan some table more than once. A duplicate scan is how a
one-pass idiom silently becomes N passes — at 100 TB each extra scan
of `lineitem` is a full re-read of the biggest table in the lake —
so the flag list is the work queue for the dq-style combined-agg
rewrite (one pass per table, explode in-row; see dq_constraint_report,
round 10).

Not every flag is a defect: self-joins (events coactivity, triangle
wedges) legitimately re-read their table, and some oracles are defined
over two independent samples of one table. The audit separates
"scans" from "distinct tables" so a human adjudicates the rest; the
point is that no query pays a second pass NOBODY CHOSE.

Usage: python tools/scan_audit.py [sf_dir] [--all | name ...]
Prints one line per flagged query: name, per-table scan counts.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_and_media_data_ingestion_spark import get_spark
from social_and_media_data_ingestion_spark.plans.queries import registry

_TABLE_RE = re.compile(r"FileScan parquet \[[^\]]*\][^\n]*? ([^\s,\]]+\.parquet)")


def table_scans(plan: str) -> dict[str, int]:
    """table-file -> number of FileScan operators reading it."""
    counts: dict[str, int] = {}
    for m in re.finditer(r"FileScan parquet[^\n]*", plan):
        line = m.group(0)
        t = re.search(r"([A-Za-z0-9_]+)\.parquet", line)
        key = t.group(1) if t else "<unknown>"
        counts[key] = counts.get(key, 0) + 1
    return counts


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = [a for a in sys.argv[2:] if not a.startswith("-")]
    spark = get_spark(
        app_name="scan_audit",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    reg = registry()
    todo = names or sorted(reg)
    flagged = 0
    for name in todo:
        try:
            df = reg[name].spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # plan-time failure is its own finding
            print(f"ERROR {name}: {exc}")
            flagged += 1
            continue
        counts = table_scans(plan)
        dups = {t: c for t, c in counts.items() if c > 1}
        if dups:
            flagged += 1
            detail = ", ".join(f"{t}x{c}" for t, c in sorted(dups.items()))
            print(f"{name}: {detail} (total scans {sum(counts.values())})")
    print(f"# {flagged} flagged of {len(todo)} audited", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
