"""Dump .explain("formatted") for named registry queries to a directory.

Usage: python tools/plan_dump.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the before/after
plan evidence the optimization rounds commit under plans/r{N}/. The
formatted explain is taken from the query's final DataFrame; note that
work done inside pin jobs (localCheckpoint) at query-BUILD time is not
visible in this dump (the iterative operators' internal joins live
there) — capture those with a dedicated harness.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_and_media_data_ingestion_spark import get_spark
from social_and_media_data_ingestion_spark.plans.queries import registry


def formatted(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    reg = registry()
    for name in names:
        df = reg[name].spark(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
