"""Dump .explain("formatted") for named registry queries to
plans/$PLANS_DIR/<query>_<suffix>.txt (default r15) — the optimization round's
before/after plan evidence.

    python tools/explain_some.py before q1 q2 ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("explain-some")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    registry = entry.queries()
    here = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_DIR", "r15"),
    )
    os.makedirs(here, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = registry[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(mode)
        out = os.path.join(here, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({len(txt.splitlines())} lines)")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
