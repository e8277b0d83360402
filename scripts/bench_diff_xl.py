"""XL rehearsal of S6b diff application: an 8M-element base table absorbs a
~13%-churn OSC-style change set (modify/delete/create mix) through
apply_diff's single max_by aggregation. Full-compute via count aggregates;
one warm run then one timed run; ONE short JSON line (bench.py protocol).

Usage:
    SPARK_GRAFT_XL_ROWS=8000000 python scripts/bench_diff_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.operators.merge import apply_diff
    from imposm2_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_XL_ROWS", "8000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n, numPartitions=cpus * 2).select(
        F.col("id"),
        F.lit(1).cast("long").alias("version"),
        F.md5(F.col("id").cast("string")).alias("content"),
    )
    d = F.col("id")
    diff = (
        spark.range(n, numPartitions=cpus * 2)
        .where((d % 10 == 0) | (d % 13 == 1) | (d % 17 == 2))
        .select(
            F.when(d % 17 == 2, d + n).otherwise(d).alias("id"),
            F.lit(2).cast("long").alias("version"),
            F.when(d % 10 == 0, F.lit("modify"))
            .when(d % 13 == 1, F.lit("delete"))
            .otherwise(F.lit("create"))
            .alias("op"),
            F.md5(F.concat(F.lit("v2:"), d.cast("string"))).alias("content"),
        )
    )
    n_diff = diff.count()

    def run():
        return apply_diff(base, diff, key="id").agg(
            F.count("*"), F.max("version")
        ).collect()[0]

    run()  # warm (JIT)
    t0 = time.time()
    out_rows, max_v = run()
    sec = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "diff_apply_xl_elements_per_sec",
                "value": round((n + n_diff) / sec, 1),
                "unit": "elements/sec",
                "wall_sec": sec,
                "n_base": n,
                "n_diff": n_diff,
                "out_rows": out_rows,
                "max_version": max_v,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
