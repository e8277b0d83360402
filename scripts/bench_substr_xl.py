"""XL-scale rehearsal of T27 substring-level exact dedup: the documents
table fanned out to 8M rows (disjoint ids, verbatim text — the same
crawl-mirror fan-out the other XL rehearsals use), driven through
substring_block_metrics to a full-compute aggregate.

The fan-out makes every block duplicated corpus-wide (each text repeats
`replication` times), so this measures the WORST case for the attribution
path: the left-semi join passes every block row and the per-doc agg counts
all of them. The block stream is ~n_chars/20 rows (~120M at 8M docs).

Prints ONE short JSON line — the parse-safe protocol of bench.py.

Usage:
    SPARK_GRAFT_XL_REPLICATION=1600 python scripts/bench_substr_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.operators.dedup import substring_block_metrics
    from imposm2_spark.session import get_spark
    from imposm2_spark.sources import testdata

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replication = int(os.environ.get("SPARK_GRAFT_XL_REPLICATION", "1600"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = testdata.replicate_docs(
        testdata.load(spark, sf_dir, "documents"), replication, spark,
        cols=("text",),
    )
    n_docs = docs.count()

    def run():
        return tuple(
            substring_block_metrics(docs)
            .agg(
                F.count(F.lit(1)),
                F.sum("n_blocks"),
                F.sum("n_dup_blocks"),
                F.sum(F.col("keep").cast("long")),
            )
            .collect()[0]
        )

    run()  # warm (JIT + page cache)
    t0 = time.time()
    rows, n_blocks, n_dup, n_kept = run()
    wall = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "substr_dedup_xl_docs_per_sec",
                "value": round(n_docs / wall, 1),
                "unit": "docs/sec",
                "n_docs": n_docs,
                "replication": replication,
                "cpus": cpus,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "wall_sec": wall,
                "n_block_rows": int(n_blocks),
                "n_dup_blocks": int(n_dup),
                "n_kept": int(n_kept),
            }
        )
    )


if __name__ == "__main__":
    main()
