"""XL-scale rehearsal of T28 sketch profiling: theta distinct + KLL quantile
profile over the driver documents table fanned out to 8M rows (crawl-mirror
fan-out shared with bench.py / bench_curation_xl.py). The profile collects
all per-source + ALL rows, so nothing short-circuits; one warm run first.
Prints ONE short JSON line — the parse-safe protocol of bench.py.

Usage:
    SPARK_GRAFT_XL_REPLICATION=1600 python scripts/bench_sketch_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from imposm2_spark.functions.sketches import sketch_profile
    from imposm2_spark.session import get_spark
    from imposm2_spark.sources import testdata

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replication = int(os.environ.get("SPARK_GRAFT_XL_REPLICATION", "1600"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = testdata.replicate_docs(
        testdata.load(spark, sf_dir, "documents"),
        replication,
        spark,
        cols=("text", "lang", "source", "n_chars"),
    )
    n_docs = docs.count()

    def run():
        return sketch_profile(docs).collect()

    run()  # warm (JIT + page cache)
    t0 = time.time()
    rows = run()
    wall = round(time.time() - t0, 3)
    total = next(r for r in rows if r["group_key"] == "ALL")
    print(json.dumps(
        {
            "metric": "sketch_profile_xl",
            "value": wall,
            "unit": "sec",
            "sf": sf_dir.rsplit("sf", 1)[-1],
            "cpus": cpus,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / wall, 1),
            "n_profile_rows": len(rows),
            "all_distinct_text": total["distinct_text"],
            "all_p50_n_chars": total["p50_n_chars"],
        },
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
