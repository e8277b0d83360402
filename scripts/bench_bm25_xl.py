"""XL-scale rehearsal of T30 BM25 ranked retrieval: 8M docs (crawl-mirror
fan-out shared with bench.py), a fixed 5-term query, global top-10.

Measures THREE operator modes:
  * inline: the zero-shuffle in-row plan (small-query default)
  * join cold: postings join, doc_lengths derived in-call (two scans)
  * join warm: postings join with doc_lengths precomputed and cached

Prints ONE short JSON line (bench.py parse-safe protocol).

Usage:
    SPARK_GRAFT_XL_REPLICATION=1600 python scripts/bench_bm25_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_TERMS = ["table", "spark", "window", "join", "filter"]


def main() -> None:
    from imposm2_spark.operators.ranking import bm25_rank, doc_lengths
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
    q = spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")

    def run(dl=None, inline=True):
        return bm25_rank(
            docs, q, top_k=10, doc_lengths_df=dl,
            max_inline_terms=64 if inline else 0,
        ).collect()

    run()  # warm (JIT + page cache)
    t0 = time.time()
    rows_i = run()
    inline_sec = round(time.time() - t0, 3)

    t0 = time.time()
    rows = run(inline=False)
    cold = round(time.time() - t0, 3)

    dl = doc_lengths(docs).persist()
    dl.count()  # materialize the reusable corpus statistic
    t0 = time.time()
    rows2 = run(dl, inline=False)
    warm = round(time.time() - t0, 3)
    dl.unpersist()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in rows2]
    assert [(r["doc_id"], r["score"]) for r in rows_i] == [
        (r["doc_id"], r["score"]) for r in rows
    ]

    print(json.dumps(
        {
            "metric": "bm25_xl_docs_per_sec",
            "n_docs": n_docs,
            "inline_sec": inline_sec,
            "inline_docs_per_sec": round(n_docs / inline_sec, 1),
            "join_cold_sec": cold,
            "join_cold_docs_per_sec": round(n_docs / cold, 1),
            "join_warm_postings_only_sec": warm,
            "join_warm_docs_per_sec": round(n_docs / warm, 1),
            "top1": rows[0]["doc_id"],
            "cpus": cpus,
        }
    ))
    spark.stop()


if __name__ == "__main__":
    main()
