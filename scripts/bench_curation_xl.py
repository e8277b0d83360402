"""XL-scale rehearsal of the r4 curation additions (T23/T24/T25): repetition
metrics, domain mixing, and PII scrubbing over the driver documents table
fanned out to 8M rows with disjoint ids and verbatim text — the same
crawl-mirror fan-out the spine/curate XL headlines use (bench.py).

Each op runs through a full-compute aggregate (count + a value-summing
column) so nothing short-circuits; timings are wall seconds after one warm
run. Prints ONE short JSON line — the parse-safe protocol of bench.py.

Usage:
    SPARK_GRAFT_XL_REPLICATION=1600 python scripts/bench_curation_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fan_out(spark, sf_dir: str, replication: int):
    from imposm2_spark.sources import testdata

    docs = testdata.load(spark, sf_dir, "documents")
    return testdata.replicate_docs(docs, replication, spark, cols=("text", "source"))


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.functions.text_analysis import scrub_pii
    from imposm2_spark.operators.curation import mix_sources, repetition_metrics
    from imposm2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replication = int(os.environ.get("SPARK_GRAFT_XL_REPLICATION", "1600"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = fan_out(spark, sf_dir, replication)
    n_docs = docs.count()

    def timed(fn):
        fn()  # warm (JIT + page cache)
        t0 = time.time()
        out = fn()
        return round(time.time() - t0, 3), out

    rep_sec, (rep_rows, rep_kept) = timed(
        lambda: tuple(
            repetition_metrics(docs)
            .agg(F.count("*"), F.sum(F.col("keep").cast("long")))
            .collect()[0]
        )
    )
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    mix_sec, mix_kept = timed(
        lambda: mix_sources(docs, weights, token_budget=n_docs * 10).count()
    )
    pii_sec, pii_chars = timed(
        lambda: docs.select(scrub_pii(F.col("text")).alias("c"))
        .agg(F.sum(F.length("c")))
        .collect()[0][0]
    )

    print(
        json.dumps(
            {
                "metric": "curation_xl_docs_per_sec",
                "n_docs": n_docs,
                "replication": replication,
                "cpus": cpus,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "repetition_sec": rep_sec,
                "repetition_docs_per_sec": round(n_docs / rep_sec, 1),
                "repetition_kept": rep_kept,
                "mix_sec": mix_sec,
                "mix_docs_per_sec": round(n_docs / mix_sec, 1),
                "mix_kept": mix_kept,
                "pii_scrub_sec": pii_sec,
                "pii_docs_per_sec": round(n_docs / pii_sec, 1),
                "pii_out_chars": int(pii_chars),
            }
        )
    )


if __name__ == "__main__":
    main()
