"""XL-scale rehearsal of the post-r5 operators: T31 classifier scoring,
T32 bloom build+probe, J11 linestring merge.

Same protocol as the other bench_*_xl.py scripts: crawl-mirror fan-out of
the driver documents table, one warm run, one timed run per op, ONE short
JSON line per op (parse-safe bench.py protocol).

Usage:
    SPARK_GRAFT_XL_REPLICATION=1600 python scripts/bench_newops_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from imposm2_spark.functions.classify import score_quality
    from imposm2_spark.operators.bloom import bloom_build, bloom_probe
    from imposm2_spark.operators.lines import merge_lines
    from imposm2_spark.plans.registry import _CLS_BIAS, _CLS_WEIGHTS
    from imposm2_spark.session import get_spark
    from imposm2_spark.sources import testdata

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replication = int(os.environ.get("SPARK_GRAFT_XL_REPLICATION", "1600"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = testdata.replicate_docs(
        testdata.load(spark, sf_dir, "documents"), replication, spark
    )
    n_docs = docs.count()
    out = {}

    # T31: arrow-engine scoring scan over the full fan-out
    def run_cls(engine="arrow"):
        return (
            score_quality(docs, _CLS_WEIGHTS, bias_milli=_CLS_BIAS, engine=engine)
            .agg({"logit_milli": "sum", "n_grams": "sum"})
            .collect()
        )

    run_cls()
    t0 = time.time()
    run_cls()
    wall = round(time.time() - t0, 3)
    out["classify_xl"] = {
        "metric": "quality_classifier_xl", "value": wall, "unit": "sec",
        "cpus": cpus, "n_docs": n_docs,
        "docs_per_sec": round(n_docs / wall, 1),
        "note": "T31 arrow dict-lookup kernel (default XL engine; 3.1x "
                "the interpreted inline fold in an interleaved A/B — "
                "48.5s vs 15.6s median at 8M docs, sums identical)",
    }

    # T32: filter over half the fan-out, probe with the other half
    hist = docs.where((docs.doc_id % 2) == 0)
    probe = docs.where((docs.doc_id % 2) == 1)

    def run_bloom():
        bloom = bloom_build(hist)
        return (
            bloom_probe(probe, bloom)
            .agg({"maybe_member": "count"})
            .collect()
        )

    run_bloom()
    t0 = time.time()
    run_bloom()
    wall = round(time.time() - t0, 3)
    n_half = n_docs // 2
    out["bloom_xl"] = {
        "metric": "bloom_build_probe_xl", "value": wall, "unit": "sec",
        "cpus": cpus, "n_hist": n_half, "n_probe": n_docs - n_half,
        "docs_per_sec": round(n_docs / wall, 1),
        "note": "T32 build over 4M + probe 4M in one timed pass; filter "
                "shuffle is n_bits/32 rows, probe joins broadcast",
    }

    # J11: merge the synthesized street network over the fanned-out id space
    segs = testdata.segments_from_docs(docs.select("doc_id"))
    n_segs = segs.count()

    def run_lines():
        return merge_lines(segs, quantum=0.001).agg(
            {"n_segments": "sum", "merged_id": "count"}
        ).collect()

    run_lines()
    t0 = time.time()
    r = run_lines()
    wall = round(time.time() - t0, 3)
    n_comp = r[0]["count(merged_id)"]
    out["lines_xl"] = {
        "metric": "merge_lines_xl", "value": wall, "unit": "sec",
        "cpus": cpus, "n_segments": n_segs, "n_components": n_comp,
        "segments_per_sec": round(n_segs / wall, 1),
        "note": "J11 endpoint agg -> degree-2 pairs -> pointer-doubling CC "
                "-> rollup over the replicated street network",
    }

    for k, v in out.items():
        print(json.dumps({k: v}, separators=(",", ":")))


if __name__ == "__main__":
    main()
