"""XL-scale rehearsal of the IVF index lifecycle (T7b + r5 append path):
build a list-partitioned index over the embeddings table fanned out to
~2M vectors, append a 5% batch against the frozen centroids, verify the
data/sidecar consistency contract, run a partition-pruned search, and
spot-check exactness (nprobe == n_lists indexed search vs brute over the
same corpus — identical ranks required, same contract as the driver
oracle row at sf scale).

Fan-out profile matches the crawl-mirror convention of the other XL
scripts (bench.py, bench_curation_xl.py): replicas carry DISJOINT ids
(rep * 1e6 shift) and VERBATIM vectors, so list assignment structure is
preserved and rank ties break deterministically on id.

Prints ONE short JSON line (bench.py's parse-safe protocol).

Usage:
    SPARK_GRAFT_ANN_XL_REPLICATION=1000 python scripts/bench_ann_xl.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fan_out(spark, sf_dir: str, replication: int):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    reps = spark.range(0, replication, numPartitions=max(32, replication // 8))
    return (
        reps.withColumnRenamed("id", "rep")
        .join(F.broadcast(emb))
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
            "embedding",
            F.col("rep"),
        )
    )


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.operators.ann import (
        N_LISTS,
        append_ivf_index,
        cosine_topk_brute,
        cosine_topk_ivf_indexed,
        verify_ivf_index,
        write_ivf_index,
    )
    from imposm2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replication = int(os.environ.get("SPARK_GRAFT_ANN_XL_REPLICATION", "1000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parity_q = int(os.environ.get("SPARK_GRAFT_ANN_XL_PARITY_QUERIES", "3"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    fanned = fan_out(spark, sf_dir, replication)
    # 5% of replicas form the append batch — an incremental crawl delta
    base = fanned.where(F.col("rep") % 20 != 19).drop("rep")
    batch = fanned.where(F.col("rep") % 20 == 19).drop("rep")
    n_base = base.count()
    n_batch = batch.count()

    path = tempfile.mkdtemp(prefix="imposm2_spark_ann_xl_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        t0 = time.time()
        write_ivf_index(base, path)
        build_sec = round(time.time() - t0, 3)

        t0 = time.time()
        drift = append_ivf_index(spark, path, batch)
        append_sec = round(time.time() - t0, 3)

        t0 = time.time()
        v = verify_ivf_index(spark, path)
        verify_sec = round(time.time() - t0, 3)
        assert v["consistent"], v
        assert v["n_index"] == n_base + n_batch, v

        # partition-pruned search: 100 queries at the production nprobe
        queries = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
            F.col("vec_id") < 100
        )
        t0 = time.time()
        res = cosine_topk_ivf_indexed(spark, path, queries, k=5, score="arrow")
        n_res = res.count()
        search_sec = round(time.time() - t0, 3)

        # exactness spot-check: nprobe == n_lists degenerates to exact brute
        # over the index; ranks must be IDENTICAL to cosine_topk_brute on
        # the same corpus (ties break on sim desc, id asc in both paths)
        pq = queries.where(F.col("vec_id") < parity_q)
        corpus = spark.read.parquet(path)
        t0 = time.time()
        ivf_exact = cosine_topk_ivf_indexed(
            spark, path, pq, k=5, nprobe=N_LISTS, score="arrow"
        )
        brute = cosine_topk_brute(corpus, pq, k=5, score="arrow")
        # symmetric difference on the full (qid, vec_id, rank) triples,
        # collected and diffed driver-side (parity_q*k rows per side). NOT
        # the exceptAll-union idiom: duplicating both subtrees in ONE plan
        # is the trigger shape for the Spark 4.1.2 cross-branch exchange
        # reuse bug (operators/ann.py::_topk_arrow docstring) — separate
        # actions are always evaluated correctly.
        ivf_rows = {tuple(r) for r in ivf_exact.collect()}
        brute_rows = {tuple(r) for r in brute.collect()}
        mism = len(ivf_rows ^ brute_rows)
        n_parity = len(ivf_rows)
        parity_sec = round(time.time() - t0, 3)
        assert mism == 0, f"{mism} rank mismatches vs brute"
        assert n_parity == parity_q * 5, n_parity
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + "__staging__", ignore_errors=True)
        shutil.rmtree(path + "_centroids", ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "ann_ivf_xl_build_vectors_per_sec",
                "value": round(n_base / build_sec, 1),
                "unit": "vectors/sec",
                "n_base": n_base,
                "n_append": n_batch,
                "build_sec": build_sec,
                "append_sec": append_sec,
                "append_vectors_per_sec": round(n_batch / append_sec, 1),
                "verify_sec": verify_sec,
                "search_sec": search_sec,
                "n_queries": 100,
                "n_result_rows": n_res,
                "nprobe": 4,
                "n_lists": N_LISTS,
                "parity_sec": parity_sec,
                "parity_queries": parity_q,
                "parity_mismatches": mism,
                "score": "arrow",
                "retrain_recommended": drift["retrain_recommended"],
                "min_drift_cos": round(drift["min_drift_cos"], 6),
                "cpus": cpus,
                "replication": replication,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
