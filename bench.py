"""Benchmark: the M1 spine + headline operator queries at $SPARK_GRAFT_SF_DIR.

Output protocol (r4 — BENCH_r03 `parsed: null` fix): the HEADLINE result is a
SHORT standalone JSON line printed both first and last, so it survives
whichever end of the stdout buffer the driver's parser scans; the per-query
map (53 entries — too long for the driver's tail buffer as one line, the r3
failure) moves to its own middle line `{"queries": {name: median_sec}}` and to
the BENCH_QUERIES.json file artifact with full median/min/max stats.

Per-query timings are the MEDIAN of SPARK_GRAFT_BENCH_REPS runs (default 3)
after a JIT warm run: r3 showed single-shot timings swinging ~3x on untouched
plans from host drift alone, indistinguishable from real regressions.

Spine input = driver documents table fanned out x SPARK_GRAFT_REPLICATION
(default 100 -> 50k docs) through the full extract -> geotag -> PIP -> tile
pipeline. Scaling protocol (BASELINE.md): run with SPARK_GRAFT_CPUS=8 then 32
and compare docs/sec — automated in bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spine_df(spark, sf_dir: str, replication: int):
    from imposm2_spark.plans.pipeline import spine
    from imposm2_spark.sources import fixtures, testdata

    docs = testdata.load(spark, sf_dir, "documents")
    docs_web = testdata.synth_documents_web(docs, replication=replication, spark=spark)
    polygons = fixtures.world_octants_df(spark, cell_level=4).unionByName(
        fixtures.polygons_admin_df(spark, cell_level=4)
    )
    return spine(docs_web, polygons, zooms=(2, 5), cell_level=4)


def build_curate_df(spark, sf_dir: str, replication: int):
    """Training-data headline: the full curate pipeline (quality/lang gates ->
    exact dedup -> LSH near-dup CC -> anti-join) over the documents table
    fanned out x replication with distinct doc_ids and VERBATIM text — the
    crawl-mirror profile: replicas collapse in the exact-dedup hash-agg (the
    stage that dominates a 100 TB run together with the scoring scan), and the
    near-dup LSH/CC stages run over the surviving uniques."""
    from imposm2_spark.plans.curate import curate
    from imposm2_spark.sources import testdata

    docs = testdata.load(spark, sf_dir, "documents")
    return curate(testdata.replicate_docs(docs, replication, spark))


def bench_pip_skew(spark, n: int = 500_000) -> dict:
    """Dense-cell PIP skew fixture (tests/test_spatial_ops.py twin at bench
    scale): every point in one level-12 cell, polygon side forced onto the
    shuffle path. Returns wall seconds for unsalted vs salt_factor=8.

    n=500k is the smallest size where the hot task dominates wall clock:
    measured 5.0s unsalted vs 3.7s salted8 (AQE on; AQE's own skew-join
    split recovers only ~0.8s of that), while at 100k both are <1.3s and
    fixed overhead inverts the comparison. salt 16/32 measured no better
    than 8 at this size (3.8s) — ring-broadcast + scan floor, not the hot
    task, bounds further spread."""
    import time as _t

    from pyspark.sql import functions as F

    from imposm2_spark.operators.pip import pip_join
    from imposm2_spark.sources import fixtures

    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 9973, 20000) / 1e6).alias("lon"),
        (F.pmod(F.col("id") * 7919, 20000) / 1e6).alias("lat"),
    )
    polys = fixtures.polygons_admin_df(spark)
    orig_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    out = {}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        counts = {}
        for name, salt in (("unsalted", None), ("salted8", 8)):
            df = pip_join(
                pts, polys, keep_point_cols=["pid"],
                broadcast_polygons=False, salt_factor=salt,
            )
            df.count()  # warm
            t0 = _t.perf_counter()
            counts[name] = df.count()
            out[f"skew_pip_{name}_sec"] = round(_t.perf_counter() - t0, 3)
        assert counts["unsalted"] == counts["salted8"], counts
        out["skew_pip_rows"] = counts["salted8"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_bc)
    return out


def bench_knn_skew(spark, n_points: int = 10_000, n_dense_sites: int = 5_000) -> dict:
    """O10a twin for kNN (tests/test_knn.py::test_salted_shuffle_equals_brute
    at bench scale): all dense sites packed into ONE level-6 cell, site side
    forced onto the shuffle path (broadcast_sites=False), unsalted vs
    salt_factor=8. Output counts asserted identical; both wall times reported.

    Timing protocol: knn_join materializes its ring loop EAGERLY at call
    time (driver-side plan loop persists + counts each round), so the timed
    region must wrap construction + count — a count over the returned frame
    alone re-reads the internal caches and times nothing (the pre-fix row
    did exactly that). Caches are cleared between runs for the same reason."""
    import time as _t

    from pyspark.sql import functions as F

    from imposm2_spark.operators.knn import knn_join

    # points clustered around the dense cell so every probe hits it
    pts = spark.range(n_points).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 9973, 40000) / 1e5).alias("lon"),
        (F.pmod(F.col("id") * 7919, 40000) / 1e5).alias("lat"),
    )
    side = int(n_dense_sites**0.5) + 1
    sites = spark.range(n_dense_sites).select(
        F.col("id").alias("site_id"),
        (F.pmod(F.col("id"), side) / 1e5).alias("slon"),
        (F.floor(F.col("id") / side) / 1e5).alias("slat"),
    )
    orig_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    out = {}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        counts = {}
        for name, salt in (("unsalted", None), ("salted8", 8)):

            def run() -> int:
                n = knn_join(
                    pts, sites, k=3, level=6,
                    broadcast_sites=False, salt_factor=salt,
                ).count()
                spark.catalog.clearCache()  # drop the loop's persisted rounds
                return n

            counts[name] = run()  # warm (JIT)
            t0 = _t.perf_counter()
            got = run()  # NOT inside an assert: python -O must still time it
            out[f"skew_knn_{name}_sec"] = round(_t.perf_counter() - t0, 3)
            assert got == counts[name]
        assert counts["unsalted"] == counts["salted8"], counts
        out["skew_knn_rows"] = counts["salted8"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_bc)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replication = int(os.environ.get("SPARK_GRAFT_REPLICATION", "100"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from imposm2_spark.session import get_spark

    spark = get_spark(
        app_name="imposm2_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")},
    )

    # Adaptive warm-up AT SIZE: C2 JIT keeps improving hot codegen'd loops for
    # several runs (measured 44s -> 21s -> 11s -> steady, BASELINE.md), so a
    # small-replication warm-up under-reports steady-state throughput. Warm
    # until two consecutive runs are within 15% (cap 4), then time once.
    prev = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        build_spine_df(spark, sf_dir, replication).count()
        cur = time.perf_counter() - t0
        if cur > prev * 0.85:
            break
        prev = cur

    n_base = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    t0 = time.perf_counter()
    spine_df = build_spine_df(spark, sf_dir, replication)
    n_tiles = spine_df.count()
    spine_sec = time.perf_counter() - t0
    n_docs = n_base * replication

    # training-data headline: curate throughput at its own (bigger) fan-out,
    # same adaptive warm-up discipline as the spine
    curate_replication = int(os.environ.get("SPARK_GRAFT_CURATE_REPLICATION", "400"))
    prev = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        build_curate_df(spark, sf_dir, curate_replication).count()
        cur = time.perf_counter() - t0
        if cur > prev * 0.85:
            break
        prev = cur
    t0 = time.perf_counter()
    n_kept = build_curate_df(spark, sf_dir, curate_replication).count()
    curate_sec = time.perf_counter() - t0
    n_curate_docs = n_base * curate_replication

    # O10a skew row: 5*10^5 points in ONE level-12 cell through the PIP shuffle
    # path (auto-broadcast off to force the shuffle; AQE on = production),
    # salted vs unsalted. Outputs asserted identical; both wall times reported
    # so the salting win (or AQE already covering it) is measured, not claimed.
    skew = bench_pip_skew(spark)
    skew.update(bench_knn_skew(spark))

    from statistics import median

    from imposm2_spark.plans import registry

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    q_stats: dict[str, dict] = {
        "spine": {"median": round(spine_sec, 3), "min": round(spine_sec, 3),
                  "max": round(spine_sec, 3), "reps": 1}
    }
    for name, fn in sorted(registry.queries().items()):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # JIT warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        q_stats[name] = {
            "median": round(median(times), 3),
            "min": round(min(times), 3),
            "max": round(max(times), 3),
            "reps": reps,
        }

    headline = json.dumps(
        {
            "metric": "spine_wall_sec(extract+geotag+pip+tiles)",
            "value": round(spine_sec, 3),
            "unit": "sec",
            "sf": sf,
            "cpus": cpus,
            "replication": replication,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / spine_sec, 1),
            "n_result_tiles": n_tiles,
            "curate_replication": curate_replication,
            "curate_n_docs": n_curate_docs,
            "curate_sec": round(curate_sec, 3),
            "curate_docs_per_sec": round(n_curate_docs / curate_sec, 1),
            "curate_n_kept": n_kept,
            **skew,
            "queries_file": "BENCH_QUERIES.json",
        },
        separators=(",", ":"),
    )
    queries_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
    )
    with open(queries_path, "w") as f:
        json.dump(
            {"sf": sf, "cpus": cpus, "reps": reps, "queries": q_stats},
            f, indent=1, sort_keys=True,
        )
    # Headline printed first AND last (short, complete at either end of a
    # bounded stdout buffer); per-query medians on their own middle line.
    print(headline)
    print(json.dumps(
        {"queries": {n: s["median"] for n, s in sorted(q_stats.items())}},
        separators=(",", ":"),
    ))
    print(headline)
    spark.stop()


if __name__ == "__main__":
    main()
