"""XL-scale rehearsal of the J6c vector-tile geometry cut: synthesize a
deterministic feature corpus (rect-with-hole polygons + LCG polylines
replicated from the fixture generators with per-replica offsets), cut at
z12, and report features/sec + emitted tile rows for both the polygon and
line paths. Everything stays in the engine's operators — this measures the
pandas_udf fan-out shape (coords into Python once per feature, cover +
cuts in-kernel), not a synthetic kernel loop.

Prints ONE short JSON line (bench.py parse-safe protocol).

Usage:
    SPARK_GRAFT_CLIP_POLYS=100000 SPARK_GRAFT_CLIP_LINES=200000 \
        python scripts/bench_clip_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.operators.tiles import (
        clip_lines_to_tiles, clip_polygons_to_tiles,
    )
    from imposm2_spark.session import get_spark

    n_polys = int(os.environ.get("SPARK_GRAFT_CLIP_POLYS", "100000"))
    n_lines = int(os.environ.get("SPARK_GRAFT_CLIP_LINES", "200000"))
    z = int(os.environ.get("SPARK_GRAFT_CLIP_Z", "12"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic holed rects jittered over [-60,60]^2: id -> position via
    # integer hashing (no Date/random), ~0.2 deg across => a handful of z12
    # tiles each, matching building/landuse-scale features
    ids = spark.range(n_polys)
    lon0 = (F.col("id") * 7919 % 120000) / 1000.0 - 60.0
    lat0 = (F.col("id") * 104729 % 100000) / 1000.0 - 50.0
    w = 0.08 + (F.col("id") % 17).cast("double") / 100.0
    h = 0.06 + (F.col("id") % 13).cast("double") / 100.0

    def ring(x0, y0, x1, y1):
        return F.array(
            F.array(x0, y0), F.array(x1, y0), F.array(x1, y1),
            F.array(x0, y1), F.array(x0, y0),
        )

    polys = ids.select(
        F.col("id").alias("polygon_id"),
        F.array(
            ring(lon0, lat0, lon0 + w, lat0 + h),
            # hole, reversed winding: same corners traversed backwards
            F.reverse(ring(lon0 + w * 0.25, lat0 + h * 0.25,
                           lon0 + w * 0.75, lat0 + h * 0.75)),
        ).alias("rings"),
    ).repartition(cpus * 4)

    def run_polys():
        return (
            clip_polygons_to_tiles(polys, z)
            .agg(F.count("*"), F.sum("n_pts"), F.sum("area"))
            .collect()[0]
        )

    run_polys()  # warm
    t0 = time.time()
    pr = run_polys()
    poly_sec = round(time.time() - t0, 3)

    # polylines: 5-vertex LCG walks, ~0.3 deg span
    lines = ids.limit(n_lines).union(
        spark.range(max(0, n_lines - n_polys)).select(
            (F.col("id") + n_polys).alias("id")
        )
    ).select(
        F.col("id").alias("line_id"),
        F.array(*[
            F.array(
                (F.col("id") * 7919 % 120000) / 1000.0 - 60.0
                + F.lit(k) * ((F.col("id") * 31 + 7 * k) % 140 - 70) / 1000.0,
                (F.col("id") * 104729 % 100000) / 1000.0 - 50.0
                + F.lit(k) * ((F.col("id") * 57 + 11 * k) % 140 - 70) / 1000.0,
            )
            for k in range(5)
        ]).alias("pts"),
    ).repartition(cpus * 4)

    def run_lines():
        return (
            clip_lines_to_tiles(lines, z)
            .agg(F.count("*"), F.sum("n_pts"), F.sum("length"))
            .collect()[0]
        )

    run_lines()  # warm
    t0 = time.time()
    lr = run_lines()
    line_sec = round(time.time() - t0, 3)

    print(json.dumps(
        {
            "metric": "clip_xl_features_per_sec",
            "z": z,
            "n_polys": n_polys,
            "poly_sec": poly_sec,
            "poly_features_per_sec": round(n_polys / poly_sec, 1),
            "poly_tile_rows": pr[0],
            "n_lines": n_lines,
            "line_sec": line_sec,
            "line_features_per_sec": round(n_lines / line_sec, 1),
            "line_tile_rows": lr[0],
            "cpus": cpus,
        }
    ))
    spark.stop()


if __name__ == "__main__":
    main()
