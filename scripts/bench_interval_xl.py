"""XL-scale rehearsal of the J10 interval join (r5): 8M points + 2M
intervals over 100k keys, 25% of all points on ONE hot key, interval
lengths xxhash-spread over [0, 4h] with a 0.05% tail of 20-DAY intervals
(the `long_span_buckets` broadcast path's reason to exist). Runs the join
under two deliberately different configurations —

  A: 6h buckets, long tail (spans >= 16 buckets, i.e. the 20-day rows)
     split off to the broadcast range join;
  B: 1h buckets, long path DISABLED (the 20-day rows explode to ~480
     bucket rows each — the worst-case replication the split avoids)

— asserts the two outputs agree on a full-column digest AND row counts,
and reports both wall times. Inputs are synthesized from spark.range with
xxhash64-derived timestamps/lengths — pure codegen, deterministic, no
Python in the data path. Each timing is wall seconds of a full-compute
aggregate after one warm run. Prints ONE short JSON line — the parse-safe
protocol of bench.py.

Usage:
    python scripts/bench_interval_xl.py            # 8M/2M rows, 32 cpus
    SPARK_GRAFT_XL_INTERVAL_PTS=1000000 python scripts/bench_interval_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAN_S = 60 * 86400  # 60 days of event time
HOUR_US = 3_600 * 10**6
LONG_EVERY = 2000  # 0.05% of intervals are 20-day monsters


def synth_points(spark, n: int, salt: int):
    """n points: key 0 gets 25% of rows (hot), rest uniform over 100k keys."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(100_000)))
        .alias("key"),
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01 UTC
            + F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(SPAN_S))
        ).alias("ts"),
        F.col("id").alias("pid"),
    )


def synth_intervals(spark, n: int, salt: int):
    """n intervals uniform over 100k keys; length xxhash in [0, 4h] except
    every LONG_EVERY-th row, which spans 20 days."""
    from pyspark.sql import functions as F

    start_s = F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(SPAN_S))
    len_s = F.when(F.col("id") % LONG_EVERY == 0, F.lit(20 * 86400)).otherwise(
        F.pmod(F.xxhash64("id", F.lit(salt + 2)), F.lit(4 * 3600))
    )
    return spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(100_000)).alias("key"),
        F.timestamp_seconds(start_s).alias("start"),
        F.timestamp_seconds(start_s + len_s).alias("end"),
        F.col("id").alias("iid"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.operators.interval import interval_join
    from imposm2_spark.session import get_spark

    n_pts = int(os.environ.get("SPARK_GRAFT_XL_INTERVAL_PTS", "8000000"))
    n_ivs = n_pts // 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    pts = synth_points(spark, n_pts, salt=11)
    ivs = synth_intervals(spark, n_ivs, salt=29)

    def digest(df):
        # order-free full-column fingerprint + pair count: any dropped,
        # duplicated, or differently-matched pair changes it
        return tuple(
            df.agg(
                F.count("*"),
                # decimal(38,0) accumulator: |pairs| * |long| << 1e38, no
                # ANSI overflow (sum over BIGINT throws at this scale)
                F.sum(
                    F.xxhash64("key", "ts", "pid", "iid_i").cast("decimal(38,0)")
                ),
            ).collect()[0]
        )

    def timed(fn):
        fn()  # warm (JIT + page cache)
        t0 = time.time()
        out = fn()
        return round(time.time() - t0, 3), out

    a_sec, a_digest = timed(
        lambda: digest(
            interval_join(
                pts, ivs, on="key", point_ts="ts",
                bucket_us=6 * HOUR_US, long_span_buckets=16,
            )
        )
    )
    b_sec, b_digest = timed(
        lambda: digest(
            interval_join(
                pts, ivs, on="key", point_ts="ts",
                bucket_us=HOUR_US, long_span_buckets=None,
            )
        )
    )
    assert a_digest == b_digest, (a_digest, b_digest)

    print(
        json.dumps(
            {
                "metric": "interval_xl_points_per_sec",
                "n_points": n_pts,
                "n_intervals": n_ivs,
                "hot_point_share": 0.25,
                "long_interval_share": 1.0 / LONG_EVERY,
                "cpus": cpus,
                "split_6h_sec": a_sec,
                "explode_all_1h_sec": b_sec,
                "pairs_out": int(a_digest[0]),
                "outputs_identical": True,
                "points_per_sec": round(n_pts / a_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
