"""XL-scale rehearsal of the J9 as-of join's hot-key path (r5): 8M left
events + 2M right events, 25% of all rows on ONE key (the profile
`bucket_us` exists for), the rest uniform over 10k keys. Runs the join
unbucketed (per-key window: the hot key serializes into one task) and with
`bucket_us` splitting the hot key over ~60 time buckets, asserts the two
outputs agree on a full-column digest AND row/match counts, and reports
both wall times.

Inputs are synthesized from spark.range with xxhash64-derived timestamps —
pure codegen, deterministic, no Python in the data path. Each timing is
wall seconds of a full-compute aggregate after one warm run. Prints ONE
short JSON line — the parse-safe protocol of bench.py.

Usage:
    python scripts/bench_asof_xl.py            # 8M/2M rows, 32 cpus
    SPARK_GRAFT_XL_ASOF_LEFT=1000000 python scripts/bench_asof_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAN_S = 60 * 86400  # 60 days of event time
BUCKET_US = 86400 * 10**6  # 1-day buckets -> hot key spreads over ~60 tasks


def synth(spark, n: int, salt: int):
    """n events: key 0 gets 25% of rows (hot), rest uniform over 10k keys;
    timestamps xxhash64-spread over SPAN_S seconds from a fixed origin."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(10_000)))
        .alias("key"),
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01 UTC
            + F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(SPAN_S))
        ).alias("ts"),
        F.col("id").alias("eid"),
    )
    return df


def main() -> None:
    from pyspark.sql import functions as F

    from imposm2_spark.operators.asof import asof_join
    from imposm2_spark.session import get_spark

    n_left = int(os.environ.get("SPARK_GRAFT_XL_ASOF_LEFT", "8000000"))
    n_right = n_left // 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    left = synth(spark, n_left, salt=11)
    right = synth(spark, n_right, salt=29)

    def digest(df):
        # order-free full-column fingerprint + row/match counts: any dropped,
        # duplicated, or differently-matched row changes it
        return tuple(
            df.agg(
                F.count("*"),
                F.count("eid_r"),
                # decimal(38,0) accumulator: 8M * |long| ~ 7e25 << 1e38, no
                # ANSI overflow (sum over BIGINT throws at this scale)
                F.sum(
                    F.xxhash64("key", "ts", "eid", "ts_r", "eid_r").cast(
                        "decimal(38,0)"
                    )
                ),
            ).collect()[0]
        )

    def timed(fn):
        fn()  # warm (JIT + page cache)
        t0 = time.time()
        out = fn()
        return round(time.time() - t0, 3), out

    unb_sec, unb_digest = timed(
        lambda: digest(asof_join(left, right, on="key", tiebreak="eid"))
    )
    bkt_sec, bkt_digest = timed(
        lambda: digest(
            asof_join(left, right, on="key", tiebreak="eid", bucket_us=BUCKET_US)
        )
    )
    assert unb_digest == bkt_digest, (unb_digest, bkt_digest)

    print(
        json.dumps(
            {
                "metric": "asof_xl_hotkey_docs_per_sec",
                "n_left": n_left,
                "n_right": n_right,
                "hot_key_share": 0.25,
                "cpus": cpus,
                "unbucketed_sec": unb_sec,
                "bucketed_sec": bkt_sec,
                "bucket_us": BUCKET_US,
                "rows_out": unb_digest[0],
                "rows_matched": unb_digest[1],
                "outputs_identical": True,
                "left_rows_per_sec": round(n_left / bkt_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
