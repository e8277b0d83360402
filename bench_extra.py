"""Optimization-round side benchmark (bench.py is FROZEN for measurement).

Per-query isolation per the optimization guide §1: noop-sink timing for a
chosen subset of registry queries plus `.explain("formatted")` capture to
plans/<tag>/<query>.txt. Does NOT print the driver protocol line — this file
is for engineering numbers only; cite results in OPTIMIZATION_r06.md.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [query ...]
  env:
    SPARK_GRAFT_BENCH_REPS   repetitions after the warm run (default 3)
    SPARK_GRAFT_PLAN_TAG     plans/<tag>/ output dir (default none = no plans)
    SPARK_GRAFT_PLAN_SUFFIX  filename suffix, e.g. _before / _after
    SPARK_GRAFT_CPUS         core count (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    plan_tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "")
    plan_suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")

    from imposm2_spark.session import get_spark
    from imposm2_spark.plans import registry

    spark = get_spark(
        app_name="imposm2_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")},
    )

    qs = registry.queries()
    names = sys.argv[1:] or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    plan_dir = None
    if plan_tag:
        plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", plan_tag)
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if plan_dir is not None:
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}{plan_suffix}.txt"), "w") as f:
                f.write(spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        if os.environ.get("SPARK_GRAFT_PLANS_ONLY"):
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:warm")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"median": round(median(times), 3), "times": times}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
