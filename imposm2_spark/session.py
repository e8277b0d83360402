"""SparkSession factory with engine defaults.

Reference analog: imposm2 has no session concept — parallelism was a
``--concurrency`` flag fanning out multiprocessing workers
(imposm/app.py::main, imposm/dbimporter.py). Here parallelism is Spark's;
the only knobs we own are AQE, Arrow, and shuffle partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size governs kernel batch granularity (reference analog: the
# executemany batch size in imposm/dbimporter.py insert loops).
DEFAULT_ARROW_BATCH = 10_000


def get_spark(
    app_name: str = "imposm2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # match core count, not the 200 default — local mode shuffles hit disk
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = os.cpu_count() or 8 if n == "*" else max(int(n), 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # JVM default is 1g — too small for wide multi-table plans (many
        # concurrent broadcasts) once caches accumulate; only effective at
        # session creation, overridable via extra_conf / env
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", str(DEFAULT_ARROW_BATCH)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
    )
    if master.startswith("local") and not master.startswith("local-cluster"):
        # single-JVM: every task slot sees the same storage, so waiting for a
        # "better" locality level only stalls the scheduler (measured: a
        # coalesce(1) over a parallelized collection burned the full 3s
        # default before launching its one task). On a real cluster — and on
        # local-cluster[...], which runs real multi-JVM executors — leave
        # the default: rack/node locality is worth waiting for there.
        b = b.config("spark.locality.wait", "0s")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
