"""S1 production source: the Common-Crawl-style web-page table.

north_rule input shape (BASELINE.json input_hint):
    (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

In production this is an Iceberg table (`spark.read.format("iceberg")` /
`spark.read.table` through a configured catalog) — partition pruning, file
skipping, and schema evolution are catalog-side and free to this engine. The
sandbox ships no Iceberg runtime jar, so `read_web_pages` resolves, in order:
  1. a catalog table name (contains no '/') via spark.read.table
  2. an Iceberg path if the runtime is present
  3. a parquet path (the sandbox testdata layout)
Everything downstream is source-agnostic: the spine takes any DataFrame with
the five columns above (validated here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WEB_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def validate_web_schema(df: DataFrame) -> DataFrame:
    missing = [c for c in WEB_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"web-page table missing columns {missing}; "
                         f"expected {WEB_COLUMNS}, got {tuple(df.columns)}")
    return df


def _iceberg_runtime_missing(exc: Exception) -> bool:
    """'no Iceberg runtime on the classpath' failures (the sandbox shape)."""
    msg = str(exc)
    return (
        "Failed to find data source: iceberg" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
        or "ClassNotFoundException" in msg
    )


def read_web_pages(spark: SparkSession, ref: str) -> DataFrame:
    """Load the web-page table from a catalog table name or a path.

    Path fallback contract: the Iceberg read is tried first; if it fails for
    ANY reason the path is retried as plain parquet (a plain-parquet dir on a
    cluster WITH the Iceberg runtime raises NoSuchTableException, and the
    parquet read is the correct answer there). Error surfacing: if the
    parquet retry ALSO fails, the more informative root cause wins — the
    parquet error when Iceberg was merely absent from the classpath, the
    original Iceberg error (auth, corrupt metadata, ...) otherwise; a schema
    mismatch from validate_web_schema always propagates as-is."""
    if "/" not in ref:
        return validate_web_schema(spark.read.table(ref))
    try:
        df = spark.read.format("iceberg").load(ref)
    except Exception as exc:
        try:
            df = spark.read.parquet(ref)
        except Exception as pq_exc:
            if _iceberg_runtime_missing(exc):
                raise pq_exc from exc
            raise exc from pq_exc
    return validate_web_schema(df)
