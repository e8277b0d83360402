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


def _not_an_iceberg_table(exc: Exception) -> bool:
    """The path exists but is not an Iceberg table (plain parquet dir on a
    cluster WITH the runtime installed)."""
    msg = str(exc)
    return (
        "NoSuchTableException" in msg
        or "Table does not exist" in msg
        or "not an Iceberg table" in msg
        or "NoSuchNamespaceException" in msg
    )


def _has_iceberg_metadata_dir(spark: SparkSession, ref: str) -> bool:
    """True if `ref` carries an Iceberg `metadata/` directory — i.e. the path
    IS (or was) a real Iceberg table, even if its metadata is now unreadable.
    Probed through the Hadoop FS API so it works on any scheme the cluster
    can read (s3a/gs/hdfs/file). A probe failure returns False: the caller
    treats the path as not-a-table and the parquet retry then surfaces
    whatever is actually wrong with it."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(ref.rstrip("/") + "/metadata")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(p))
    except Exception:
        return False


def read_web_pages(spark: SparkSession, ref: str) -> DataFrame:
    """Load the web-page table from a catalog table name or a path.

    Path fallback contract: the Iceberg read is tried first; the path is
    retried as plain parquet ONLY when Iceberg could not have served it at
    all — runtime missing from the classpath, or the path is not an Iceberg
    table. A REAL Iceberg table failing for real reasons (auth, corrupt
    metadata, transient catalog errors) propagates: silently re-reading its
    raw data files as parquet would ignore snapshots/delete files and return
    stale rows. Because a table whose `metadata/` dir was deleted or
    corrupted raises the SAME NoSuchTable-shaped errors as a plain parquet
    dir (ADVICE r3), the fallback first probes for a `metadata/` directory —
    if one exists the path is a damaged Iceberg table, not parquet, and the
    original error propagates. Every fallback that does happen logs a
    warning naming the Iceberg error. If the parquet retry also fails, its
    error chains the original Iceberg cause; a schema mismatch from
    validate_web_schema always propagates as-is."""
    if "/" not in ref:
        return validate_web_schema(spark.read.table(ref))
    try:
        df = spark.read.format("iceberg").load(ref)
    except Exception as exc:
        if not (_iceberg_runtime_missing(exc) or _not_an_iceberg_table(exc)):
            raise
        # Probe for BOTH failure classes: whether the runtime is missing or
        # the catalog says not-a-table, a path carrying metadata/ is a real
        # Iceberg table and its raw data files must not be served as parquet.
        if _has_iceberg_metadata_dir(spark, ref):
            raise RuntimeError(
                f"{ref!r} has an Iceberg metadata/ directory but the Iceberg "
                f"read failed ({exc}); refusing to fall back to raw parquet — "
                "that would ignore snapshots/delete files and return stale "
                "rows. Repair or re-register the table."
            ) from exc
        import warnings

        warnings.warn(
            f"Iceberg read of {ref!r} failed ({exc}); retrying as plain "
            "parquet. If this path is a real Iceberg table, fix the runtime/"
            "catalog instead of relying on this fallback.",
            stacklevel=2,
        )
        try:
            df = spark.read.parquet(ref)
        except Exception as pq_exc:
            raise pq_exc from exc
    return validate_web_schema(df)
