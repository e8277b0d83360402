"""Structured Streaming ingest: incremental document arrival -> enriched sink.

Reference context: imposm2 has NO incremental path (SURVEY.md §2.9) — its
consistency story is full re-import + atomic prefix swap (S8). Diff/replication
support arrived in imposm3. This module is the graft's incremental analog,
built on Structured Streaming file sources instead of OSM diff files:

  * `stream_ingest` — readStream over a landing directory of document parquet
    (the Iceberg-table stand-in), per-microbatch extract+geotag enrichment
    (same Arrow kernels as the batch spine — code shared, not forked), parquet
    append sink. Exactly-once per input file via the streaming checkpoint
    (file-source tracking + idempotent sink commit); `availableNow` drains the
    backlog and stops, so batch backfills and continuous tailing share one
    code path.
  * `stream_tile_counts` — event-time windowed aggregation (warc_ts) with a
    watermark for late documents: counts per (window, tile) in update mode,
    the streaming twin of the spine's tile groupBy.

At production scale the landing dir is an object-store prefix and the sink an
Iceberg table (sources.catalog); the streaming checkpoint dir carries offsets
+ sink metadata, making restarts resume from the last committed microbatch —
the streaming counterpart of plans.checkpoint for the batch path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..functions.spatial import cell_encode_col
from ..plans.pipeline import extract_stage, geotag_stage

DOCUMENTS_WEB_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession, landing_dir: str,
    max_files_per_trigger: int | None = 8,
) -> DataFrame:
    """File-source stream over the landing directory (schema fixed, §1.2:
    never infer schemas in engine paths).

    `max_files_per_trigger` bounds each micro-batch; the default suits a
    tailing ingest. A large availableNow BACKFILL (10^5 landing files) wants
    a much wider batch — or None to let availableNow size batches itself —
    rather than paying checkpoint-commit + planning overhead per 8 files
    (review r5: this was hard-coded)."""
    reader = spark.readStream.schema(DOCUMENTS_WEB_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def enrich(docs: DataFrame, cell_level: int = 12) -> DataFrame:
    """Shared enrichment: extract + geotag + cell id, html dropped post-use."""
    out = geotag_stage(extract_stage(docs))
    return out.withColumn(
        "cell", cell_encode_col(F.col("lon"), F.col("lat"), cell_level)
    ).drop("html")


def stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cell_level: int = 12,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = 8,
) -> StreamingQuery:
    """Start the incremental ingest; returns the StreamingQuery handle.

    `available_now=True` processes the current backlog then finishes (backfill
    mode); False leaves the query tailing the directory (continuous mode).
    `max_files_per_trigger` reaches the source reader (review r5: it was
    unplumbed, pinning every query to 8 files/micro-batch); pass None on a
    large availableNow backfill to let the trigger size batches itself.
    """
    src = read_document_stream(spark, landing_dir, max_files_per_trigger)
    enriched = (transform or (lambda df: enrich(df, cell_level)))(src)
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_spine(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    polygons: DataFrame,
    sink: Callable[[DataFrame, int], None],
    zoom: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
    cell_level: int = 12,
    max_files_per_trigger: int | None = 8,
) -> StreamingQuery:
    """The full M1 spine as one Structured Streaming job: extract -> geotag ->
    stream-STATIC broadcast PIP join -> watermarked windowed tile stats.

    `cell_level` defaults to the batch spine's 12 (review r5: this twin
    defaulted to 4, whose 22.5-degree prefilter cells degrade the PIP
    equi-join prefilter toward all-pairs on realistic polygon sets — the
    result stays correct, the refine cost does not). Match it to the
    polygon fixture's cover level, as the batch spine does.

    The polygon side is static (rings pulled once, re-shipped per executor by
    pip_join's broadcast path); the streaming side goes through only
    stateless ops before the windowed aggregation, so watermark metadata
    propagates and closed-window state is evicted — the streaming twin of
    plans.pipeline.spine, batch-parity-tested in tests/test_streaming.py.

    SINK CONTRACT — `sink` MUST upsert, not append: outputMode('update')
    re-delivers the same (window_start, x, y) key across micro-batches with
    monotonically growing counts, so the sink must overwrite by key
    (last-write-wins; e.g. MERGE INTO / dict[key] = row). A naive append sink
    double-counts. Update mode is deliberate: availableNow backfills emit
    every window's current value even when the watermark hasn't closed it yet
    — append mode would hold back all windows within `watermark` of max event
    time until a future run."""
    src = read_document_stream(spark, landing_dir, max_files_per_trigger)
    return _spine_query(
        src, checkpoint_dir, polygons, sink, zoom, window, watermark, cell_level
    )


def stream_curated_spine(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    polygons: DataFrame,
    sink: Callable[[DataFrame, int], None],
    dedup_state_ttl_ms: int = 24 * 3_600_000,
    zoom: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
    cell_level: int = 12,
    max_files_per_trigger: int | None = 8,
) -> StreamingQuery:
    """The full streaming CURATION story: stream_spine with cross-micro-batch
    first-seen dedup chained in front — duplicate documents (same text,
    any url, arriving in any later micro-batch or after a query restart via
    the state store) are suppressed BEFORE paying extract/geotag/PIP.

    Two stateful operators in one query (supported since Spark 3.4):
    applyInPandasWithState dedup (append, processing-time timeout) feeding
    the watermarked windowed aggregation. The dedup keeper is deterministic
    (lowest url within the hash's first micro-batch), so batch/stream parity
    is testable — tests/test_streaming.py::test_curated_spine_*.

    SINK CONTRACT: same upsert-by-key rule as stream_spine.

    TERMINATION: this query drains with availableNow, and the dedup state's
    processing-time timeouts would otherwise keep Spark scheduling state-
    cleanup microbatches forever (stateful module header) — so this helper
    calls enable_drain_termination(spark), a session-wide conf flip that
    makes TTL eviction lazy-on-next-data-batch. If the same session also
    runs a continuous stateful query that RELIES on idle-time eviction,
    start that query in a separate session."""
    from .stateful import enable_drain_termination, stream_dedup_first_seen

    enable_drain_termination(spark)
    src = read_document_stream(spark, landing_dir, max_files_per_trigger)
    deduped = stream_dedup_first_seen(src, state_ttl_ms=dedup_state_ttl_ms)
    return _spine_query(
        deduped, checkpoint_dir, polygons, sink, zoom, window, watermark, cell_level
    )


def _spine_query(
    docs: DataFrame,
    checkpoint_dir: str,
    polygons: DataFrame,
    sink: Callable[[DataFrame, int], None],
    zoom: int,
    window: str,
    watermark: str,
    cell_level: int,
) -> StreamingQuery:
    """Shared spine tail: extract -> geotag -> stream-static PIP ->
    watermarked windowed tile stats -> update-mode foreachBatch."""
    from ..functions.spatial import tile_x, tile_y
    from ..operators.pip import pip_join

    enriched = (
        geotag_stage(extract_stage(docs))
        .withColumn("n_chars", F.length("text_extracted").cast("long"))
        .drop("html")
        .withWatermark("warc_ts", watermark)
    )
    joined = pip_join(
        enriched,
        polygons,
        cell_level=cell_level,
        keep_point_cols=["url", "warc_ts", "lon", "lat", "n_chars"],
    )
    counts = (
        joined.groupBy(
            F.window("warc_ts", window).alias("w"),
            tile_x(F.col("lon"), zoom).alias("x"),
            tile_y(F.col("lat"), zoom).alias("y"),
        )
        .agg(F.count("*").alias("n_rows"), F.sum("n_chars").alias("sum_chars"))
        .select(
            F.col("w.start").alias("window_start"), "x", "y", "n_rows", "sum_chars"
        )
    )
    return (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def stream_tile_counts(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    zoom: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = 8,
) -> StreamingQuery:
    """Watermarked event-time tile counts, delivered via foreachBatch.

    Late documents beyond `watermark` are dropped deterministically; state for
    closed windows is evicted (bounded memory at unbounded input).

    SINK CONTRACT: same as stream_spine — update mode re-delivers keys with
    growing counts across micro-batches; `sink` must upsert by
    (window_start, x, y), never blind-append.
    """
    from ..functions.spatial import tile_x, tile_y

    src = read_document_stream(spark, landing_dir, max_files_per_trigger)
    enriched = geotag_stage(src).withWatermark("warc_ts", watermark)
    counts = (
        enriched.groupBy(
            F.window("warc_ts", window).alias("w"),
            tile_x(F.col("lon"), zoom).alias("x"),
            tile_y(F.col("lat"), zoom).alias("y"),
        )
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("w.start").alias("window_start"), "x", "y", "n_docs")
    )
    return (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
