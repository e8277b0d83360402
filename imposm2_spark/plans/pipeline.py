"""The M1 spine: documents -> extract -> geotag -> cell -> PIP join -> tiles.

This is the flagship end-to-end flow (SURVEY.md §7 M1): the graft equivalent of
imposm2's `--read` + `--write` run (imposm/app.py::main -> writer.py pipeline),
with web documents playing the node-stream role (SURVEY.md §1.3).

Shape of the physical plan (verified by tests/test_plans.py explain checks):
  parquet/createDataFrame scan
  -> Arrow-batched extract+geotag (the only Python stages)
  -> codegen'd cell/tile arithmetic
  -> broadcast-hash PIP prefilter join (no shuffle on the big side)
  -> exact refine filter
  -> single shuffle for the final tile aggregation
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geotag import geotag
from ..functions.textx import extract_text
from ..operators.pip import pip_join
from ..operators.tiles import assign_point_tiles

DEFAULT_ZOOMS = (8, 12)


def extract_stage(docs: DataFrame) -> DataFrame:
    """html -> extracted text (frozen spec v1), kept alongside the input text
    column (if any) so parity can be asserted downstream."""
    return docs.withColumn("text_extracted", extract_text("html"))


def geotag_stage(docs: DataFrame) -> DataFrame:
    g = geotag("url", "html")
    return docs.withColumn("_geo", g).select(
        "*", F.col("_geo.lon").alias("lon"), F.col("_geo.lat").alias("lat")
    ).drop("_geo")


def _enrich_fused_udf():
    """ONE Arrow-batched struct UDF for the spine's Python stage (r6, guide
    §4.1/§2.3): extraction + geotag run in a single crossing over (url,
    html), and only (lon, lat, n_chars) return — the extracted text used to
    ship back through Arrow in full just so the JVM could take length() of
    it for sum_chars. n_chars = len(extracted) in Python == the codepoint
    count Spark's length() computed (same string, byte-identical extractor —
    parity pytest in tests/test_textx_geotag.py). Extraction still executes
    per row inside the opaque UDF, so the flagship stage stays measured."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.geotag import geotag_pair
    from ..functions.textx import extract_text_bytes

    schema = T.StructType(
        [
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )

    def _f(url, html):  # pd.Series x2 -> pd.DataFrame (struct)
        lons, lats, ncs = [], [], []
        for u, h in zip(url, html):
            lon, lat = geotag_pair(u, h)
            t = extract_text_bytes(h)
            lons.append(lon)
            lats.append(lat)
            ncs.append(None if t is None else len(t))
        return pd.DataFrame(
            {"lon": lons, "lat": lats,
             "n_chars": pd.array(ncs, dtype="Int64")}
        )

    return F.pandas_udf(_f, schema)


def spine(
    docs: DataFrame,
    polygons: DataFrame,
    zooms: tuple[int, ...] = DEFAULT_ZOOMS,
    cell_level: int = 12,
    salt_factor: int | None = None,
) -> DataFrame:
    """Full M1 flow -> per-tile (z, x, y, n_docs, n_polygons, sum_chars).

    sum_chars aggregates the extracted-text length so the extraction stage
    is a CONSUMED part of the plan — without a consumer Catalyst's column
    pruning (correctly) deletes the extract work and the flagship query
    silently stops measuring it. r6: extract+geotag+length fuse into one
    Arrow crossing (_enrich_fused_udf) — html crosses once, three scalars
    return, tile rows unchanged (pytest-pinned vs the staged path).
    """
    fused = _enrich_fused_udf()
    enriched = docs.withColumn(
        "_g", fused(F.col("url"), F.col("html"))
    ).select(
        "*",
        F.col("_g.lon").alias("lon"),
        F.col("_g.lat").alias("lat"),
        F.col("_g.n_chars").alias("n_chars"),
    ).drop("_g")
    joined = pip_join(
        enriched,
        polygons,
        cell_level=cell_level,
        salt_factor=salt_factor,
        keep_point_cols=["url", "lon", "lat", "n_chars"],
    )
    tiled = assign_point_tiles(joined, list(zooms))
    return tiled.groupBy("z", "x", "y").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("polygon_id").alias("n_polygons"),
        F.sum("n_chars").alias("sum_chars"),
    )


def spine_resumable(
    spark,
    docs: DataFrame,
    polygons: DataFrame,
    checkpoint_root: str,
    input_fingerprint: str,
    zooms: tuple[int, ...] = DEFAULT_ZOOMS,
    cell_level: int = 12,
) -> DataFrame:
    """The spine with M6 durable stage boundaries (plans.checkpoint).

    Stage cuts sit where recompute is expensive and the output is much
    smaller than the input — the checkpointed frames drop `html`:
      enrich   : scan + Arrow extract/geotag (Python-boundary cost)
      pip_join : shuffle/broadcast join + exact refine (join cost)
    The final tile aggregation is cheap relative to its input and stays
    uncheckpointed. A restart replays only missing/invalidated stages.
    """
    from .checkpoint import CheckpointManager

    mgr = CheckpointManager(checkpoint_root)
    enriched = mgr.stage(
        spark,
        "enrich",
        lambda: geotag_stage(extract_stage(docs))
        .withColumn("n_chars", F.length("text_extracted").cast("long"))
        .drop("html"),
        input_fingerprint=input_fingerprint,
    )
    # the polygons input must invalidate the join checkpoint too: folding
    # only the docs fingerprint + enrich digest silently reused tiles built
    # against a DIFFERENT polygon set. Order-independent content digest via
    # one tiny job over the (small, broadcast-side by contract) dim table.
    poly_fp_row = polygons.select(
        F.sum(F.pmod(F.xxhash64(*polygons.columns), F.lit(1 << 31))).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    joined = mgr.stage(
        spark,
        "pip_join",
        lambda: pip_join(
            enriched,
            polygons,
            cell_level=cell_level,
            keep_point_cols=["url", "lon", "lat", "n_chars"],
        ),
        input_fingerprint=f"polygons:{poly_fp_row['s']}:{poly_fp_row['n']}",
        parents=("enrich",),
    )
    tiled = assign_point_tiles(joined, list(zooms))
    return tiled.groupBy("z", "x", "y").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("polygon_id").alias("n_polygons"),
        F.sum("n_chars").alias("sum_chars"),
    )
