"""J4: point-in-polygon spatial join — cell prefilter + exact ray-cast refine.

Graft addition (SURVEY.md J4); the reference's nearest analog is the prepared-
geometry containment testing in imposm/multipolygon.py::ContainsRelationBuilder,
which this reuses at the kernel level (kernels.geom ray cast, half-open rule).

Two-phase plan (scales to 10^12 points):
  1. PREFILTER — equi-join `point.cell == polygon.covering_cell` at `cell_level`.
     Polygon side is exploded to one row per covering cell and broadcast when
     small (the common case: polygon count << point count). Candidate pairs are
     a tiny superset of the true result.
  2. REFINE — exact even-odd ray cast per Arrow batch (pandas UDF); inside the
     batch, points are grouped per polygon so each polygon's rings are decoded
     once and tested vectorized across all its candidate points.

Geometry travels ONCE per executor, not once per candidate row: in the
broadcast path the prefilter join carries only (polygon_id, cell) and the
refine UDF reads ring arrays from a Spark broadcast dict — attaching `rings`
to every candidate row would Arrow-serialize each polygon's coordinates per
matched point (measured ~2x the whole stage cost at 10^6 points; fatal at
10^12). The shuffle path (broadcast_polygons=False, polygon side too big for
the driver) still carries rings in-row, where the shuffle co-locates them.

Skew (O10a): one dense cell can dominate the shuffle when the polygon side is
too big to broadcast. `salt_factor=k` replicates each polygon cell-row k ways
and buckets points by a hash — spreading the hot cell over k shuffle partitions.
With a broadcast polygon side there is no shuffle at all, so salting is off by
default and AQE skew-join covers the moderate cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.spatial import cell_encode_col
from ..kernels import geom
from ..kernels.wkb import nested_to_rings

DEFAULT_CELL_LEVEL = 12

# auto-salt gate: below this many rows in the hottest cell, salting is a
# no-op-to-harmful (fixed overhead, nothing to spread) and stays off
AUTO_SALT_HOT_MIN = 4096
AUTO_SALT_CAP = 32


def auto_salt_factor(
    keyed: "DataFrame",
    key_cols: list,
    hot_min: int = AUTO_SALT_HOT_MIN,
    cap: int = AUTO_SALT_CAP,
) -> int | None:
    """O10a self-gating fan-out (r6, VERDICT r5 ask #2): derive the salt
    factor from the OBSERVED key histogram instead of a blind constant that
    can invert under load. One bounded aggregate over the keyed side
    (max/total per key — a map-side-combined count, never payloads):

      * gate OFF (None) when the hottest key holds < `hot_min` rows or no
        more than ~2 ideal task shares — nothing worth spreading;
      * otherwise the smallest power of 2 that brings the hot key's share
        down to one ideal task share, capped at `cap` (salting multiplies
        probe/replica work linearly, so unbounded fan-out is its own skew).

    Deterministic given the data; output rows are identical for every salt
    choice by the salting construction (pytest-pinned).
    """
    row = (
        keyed.groupBy(*key_cols)
        .count()
        .agg(F.max("count").alias("hot"), F.sum("count").alias("total"))
        .collect()[0]
    )
    hot = int(row["hot"] or 0)
    total = int(row["total"] or 0)
    par = keyed.sparkSession.sparkContext.defaultParallelism
    target = max(1, total // max(par, 1))
    if hot < hot_min or hot <= 2 * target:
        return None
    k = 1
    while k < cap and hot // k > target:
        k *= 2
    return k


@F.pandas_udf(T.BooleanType())
def _contains_udf(polygon_id: pd.Series, rings: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    """Exact PIP refine: vectorized per polygon within each Arrow batch."""
    out = np.zeros(len(polygon_id), dtype=bool)
    lon_v = lon.to_numpy(dtype=np.float64)
    lat_v = lat.to_numpy(dtype=np.float64)
    pid = polygon_id.to_numpy()
    for p in pd.unique(pid):
        idx = np.flatnonzero(pid == p)
        first = rings.iloc[idx[0]]
        ring_arrays = nested_to_rings(first)
        out[idx] = geom.points_in_rings(lon_v[idx], lat_v[idx], ring_arrays)
    return pd.Series(out)


def explode_polygon_cells(
    polygons: DataFrame, salt_factor: int | None = None, with_rings: bool = True
) -> DataFrame:
    """(polygon_id, rings, cells) -> one row per covering cell [x salt replica]."""
    cols = ["polygon_id"] + (["rings"] if with_rings else [])
    exploded = polygons.select(*cols, F.explode("cells").alias("cell"))
    if salt_factor and salt_factor > 1:
        exploded = exploded.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("salt")
        )
    return exploded


def _contains_udf_broadcast(rings_bc):
    """Refine UDF reading ring arrays from a per-executor broadcast dict."""

    @F.pandas_udf(T.BooleanType())
    def _contains(polygon_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        rings_by_pid = rings_bc.value
        out = np.zeros(len(polygon_id), dtype=bool)
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        pid = polygon_id.to_numpy()
        for p in pd.unique(pid):
            idx = np.flatnonzero(pid == p)
            out[idx] = geom.points_in_rings(lon_v[idx], lat_v[idx], rings_by_pid[p])
        return pd.Series(out)

    return _contains


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    lon: str | Column = "lon",
    lat: str | Column = "lat",
    cell_level: int = DEFAULT_CELL_LEVEL,
    broadcast_polygons: bool = True,
    salt_factor: int | str | None = None,
    keep_point_cols: list[str] | None = None,
    max_broadcast_polygons: int = 100_000,
) -> DataFrame:
    """Inner spatial join: one output row per (point, containing polygon).

    points:   any DataFrame with lon/lat columns (plus carried columns).
    polygons: (polygon_id, rings ARRAY<ARRAY<ARRAY<DOUBLE>>>, cells ARRAY<LONG>)
              where `cells` are level-`cell_level` covering cells (see
              sources.fixtures.make_polygons_admin / operators.tiles.covering_cells).

    broadcast_polygons=True EAGERLY pulls every polygon's rings to the driver
    at plan-construction time (then re-ships them once per executor as a Spark
    broadcast). The pull itself is capped: it collects limit(cap+1) rows — ONE
    action, driver memory bounded by `max_broadcast_polygons` ring sets — and
    if the extra row comes back the polygon side is too big, so the join
    degrades to the co-locating shuffle path instead of OOMing the driver.
    (A toLocalIterator stream was measured 2.3x slower end-to-end from its
    sequential per-partition jobs; a separate count-probe action costs a full
    extra scan.)
    """
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    pts = points.withColumn("_cell", cell_encode_col(lon_c, lat_c, cell_level))

    if isinstance(salt_factor, str) and salt_factor != "auto":
        raise ValueError(
            f"salt_factor must be an int, None, or 'auto', got {salt_factor!r}"
        )

    rings_by_pid: dict | None = None
    if broadcast_polygons:
        capped = (
            polygons.select("polygon_id", "rings")
            .limit(max_broadcast_polygons + 1)
            .collect()
        )
        if len(capped) > max_broadcast_polygons:
            broadcast_polygons = False  # auto-fallback: shuffle path
        else:
            rings_by_pid = {r["polygon_id"]: nested_to_rings(r["rings"]) for r in capped}

    if salt_factor == "auto":
        # measured fan-out (SURVEY O10a promise; auto_salt_factor above),
        # resolved AFTER the broadcast decision: salting only spreads a
        # SHUFFLE's hot keys, so it is always off on the broadcast path.
        # The histogram aggregate makes this branch EAGER (one bounded
        # cells-only job at call time).
        salt_factor = (
            None if broadcast_polygons else auto_salt_factor(pts, ["_cell"])
        )

    poly_cells = explode_polygon_cells(
        polygons, salt_factor, with_rings=not broadcast_polygons
    )
    if broadcast_polygons:
        # rings once per executor (broadcast variable), candidate rows slim.
        # Lifecycle: the broadcast lives as long as the returned frame can
        # be evaluated (the UDF closure holds it), then Python GC +
        # Spark's ContextCleaner reclaim it when the caller drops the frame
        # — standard Spark broadcast semantics; an explicit destroy() here
        # would poison a still-lazy result
        rings_bc = points.sparkSession.sparkContext.broadcast(rings_by_pid)
        contains = _contains_udf_broadcast(rings_bc)
        refine_cols = lambda: contains(F.col("polygon_id"), lon_c, lat_c)
        poly_cells = F.broadcast(poly_cells)
    else:
        refine_cols = lambda: _contains_udf(
            F.col("polygon_id"), F.col("rings"), lon_c, lat_c
        )

    if salt_factor and salt_factor > 1:
        pts = pts.withColumn(
            "_salt", F.pmod(F.xxhash64(lon_c, lat_c), F.lit(salt_factor)).cast("int")
        )
        cond = (pts["_cell"] == poly_cells["cell"]) & (pts["_salt"] == poly_cells["salt"])
    else:
        cond = pts["_cell"] == poly_cells["cell"]

    candidates = pts.join(poly_cells, cond, "inner")
    refined = candidates.where(refine_cols())
    drop = ["_cell", "cell"] + ([] if broadcast_polygons else ["rings"]) + (
        ["_salt", "salt"] if salt_factor and salt_factor > 1 else []
    )
    out = refined.drop(*drop)
    if keep_point_cols is not None:
        out = out.select(*keep_point_cols, "polygon_id")
    return out


def pip_join_brute(
    points: DataFrame,
    polygons: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Oracle-grade brute force: cross join + exact refine (tests only)."""
    cand = points.crossJoin(F.broadcast(polygons.select("polygon_id", "rings")))
    return cand.where(
        _contains_udf(F.col("polygon_id"), F.col("rings"), F.col(lon), F.col(lat))
    ).drop("rings")
