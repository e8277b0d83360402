"""G6 + U1: generalized (simplified) tables and union views.

Reference analogs:
  G6 imposm/mapping.py::GeneralizedTable + imposm/db/postgis.py CTAS —
     `CREATE TABLE t_gen AS SELECT ST_Simplify(geometry, tol) ... WHERE ...`;
     here Douglas-Peucker (kernels.simplify) over Arrow batches, with the same
     drop-small-features intent: rings that collapse below 4 points vanish and
     are counted.
  U1 imposm/mapping.py::UnionView — UNION ALL with NULL-padded missing columns;
     here unionByName(allowMissingColumns=True) + a `src_table` discriminator.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import geom, simplify
from ..kernels.wkb import multipolygon_wkb, nested_to_rings

_POLY_T = T.ArrayType(T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))))


def simplify_polygons_udf(tolerance: float):
    """polygons ARRAY^4<DOUBLE> -> simplified polygons (or NULL if everything
    collapsed). Shell collapse drops the whole polygon incl. holes."""

    @F.pandas_udf(_POLY_T)
    def _udf(polygons: pd.Series) -> pd.Series:
        def one(polys):
            if polys is None:  # NULL geometry row: pass through, don't crash
                return None
            out = []
            for rings_nested in polys:
                rings = nested_to_rings(rings_nested)
                shell = simplify.simplify_ring(rings[0], tolerance)
                if shell is None:
                    continue
                new_rings = [shell.tolist()]
                for hole in rings[1:]:
                    h = simplify.simplify_ring(hole, tolerance)
                    if h is not None:
                        new_rings.append(h.tolist())
                out.append(new_rings)
            return out or None

        return polygons.map(one)

    return _udf


def generalized_table(
    origin: DataFrame,
    tolerance: float,
    where: Column | None = None,
    polygons_col: str = "polygons",
) -> DataFrame:
    """The GeneralizedTable CTAS: filter -> simplify -> recompute area/wkb,
    dropping features whose geometry collapsed at this tolerance.

    NULL geometry rows (union_view NULL-padding, nullable parquet read-back)
    are dropped BEFORE the UDF (review r5): besides being the semantics a
    generalized table wants, an Arrow batch whose deep-nested geometry
    column is ALL NULL crashes the pyarrow deserializer outright (the r3
    codec gotcha), so the guard must be a codegen filter ahead of the
    Python boundary, not (only) a None-check inside it."""
    df = origin.where(F.col(polygons_col).isNotNull())
    if where is not None:
        df = df.where(where)
    df = df.withColumn(polygons_col, simplify_polygons_udf(tolerance)(F.col(polygons_col)))
    df = df.where(F.col(polygons_col).isNotNull())

    @F.pandas_udf(T.DoubleType())
    def _area(polygons: pd.Series) -> pd.Series:
        def one(polys):
            # NULL-safe: Catalyst may evaluate projection UDFs before the
            # isNotNull filter they syntactically follow (collapsed stages)
            if polys is None:
                return None
            return geom.polygons_area(
                [nested_to_rings(rings_nested) for rings_nested in polys]
            )

        return polygons.map(one)

    @F.pandas_udf(T.BinaryType())
    def _wkb(polygons: pd.Series) -> pd.Series:
        return polygons.map(
            lambda polys: None if polys is None
            else multipolygon_wkb([nested_to_rings(p) for p in polys])
        )

    cols = [c for c in df.columns if c not in ("area", "wkb")]
    return df.select(
        *cols,
        _area(F.col(polygons_col)).alias("area"),
        _wkb(F.col(polygons_col)).alias("wkb"),
    )


def simplify_lines_udf(tolerance: float):
    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def _udf(coords: pd.Series) -> pd.Series:
        import numpy as np

        def one(pts):
            if pts is None:  # NULL geometry row: pass through, don't crash
                return None
            arr = np.asarray([list(p) for p in pts], dtype=np.float64)
            return simplify.simplify_line(arr, tolerance).tolist()

        return coords.map(one)

    return _udf


def generalized_lines(
    origin: DataFrame, tolerance: float, where: Column | None = None,
    coords_col: str = "coords",
) -> DataFrame:
    # NULL geometry dropped before the Python boundary — see generalized_table
    df = origin.where(F.col(coords_col).isNotNull())
    if where is not None:
        df = df.where(where)
    return df.withColumn(coords_col, simplify_lines_udf(tolerance)(F.col(coords_col)))


@dataclass(frozen=True)
class GeneralizedTableSpec:
    """Spec-level GeneralizedTable declaration (imposm/mapping.py::
    GeneralizedTable: `tolerance` + `where`, origin may itself be a
    generalized table — the gen0-from-gen1 chain). Units are map units
    (degrees in this engine); `where` is a SQL boolean over the origin's
    columns, applied BEFORE simplification like the reference's CTAS WHERE."""

    name: str
    origin: str
    tolerance: float
    where: str | None = None
    kind: str = "polygon"  # 'polygon' -> generalized_table, 'line' -> generalized_lines


def materialize_generalized(
    tables: dict[str, DataFrame], gspecs: list[GeneralizedTableSpec]
) -> dict[str, DataFrame]:
    """Materialize generalized tables in declaration order; later specs may
    originate from earlier generalized outputs (the reference's chained CTAS)."""
    out = dict(tables)
    for g in gspecs:
        origin = out[g.origin]
        w = F.expr(g.where) if g.where else None
        if g.kind == "polygon":
            out[g.name] = generalized_table(origin, g.tolerance, where=w)
        else:
            out[g.name] = generalized_lines(origin, g.tolerance, where=w)
    return out


def union_view(tables: dict[str, DataFrame], names: list[str] | None = None) -> DataFrame:
    """U1: NULL-padded union with a src_table discriminator column."""
    names = names or sorted(tables)
    if not names:
        # reduce() over an empty list raises an opaque TypeError far from
        # the cause (review r5) — name the real problem instead
        raise ValueError("union_view requires at least one table")
    parts = [tables[n].withColumn("src_table", F.lit(n)) for n in names]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
