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
mega-relation (10^5 members) is pre-split in assemble_relations: members are
hash-chunked at `MAX_MEMBERS_PER_GROUP`, each chunk partially merged
(kernels.rings.merge_fragments), and a second narrow applyInPandas stitches the
cross-chunk chains — ring merge is associative because stitching only depends
on endpoint connectivity. Mega-ways in J1 are handled by the shuffle join
itself (AQE skew).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom, rings as kr
from ..kernels.wkb import (
    linestring_wkb,
    multipolygon_wkb,
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


def way_polygons(assembled: DataFrame, repair: bool = False) -> DataFrame:
    """G3: closed (first==last), >=4 points, nonzero area; orientation-normalized
    single-ring polygons. Validity rule = kernels.geom.ring_is_valid (P5).

    repair=True enables the G5 buffer(0)-equivalent path (reference analog:
    imposm/geom.py validate; semantics = PostGIS ST_MakeValid linework): a
    self-intersecting ring is rebuilt from its arrangement under the even-odd
    rule (kernels.overlay.repair_ring) instead of dropped — a bowtie becomes
    two shells, emitted as one multipolygon row. Default False preserves the
    frozen detect-and-drop goldens."""
    closed = assembled.where(
        (F.size("coords") >= 4)
        & (F.element_at("coords", 1) == F.element_at("coords", -1))
    )

    def _batch(it):
        for pdf in it:
            out_rows = []
            for rid, tags, coords in zip(pdf["id"], pdf["tags"], pdf["coords"]):
                parts = _polygon_parts(coords, repair)
                if parts is None:
                    continue
                rings_out, area, wkb = parts
                out_rows.append(
                    {
                        "id": rid,
                        "tags": tags,
                        "rings": [r.tolist() for r in rings_out],
                        "area": area,
                        "wkb": wkb,
                    }
                )
            yield pd.DataFrame(
                out_rows,
                columns=["id", "tags", "rings", "area", "wkb"],
            )

    return closed.mapInPandas(_batch, schema=_POLYGON_SCHEMA)


def _polygon_parts(coords, repair: bool):
    """Per-ring G3/G5 decision, factored out of the worker closure so the
    repair fallback contract is unit-testable driver-side. Returns
    (rings_out, area, wkb) or None (row dropped)."""
    from ..kernels import overlay

    ring = np.asarray([list(p) for p in coords], dtype=np.float64)
    ring = geom.dedup_consecutive(ring)
    valid = geom.ring_is_valid(ring)
    plain = valid and (
        not repair or overlay.ring_is_simple(geom.ensure_closed(ring))
    )
    polys: list = []
    if not plain and repair and len(ring) >= 3:
        try:
            polys = overlay.repair_ring(geom.ensure_closed(ring))
        except ValueError:
            polys = []  # too degenerate to trace
        if not polys and valid:
            # Opting into repair must never LOSE rows relative to
            # repair=False (ADVICE r3): a valid-but-unrepairable ring falls
            # back to the unrepaired single-ring emit, parity with
            # repair=False. Only already-invalid rings stay dropped.
            plain = True
    if plain:
        ring = geom.ensure_orientation(geom.ensure_closed(ring), ccw=True)
        return [ring], abs(geom.ring_signed_area(ring)), polygon_wkb([ring])
    if repair and polys:
        rings_out = [r for p in polys for r in p]
        area = geom.polygons_area(polys)
        wkb = multipolygon_wkb(polys) if len(polys) > 1 else polygon_wkb(polys[0])
        return rings_out, area, wkb
    return None


def with_point_wkb(df: DataFrame) -> DataFrame:
    """G1: append a point-WKB column derived from lon/lat, preserving every
    input column. Callers must route/filter FIRST: Catalyst cannot push a
    semi-join or filter through mapInPandas, so whatever reaches this stage
    pays the Python/Arrow boundary row-for-row."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField("wkb", BinaryType())])

    def _batch(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["wkb"] = [point_wkb(x, y) for x, y in zip(pdf["lon"], pdf["lat"])]
            yield pdf

    return df.mapInPandas(_batch, schema=out_schema)


def node_points(nodes: DataFrame) -> DataFrame:
    """G1 standalone form: (id, tags, lon, lat, wkb) for a node table."""
    return with_point_wkb(nodes.select("id", "tags", "lon", "lat"))


# --------------------------------------------------------------------------
# J2 + A2-A4: relation multipolygon assembly
# --------------------------------------------------------------------------
_REL_OUT_SCHEMA = (
    "rel_id long, tags map<string,string>, "
    "polygons array<array<array<array<double>>>>, area double, wkb binary, "
    "n_rings int, dropped_unclosed int, dropped_invalid int, "
    "inserted_ways array<long>"
)

_REL_OUT_COLUMNS = [
    "rel_id", "tags", "polygons", "area", "wkb", "n_rings",
    "dropped_unclosed", "dropped_invalid", "inserted_ways",
]


def _finalize_relation(
    rel_id: int,
    rel_tags: dict,
    merge: kr.MergeResult,
    ways_meta: list[tuple[int, dict, float | None, bytes | None]],
    builder: str = "contains",
) -> pd.DataFrame:
    """Shared tail of both assembly paths: nest rings, inherit tags (A4),
    decide way suppression (P4), emit the output row.

    ways_meta: (way_id, way_tags, outer_area, ring_key) — area/key are the
    way's own shoelace area and canonical-ring bytes if it is a closed
    >=4-point ring, else None.
    builder: A3 strategy — 'contains' (nesting, the reference default) or
    'union' (arrangement overlay, tolerant of overlapping/crossing rings).

    A4 candidacy is decided against the BUILT multipolygon: a closed member
    way is an outer candidate iff its canonical ring is one of the result
    SHELLS. The earlier "any closed way" rule misfired when the outer
    boundary was stitched from open fragments: the only closed way was the
    hole (e.g. a tagged lake), the relation inherited the HOLE's tags, and
    P4 then suppressed the lake way — the polygon turned into water and the
    lake vanished as a feature. Shells merged/reshaped by the union builder
    simply yield no candidate (no inheritance), never a wrong one.
    """
    if builder == "union":
        mp = kr.build_multipolygon_union(merge)
    else:
        mp = kr.build_multipolygon(merge)
    if not mp.polygons:
        return pd.DataFrame(columns=_REL_OUT_COLUMNS)

    shell_keys = {
        geom.canonical_ring(poly[0], ccw=True).tobytes() for poly in mp.polygons
    }
    outer_candidates = [
        (a, t) for _, t, a, k in ways_meta if a is not None and k in shell_keys
    ]
    final_tags = kr.inherit_tags(rel_tags, outer_candidates)
    inserted = [wid for wid, wtags, _, _ in ways_meta
                if kr.way_tags_subsumed(wtags, final_tags)]
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


def _way_meta(
    way_id, way_tags, coords: np.ndarray
) -> tuple[int, dict, float | None, bytes | None]:
    """(way_id, tags, own-ring area, canonical-ring key) — area and key are
    None for open fragments. The key (canonical_ring bytes — shared form
    with the nesting/overlay kernels) lets _finalize_relation decide outer
    candidacy from the BUILT shells instead of "any closed way"."""
    outer_area = None
    ring_key = None
    # dedup consecutive vertices FIRST so the key form is byte-identical to
    # the shell side (merge_rings canonicalizes after dedup_consecutive,
    # kernels/rings.py): a closed member way carrying a repeated vertex —
    # common in raw OSM — must still match its own built shell, else tag
    # inheritance (A4) and way suppression (P4) silently skip it
    ring = geom.dedup_consecutive(coords)
    if len(ring) >= 4 and np.array_equal(ring[0], ring[-1]):
        outer_area = abs(geom.ring_signed_area(ring))
        ring_key = geom.canonical_ring(ring, ccw=True).tobytes()
    return (int(way_id), dict(way_tags or {}), outer_area, ring_key)


def _make_assemble_kernel(builder: str):
    def _assemble_relation_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """Kernel for one relation group (rows = resolved member ways)."""
        rel_id = int(pdf["rel_id"].iloc[0])
        rel_tags = dict(pdf["rel_tags"].iloc[0] or {})

        pdf = pdf.sort_values("way_id")
        coords_list = [
            np.asarray([list(p) for p in c], dtype=np.float64) for c in pdf["coords"]
        ]
        ways_meta = [
            _way_meta(wid, wtags, c)
            for wid, wtags, c in zip(pdf["way_id"], pdf["way_tags"], coords_list)
        ]
        merge = kr.merge_rings(coords_list)
        return _finalize_relation(rel_id, rel_tags, merge, ways_meta, builder)

    return _assemble_relation_group


# O10b: AQE cannot split a single applyInPandas group, so a mega-relation
# (10^5+ members) must be pre-split upstream. Groups wider than this are
# hash-chunked on way_id, partially merged per chunk (kernels.rings.
# merge_fragments — associative: a stitched chain is itself a valid input
# way for the next level), then finalized in a second, narrow applyInPandas
# whose rows are chunk summaries + per-way metadata (no coords), bounding
# executor memory by max_members x way size instead of relation size.
MAX_MEMBERS_PER_GROUP = 4096

# rings/chains travel as PICKLED BINARY, not array<array<array<double>>>:
# the Arrow->pandas deserializer (pyarrow 16.1 / applyInPandas) SEGFAULTS on
# a triple-nested list column whose batch holds only empty/NULL values —
# exactly what a chunk whose rings all closed produces (chains = []).
# Reproduced minimally: [(1, [], None-row)] through an identity
# applyInPandas kills the worker; one non-empty value per batch masks it,
# which is why the mega-relation identity test (always-open chains) passed.
_PARTIAL_SCHEMA = (
    "rel_id long, rel_tags map<string,string>, chunk int, kind string, "
    "rings binary, chains binary, "
    "dropped_invalid int, way_id long, way_tags map<string,string>, "
    "outer_area double, ring_key binary"
)


def _partial_merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage-A kernel for one (rel_id, chunk): emits ONE 'geom' row (closed
    rings + open chains + invalid count) and one 'meta' row per member way
    (tags + own closed area — what A4/P4 need, without the coords)."""
    rel_id = int(pdf["rel_id"].iloc[0])
    rel_tags = dict(pdf["rel_tags"].iloc[0] or {})
    chunk = int(pdf["_chunk"].iloc[0])

    pdf = pdf.sort_values("way_id")
    coords_list = [
        np.asarray([list(p) for p in c], dtype=np.float64) for c in pdf["coords"]
    ]
    closed, chains, dropped_invalid = kr.merge_fragments(coords_list)
    rows = [
        {
            "rel_id": rel_id, "rel_tags": rel_tags, "chunk": chunk,
            "kind": "geom",
            "rings": pickle.dumps([np.asarray(r) for r in closed], protocol=4),
            "chains": pickle.dumps([np.asarray(c) for c in chains], protocol=4),
            "dropped_invalid": dropped_invalid,
            "way_id": None, "way_tags": None, "outer_area": None,
            "ring_key": None,
        }
    ]
    for wid, wtags, c in zip(pdf["way_id"], pdf["way_tags"], coords_list):
        mid, mtags, marea, mkey = _way_meta(wid, wtags, c)
        rows.append(
            {
                "rel_id": rel_id, "rel_tags": rel_tags, "chunk": chunk,
                "kind": "meta", "rings": None, "chains": None,
                "dropped_invalid": None,
                "way_id": mid, "way_tags": mtags, "outer_area": marea,
                "ring_key": mkey,
            }
        )
    return pd.DataFrame(rows)


def _make_finalize_chunked_kernel(builder: str):
    def _finalize_chunked_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return _finalize_chunked_group_impl(pdf, builder)

    return _finalize_chunked_group


def _finalize_chunked_group_impl(pdf: pd.DataFrame, builder: str) -> pd.DataFrame:
    """Stage-B kernel: stitch cross-chunk chains, validity-filter, nest, and
    emit the same row the single-stage kernel would."""
    rel_id = int(pdf["rel_id"].iloc[0])
    rel_tags = dict(pdf["rel_tags"].iloc[0] or {})

    geoms = pdf[pdf["kind"] == "geom"].sort_values("chunk")
    ways_input: list[np.ndarray] = []
    chunk_invalid = 0
    for inv, rings_b, chains_b in zip(
        geoms["dropped_invalid"], geoms["rings"], geoms["chains"]
    ):
        chunk_invalid += int(inv)
        for r in pickle.loads(bytes(rings_b)):
            ways_input.append(np.asarray(r, dtype=np.float64))
        for c in pickle.loads(bytes(chains_b)):
            ways_input.append(np.asarray(c, dtype=np.float64))

    merge = kr.merge_rings(ways_input)
    merge.dropped_invalid += chunk_invalid

    meta = pdf[pdf["kind"] == "meta"].sort_values("way_id")
    ways_meta = [
        (
            int(wid),
            dict(wtags or {}),
            None if pd.isna(area) else float(area),
            None if key is None else bytes(key),
        )
        for wid, wtags, area, key in zip(
            meta["way_id"], meta["way_tags"], meta["outer_area"],
            meta["ring_key"],
        )
    ]
    return _finalize_relation(rel_id, rel_tags, merge, ways_meta, builder)


def assemble_relations(
    relations: DataFrame,
    assembled_ways: DataFrame,
    max_members: int = MAX_MEMBERS_PER_GROUP,
    relation_builder: str = "contains",
) -> DataFrame:
    """J2 + A2-A4: -> one row per buildable relation (see _REL_OUT_SCHEMA).

    relations: (id, tags, members ARRAY<STRUCT<ref, type, role>>)
    assembled_ways: output of assemble_ways.

    Relations with more than `max_members` resolved way members take the
    chunked two-stage path (O10b, see MAX_MEMBERS_PER_GROUP above); output is
    identical to the single-stage path (tests/test_assemble.py proves it on a
    synthetic 10^4-member relation).

    relation_builder: 'contains' (default, reference default) or 'union'
    (imposm --relation-builder=union analog, kernels.overlay) — affects only
    the per-group nesting kernel, not the plan shape.
    """
    # Size routing is decided BEFORE the fat resolve join, from the members
    # array itself: `_n` = way-member count, stamped per exploded row for free
    # (no count aggregate, no action, no broadcast). The two paths filter on
    # complementary `_n` predicates that Catalyst pushes below the join, so
    # each member row flows through the J2 shuffle join exactly ONCE across
    # the union (previous shape executed the joined frame 3x: once for a
    # routing aggregate, once per path). `_n` is the pre-resolve count, so a
    # relation whose unresolved refs straddle the threshold may route to the
    # chunked path slightly early — routing is perf-only; both paths are
    # output-identical (tests/test_assemble.py identity test).
    members = relations.select(
        F.col("id").alias("rel_id"),
        F.col("tags").alias("rel_tags"),
        F.size(
            F.filter("members", lambda m: m["type"] == F.lit("way"))
        ).alias("_n"),
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
    ).select("rel_id", "rel_tags", "_n", "way_id", "way_tags", "coords")

    small_out = (
        resolved.where(F.col("_n") <= max_members)
        .drop("_n")
        .groupBy("rel_id")
        .applyInPandas(_make_assemble_kernel(relation_builder), schema=_REL_OUT_SCHEMA)
    )

    chunked = resolved.where(F.col("_n") > max_members).withColumn(
        "_chunk",
        # hash the way id before the modulo (review r5): raw pmod collapses
        # stride/residue-aligned id sequences (bulk imports, way splitters)
        # into few chunks, defeating the O10b per-group memory bound this
        # pre-split exists for. Output-identical for any chunking (the
        # partial merge is associative; pinned by the chunked-path identity
        # test) — same pattern as knn/pip salting.
        F.pmod(
            F.xxhash64(F.col("way_id")),
            F.ceil(F.col("_n") / F.lit(max_members)),
        ).cast("int"),
    )
    partial = chunked.groupBy("rel_id", "_chunk").applyInPandas(
        _partial_merge_group, schema=_PARTIAL_SCHEMA
    )
    big_out = partial.groupBy("rel_id").applyInPandas(
        _make_finalize_chunked_kernel(relation_builder), schema=_REL_OUT_SCHEMA
    )
    return small_out.unionByName(big_out)


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
