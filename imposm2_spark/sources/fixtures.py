"""Deterministic synthetic fixtures (FIXTURES.md) — seed=42, index-derived only.

- documents_web: the graft's primary input shape (url, warc_ts, html, text, lang)
  with an analytically-constructed golden `text` column (NOT produced by running
  the extractor — so extractor tests are meaningful).
- polygons_admin: 25 polygons incl. overlaps, a hole, and the Berlin dense box.
- osm fixture tables: nodes/ways/relations grid + MP-01..09 parity cases
  (reference analog: imposm/test/test_multipolygon.py input shapes).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..functions import geotag
from ..kernels import cells as kcells

_VOCAB = [
    "data", "spark", "tile", "river", "mountain", "city", "index", "vector",
    "raster", "crawl", "page", "query", "join", "cell", "ring", "polygon",
    "stream", "batch", "shuffle", "broadcast",
]

ENTITY_SNIPPET = "&amp; &lt; &#65;"
ENTITY_DECODED = "& < A"
NESTED_SNIPPET = "<b>bold <i>deep</i></b> tail"
NESTED_TEXT = "bold deep tail"

BERLIN = (13.0, 52.3, 13.8, 52.7)  # dense-cell skew box
_LANGS = ["en", "de", "fr", "es", "zh"]


def _words(i: int) -> str:
    """Seeded token sequence: 5 + (i mod 7) words chosen by index arithmetic."""
    n = 5 + (i % 7)
    return " ".join(_VOCAB[(i * 7 + j * 13) % len(_VOCAB)] for j in range(n))


def _coords(i: int) -> tuple[float, float]:
    """Deterministic (lon, lat); every 5th row (i%5==0) inside the Berlin box
    => 20% skew into one dense cell (FIXTURES §1)."""
    if i % 5 == 0:
        lon = BERLIN[0] + ((i * 37) % 800) / 1000.0  # [13.0, 13.8)
        lat = BERLIN[1] + ((i * 53) % 400) / 1000.0  # [52.3, 52.7)
    else:
        lon = ((i * 9973) % 3_600_000) / 10_000.0 - 180.0
        lat = ((i * 7919) % 1_700_000) / 10_000.0 - 85.0
    return round(lon, 4), round(lat, 4)


def make_documents_web(n: int) -> pd.DataFrame:
    """FIXTURES §1 documents_web table with golden text + golden lon/lat."""
    rows = []
    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(n):
        url = f"https://example.org/p/{i:08d}"
        lon, lat = _coords(i)
        has_meta = i % 10 != 0
        words = _words(i)
        body_extra = ""
        text_extra = ""
        if i % 17 == 0:
            body_extra = f"<p>{ENTITY_SNIPPET}</p><p>{NESTED_SNIPPET}</p>"
            text_extra = f" {ENTITY_DECODED} {NESTED_TEXT}"
        meta = (
            f'<meta name="geo.position" content="{lat};{lon}"/>' if has_meta else ""
        )
        html = (
            f"<html><head><title>T{i}</title>{meta}<style>.x{{}}</style></head>"
            f"<body><script>var a=1;</script><h1>T{i}</h1><p>{words}</p>"
            f"{body_extra}</body></html>"
        ).encode("utf-8")
        text = f"T{i} T{i} {words}{text_extra}"
        if not has_meta:  # golden geotag = url-hash fallback
            lon, lat = geotag.fallback_lon(url), geotag.fallback_lat(url)
        rows.append(
            {
                "url": url,
                "warc_ts": epoch + dt.timedelta(seconds=i % 86400),
                "html": html,
                "text": text,
                "lang": _LANGS[i % 5],
                "golden_lon": lon,
                "golden_lat": lat,
            }
        )
    return pd.DataFrame(rows)


def make_polygons_admin(cell_level: int = 12) -> pd.DataFrame:
    """FIXTURES §3: 25 polygons with covering cells at `cell_level`.

    polygon_id 0..19: disjoint 4x5 grid of rectangles tiling [-10,10]^2
    20..22: overlapping rectangles (docs can match 2 polygons)
    23: rectangle with a hole
    24: the Berlin dense box (skew target)
    """

    def rect(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )

    polys: list[tuple[int, str, int, list[np.ndarray]]] = []
    pid = 0
    for r in range(5):
        for c in range(4):
            x0, y0 = -10.0 + c * 5.0, -10.0 + r * 4.0
            polys.append((pid, f"grid_{r}_{c}", 6, [rect(x0, y0, x0 + 5.0, y0 + 4.0)]))
            pid += 1
    polys.append((20, "overlap_a", 4, [rect(20.0, 20.0, 24.0, 24.0)]))
    polys.append((21, "overlap_b", 4, [rect(22.0, 22.0, 26.0, 26.0)]))
    polys.append((22, "overlap_c", 4, [rect(23.0, 23.0, 23.5, 23.5)]))
    polys.append((23, "holed", 4, [rect(30.0, 30.0, 34.0, 34.0), rect(31.0, 31.0, 33.0, 33.0)[::-1].copy()]))
    polys.append((24, "berlin_box", 4, [rect(*BERLIN)]))

    rows = []
    for pid, name, lvl, rings in polys:
        xs = np.vstack(rings)
        cover = kcells.covering_cells_bbox(
            float(xs[:, 0].min()), float(xs[:, 1].min()),
            float(xs[:, 0].max()), float(xs[:, 1].max()), cell_level,
        )
        rows.append(
            {
                "polygon_id": pid,
                "name": name,
                "admin_level": lvl,
                "rings": [r.tolist() for r in rings],
                "cells": cover.tolist(),
            }
        )
    return pd.DataFrame(rows)


OSM_NODES_SCHEMA = "id long, lon double, lat double, tags map<string,string>"
OSM_WAYS_SCHEMA = "id long, refs array<long>, tags map<string,string>"
OSM_RELATIONS_SCHEMA = (
    "id long, members array<struct<ref:long, type:string, role:string>>, "
    "tags map<string,string>"
)


def make_osm_fixture() -> tuple[list, list, list]:
    """FIXTURES §2: reference-parity multipolygon cases MP-01..09 plus a street
    grid. Returns (nodes, ways, relations) row lists; ids are fixed so goldens
    are stable. Node ids: 1000*case + k. Way ids: case*10 + j. Relation ids:
    = case number (1..9). Grid uses ids >= 100000."""
    nodes, ways, relations = [], [], []

    def add_nodes(case: int, pts: list[tuple[float, float]], start: int = 0) -> list[int]:
        ids = []
        for k, (x, y) in enumerate(pts, start=start):
            nid = case * 1000 + k
            nodes.append((nid, float(x), float(y), {}))
            ids.append(nid)
        return ids

    def square(cx: float, cy: float, r: float) -> list[tuple[float, float]]:
        return [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r), (cx - r, cy + r)]

    # MP-01: closed outer square + closed inner square, type=multipolygon landuse=park
    o = add_nodes(1, square(5, 5, 5))
    i = add_nodes(1, square(5, 5, 1), start=10)
    ways.append((11, o + o[:1], {}))
    ways.append((12, i + i[:1], {}))
    relations.append(
        (1, [(11, "way", "outer"), (12, "way", "inner")],
         {"type": "multipolygon", "landuse": "park"})
    )

    # MP-02: outer ring split across 3 open ways, one reversed, members unordered
    o = add_nodes(2, square(5, 5, 5))
    ways.append((21, [o[0], o[1]], {}))
    ways.append((22, [o[3], o[2], o[1]], {}))  # reversed direction
    ways.append((23, [o[3], o[0]], {}))
    relations.append(
        (2, [(22, "way", ""), (23, "way", "outer"), (21, "way", "")],
         {"type": "multipolygon", "natural": "water"})
    )

    # MP-03: two outers + one inner inside the first
    o1 = add_nodes(3, square(5, 5, 5))
    o2 = add_nodes(3, square(100, 5, 4), start=10)
    i1 = add_nodes(3, square(5, 5, 1), start=20)
    ways.append((31, o1 + o1[:1], {}))
    ways.append((32, o2 + o2[:1], {}))
    ways.append((33, i1 + i1[:1], {}))
    relations.append(
        (3, [(31, "way", "outer"), (32, "way", "outer"), (33, "way", "inner")],
         {"type": "multipolygon", "landuse": "forest"})
    )

    # MP-04: inner touching outer at one vertex
    o = add_nodes(4, square(5, 5, 5))
    i = add_nodes(4, [(0.0, 0.0), (3.0, 1.0), (1.0, 3.0)], start=10)
    ways.append((41, o + o[:1], {}))
    ways.append((42, i + i[:1], {}))
    relations.append(
        (4, [(41, "way", "outer"), (42, "way", "inner")],
         {"type": "multipolygon", "landuse": "park"})
    )

    # MP-05: one good outer + one unclosed fragment (gap, no mate)
    o = add_nodes(5, square(5, 5, 5))
    frag = add_nodes(5, [(20.0, 0.0), (25.0, 0.0), (25.0, 5.0)], start=10)
    ways.append((51, o + o[:1], {}))
    ways.append((52, frag, {}))
    relations.append(
        (5, [(51, "way", "outer"), (52, "way", "outer")],
         {"type": "multipolygon", "landuse": "meadow"})
    )

    # MP-06: relation with only type tag; outer way tagged landuse=forest
    o = add_nodes(6, square(5, 5, 5))
    ways.append((61, o + o[:1], {"landuse": "forest"}))
    relations.append((6, [(61, "way", "outer")], {"type": "multipolygon"}))

    # MP-07: outer way tagged identically to relation
    o = add_nodes(7, square(5, 5, 5))
    ways.append((71, o + o[:1], {"landuse": "park"}))
    relations.append(
        (7, [(71, "way", "outer")], {"type": "multipolygon", "landuse": "park"})
    )

    # MP-08: outer way with extra distinct tag highway=track
    o = add_nodes(8, square(5, 5, 5))
    ways.append((81, o + o[:1], {"landuse": "park", "highway": "track"}))
    relations.append(
        (8, [(81, "way", "outer")], {"type": "multipolygon", "landuse": "park"})
    )

    # MP-09: degenerate zero-area ring
    pts = add_nodes(9, [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)])
    ways.append((91, pts + pts[:1], {}))
    relations.append(
        (9, [(91, "way", "outer")], {"type": "multipolygon", "landuse": "grass"})
    )

    # grid filler: 10x10 node lattice at 0.01 deg; streets (open) + blocks (closed)
    base = 100_000
    for r in range(10):
        for c in range(10):
            nodes.append((base + r * 10 + c, 20.0 + c * 0.01, 20.0 + r * 0.01, {}))
    wid = 100_000
    for r in range(10):  # horizontal streets
        refs = [base + r * 10 + c for c in range(10)]
        tags = {"highway": "residential", "name": f"street {r}"} if r % 3 == 0 else {}
        ways.append((wid, refs, tags))
        wid += 1
    for r in range(9):  # blocks (closed squares)
        for c in range(9):
            a = base + r * 10 + c
            refs = [a, a + 1, a + 11, a + 10, a]
            ways.append((wid, refs, {"building": "yes"}))
            wid += 1
    return nodes, ways, relations


def make_union_fixture() -> tuple[list, list, list]:
    """UR-1..4: relation cases that distinguish the A3 `union` builder from
    `contains` (kernels.overlay). Separate id space from MP-01..09 so the
    frozen MP goldens never move. Hand-derived expectations:

      UR-1 nested shell+hole          -> area 96,  1 poly, 2 rings (== contains)
      UR-2 overlapping outers         -> area 175, 1 poly, 1 ring  (merged)
      UR-3 overlapping inners in shell-> area 83,  1 poly, 2 rings (holes union)
      UR-4 island inside a hole       -> area 68,  2 polys, 3 rings
    """
    nodes, ways, relations = [], [], []

    def add_nodes(case: int, pts: list[tuple[float, float]], start: int = 0) -> list[int]:
        ids = []
        for k, (x, y) in enumerate(pts, start=start):
            nid = case * 1000 + k
            nodes.append((nid, float(x), float(y), {}))
            ids.append(nid)
        return ids

    def rect(x0, y0, x1, y1):
        return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]

    # UR-1 nested
    o = add_nodes(1, rect(0, 0, 10, 10))
    i = add_nodes(1, rect(2, 2, 4, 4), start=10)
    ways.append((11, o + o[:1], {}))
    ways.append((12, i + i[:1], {}))
    relations.append(
        (1, [(11, "way", "outer"), (12, "way", "inner")],
         {"type": "multipolygon", "landuse": "park"})
    )

    # UR-2 overlapping outers; first split across two open ways (A2 exercised)
    o1 = add_nodes(2, rect(0, 0, 10, 10))
    o2 = add_nodes(2, rect(5, 5, 15, 15), start=10)
    ways.append((21, [o1[0], o1[1], o1[2]], {}))
    ways.append((22, [o1[2], o1[3], o1[0]], {}))
    ways.append((23, o2 + o2[:1], {}))
    relations.append(
        (2, [(21, "way", "outer"), (22, "way", "outer"), (23, "way", "outer")],
         {"type": "multipolygon", "natural": "water"})
    )

    # UR-3 overlapping inners
    o = add_nodes(3, rect(0, 0, 10, 10))
    i1 = add_nodes(3, rect(2, 2, 5, 5), start=10)
    i2 = add_nodes(3, rect(4, 4, 7, 7), start=20)
    ways.append((31, o + o[:1], {}))
    ways.append((32, i1 + i1[:1], {}))
    ways.append((33, i2 + i2[:1], {}))
    relations.append(
        (3, [(31, "way", "outer"), (32, "way", "inner"), (33, "way", "inner")],
         {"type": "multipolygon", "landuse": "forest"})
    )

    # UR-4 island in hole
    o = add_nodes(4, rect(0, 0, 10, 10))
    h = add_nodes(4, rect(2, 2, 8, 8), start=10)
    isl = add_nodes(4, rect(4, 4, 6, 6), start=20)
    ways.append((41, o + o[:1], {}))
    ways.append((42, h + h[:1], {}))
    ways.append((43, isl + isl[:1], {}))
    relations.append(
        (4, [(41, "way", "outer"), (42, "way", "inner"), (43, "way", "outer")],
         {"type": "multipolygon", "landuse": "meadow"})
    )
    return nodes, ways, relations


def union_osm_dfs(spark):
    nodes, ways, relations = make_union_fixture()
    # NOTE (r6, measured): coalescing these O(100)-row fixture frames to 1
    # partition looked like free scheduling savings but benched 2x SLOWER on
    # the fixture import rows (import_pipeline_all_tables 8.0s -> 18.3s,
    # generalized_landusages 4.3s -> 12.5s at local[32]) — the per-row Python
    # kernels downstream lose all pre-shuffle parallelism. Kept as-is.
    return (
        spark.createDataFrame(nodes, OSM_NODES_SCHEMA),
        spark.createDataFrame(ways, OSM_WAYS_SCHEMA),
        spark.createDataFrame(
            [(rid, [{"ref": r, "type": t, "role": ro} for r, t, ro in m], tags)
             for rid, m, tags in relations],
            OSM_RELATIONS_SCHEMA,
        ),
    )


def osm_dfs(spark):
    nodes, ways, relations = make_osm_fixture()
    return (
        spark.createDataFrame(nodes, OSM_NODES_SCHEMA),
        spark.createDataFrame(ways, OSM_WAYS_SCHEMA),
        spark.createDataFrame(
            [(rid, [{"ref": r, "type": t, "role": ro} for r, t, ro in m], tags)
             for rid, m, tags in relations],
            OSM_RELATIONS_SCHEMA,
        ),
    )


def make_world_octants(cell_level: int = 4) -> pd.DataFrame:
    """8 polygons tiling the mercator world (4 lon bands x 2 lat bands): every
    geotagged document matches exactly one — used by entry()/bench so the
    flagship spine always produces rows regardless of point distribution."""

    def rect(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )

    rows = []
    pid = 1000
    for i, (x0, x1) in enumerate([(-180, -90), (-90, 0), (0, 90), (90, 180)]):
        for j, (y0, y1) in enumerate([(-85.06, 0), (0, 85.06)]):
            ring = rect(float(x0), float(y0), float(x1), float(y1))
            cover = kcells.covering_cells_bbox(
                x0, max(y0, -85.05), x1 - 1e-9, min(y1, 85.05), cell_level
            )
            rows.append(
                {
                    "polygon_id": pid,
                    "name": f"octant_{i}_{j}",
                    "admin_level": 1,
                    "rings": [ring.tolist()],
                    "cells": cover.tolist(),
                }
            )
            pid += 1
    return pd.DataFrame(rows)


def world_octants_df(spark, cell_level: int = 4):
    return spark.createDataFrame(
        make_world_octants(cell_level), schema=POLYGONS_ADMIN_SCHEMA
    )


DOCUMENTS_WEB_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "golden_lon double, golden_lat double"
)
POLYGONS_ADMIN_SCHEMA = (
    "polygon_id long, name string, admin_level int, "
    "rings array<array<array<double>>>, cells array<long>"
)


def documents_web_df(spark, n: int):
    return spark.createDataFrame(make_documents_web(n), schema=DOCUMENTS_WEB_SCHEMA)


def polygons_admin_df(spark, cell_level: int = 12):
    return spark.createDataFrame(
        make_polygons_admin(cell_level), schema=POLYGONS_ADMIN_SCHEMA
    )


LINES_ROADS_SCHEMA = (
    "line_id long, name string, pts array<array<double>>"
)


def make_lines_roads(n: int = 30) -> pd.DataFrame:
    """n deterministic polylines (roads) for the J6c line-cut golden: an LCG
    walk of 3..8 vertices with steps up to ~2°, starting inside [-20,40] x
    [-15,55]. Steps use odd 1e-4 grid offsets so no segment lies exactly on
    a z8 tile boundary (boundary-lying segments are spec'd to emit in BOTH
    adjacent tiles — deliberately excluded from the conservation fixture)."""
    rows = []
    state = 41
    for i in range(n):
        def nxt():
            nonlocal state
            state = (state * 1103515245 + 12345) % (1 << 31)
            return state

        lon = -20.0 + (nxt() % 60000) / 1000.0 + 0.00013
        lat = -15.0 + (nxt() % 70000) / 1000.0 + 0.00017
        pts = [[lon, lat]]
        for _ in range(3 + nxt() % 6 - 1):
            lon += ((nxt() % 4000) - 2000) / 1000.0 + 0.00019
            lat += ((nxt() % 4000) - 2000) / 1000.0 + 0.00023
            lat = max(-80.0, min(80.0, lat))
            pts.append([lon, lat])
        rows.append({"line_id": i, "name": f"road_{i}", "pts": pts})
    return pd.DataFrame(rows)


def lines_roads_df(spark, n: int = 30):
    return spark.createDataFrame(make_lines_roads(n), schema=LINES_ROADS_SCHEMA)
