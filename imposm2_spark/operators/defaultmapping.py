"""Default table specs — the imposm/defaultmapping.py analog, as pure data.

A representative subset of imposm2's default mapping (places, roads split by
class, buildings, landusages, waterways/waterareas, admin boundaries), enough
to exercise every FieldType and the union-view/generalized-table machinery.
Semantics per table follow the public imposm.org default mapping docs.
"""

from __future__ import annotations

from .mapping import (
    Bool,
    Direction,
    Integer,
    Name,
    OneOfInt,
    String,
    TableSpec,
    Type,
    WayZOrder,
    ZOrder,
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
)

PLACES = TableSpec(
    name="places",
    geom_type=GEOM_POINT,
    mapping={
        "place": (
            "country", "state", "region", "county", "city", "town",
            "village", "hamlet", "suburb", "locality",
        )
    },
    fields=(
        ("name", Name()),
        ("type", Type()),
        ("z_order", ZOrder(("country", "state", "region", "county", "city",
                            "town", "village", "hamlet", "suburb", "locality"))),
        ("population", Integer("population")),
    ),
)

MAINROADS = TableSpec(
    name="mainroads",
    geom_type=GEOM_LINESTRING,
    mapping={
        "highway": ("motorway", "motorway_link", "trunk", "trunk_link",
                    "primary", "primary_link", "secondary", "secondary_link"),
    },
    fields=(
        ("name", Name()),
        ("type", Type()),
        ("tunnel", Bool("tunnel")),
        ("bridge", Bool("bridge")),
        ("oneway", Direction("oneway")),
        ("ref", String("ref")),
        ("z_order", WayZOrder()),
    ),
)

MINORROADS = TableSpec(
    name="minorroads",
    geom_type=GEOM_LINESTRING,
    mapping={
        "highway": ("tertiary", "tertiary_link", "residential", "unclassified",
                    "road", "living_street", "service", "track"),
    },
    fields=(
        ("name", Name()),
        ("type", Type()),
        ("tunnel", Bool("tunnel")),
        ("bridge", Bool("bridge")),
        ("oneway", Direction("oneway")),
        ("z_order", WayZOrder()),
    ),
)

RAILWAYS = TableSpec(
    name="railways",
    geom_type=GEOM_LINESTRING,
    mapping={"railway": ("rail", "tram", "light_rail", "subway", "narrow_gauge")},
    fields=(
        ("name", Name()),
        ("type", Type()),
        ("tunnel", Bool("tunnel")),
        ("bridge", Bool("bridge")),
        ("z_order", WayZOrder()),
    ),
)

BUILDINGS = TableSpec(
    name="buildings",
    geom_type=GEOM_POLYGON,
    mapping={"building": ("__any__",)},
    fields=(("name", Name()), ("type", Type())),
)

LANDUSAGES = TableSpec(
    name="landusages",
    geom_type=GEOM_POLYGON,
    mapping={
        "landuse": ("park", "forest", "residential", "retail", "commercial",
                    "industrial", "grass", "farmland", "cemetery", "meadow"),
        "natural": ("wood", "scrub", "wetland", "heath"),
        "leisure": ("park", "garden", "playground", "golf_course", "pitch"),
        "amenity": ("university", "school", "college", "hospital"),
    },
    fields=(("name", Name()), ("type", Type())),
)

WATERWAYS = TableSpec(
    name="waterways",
    geom_type=GEOM_LINESTRING,
    mapping={"waterway": ("river", "stream", "canal", "drain", "ditch")},
    fields=(("name", Name()), ("type", Type())),
)

WATERAREAS = TableSpec(
    name="waterareas",
    geom_type=GEOM_POLYGON,
    mapping={
        "waterway": ("riverbank",),
        "natural": ("water",),
        "landuse": ("reservoir", "basin"),
    },
    fields=(("name", Name()), ("type", Type())),
)

ADMIN = TableSpec(
    name="admin",
    geom_type=GEOM_POLYGON,
    mapping={"boundary": ("administrative",)},
    fields=(
        ("name", Name()),
        ("type", Type()),
        ("admin_level", OneOfInt("admin_level", (1, 2, 3, 4, 5, 6))),
    ),
    field_filter=(OneOfInt("admin_level", (1, 2, 3, 4, 5, 6)),),
)

ALL_SPECS = [
    PLACES, MAINROADS, MINORROADS, RAILWAYS, BUILDINGS, LANDUSAGES,
    WATERWAYS, WATERAREAS, ADMIN,
]

# union view over the road-ish tables (imposm2 `roads` UnionView analog)
ROADS_UNION_TABLES = ("mainroads", "minorroads", "railways")
