"""Generate golden VALUES oracles for the fixture-based rows-only entries.

The covering-tiles golden is recomputed here INDEPENDENTLY of the engine
kernel (fresh tile math per FIXTURES.md §4 + the documented keep rule:
tile kept iff its center is inside the rings (ray-cast) or it contains a
ring vertex, over the bbox tile range) and asserted equal to the engine
output before emitting — so the VALUES literal is a verified golden, not
an engine echo.
"""
import math
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from imposm2_spark.plans import registry
from imposm2_spark.session import get_spark
from imposm2_spark.sources import fixtures


def tile_xy(lon, lat, z):
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    lr = math.radians(lat)
    y = int(math.floor((1.0 - math.asinh(math.tan(lr)) / math.pi) / 2.0 * n))
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def ray_cast(px, py, rings):
    inside = False
    for ring in rings:
        for i in range(len(ring) - 1):
            (x1, y1), (x2, y2) = ring[i], ring[i + 1]
            if (y1 > py) != (y2 > py):
                xi = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
                if px < xi:
                    inside = not inside
    return inside


def tile_bounds_lonlat(x, y, z):
    """Fresh mercator tile -> lon/lat axis-aligned rect (lon0, lon1, lat_bot,
    lat_top); independent of the engine's kernels.cells math."""
    n = float(1 << z)
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    lat_top = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * y / n))))
    lat_bot = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (y + 1) / n))))
    return lon0, lon1, lat_bot, lat_top


def segment_hits_rect(ax, ay, bx, by, x0, x1, y0, y1):
    """Liang-Barsky parametric clip: does segment A->B intersect the
    axis-aligned rect [x0,x1]x[y0,y1]? (Engine uses SAT — a genuinely
    different algorithm, so golden generation cross-checks it.)"""
    dx, dy = bx - ax, by - ay
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, ax - x0), (dx, x1 - ax), (-dy, ay - y0), (dy, y1 - ay)):
        if p == 0.0:
            if q < 0.0:
                return False  # parallel and outside this boundary
        else:
            t = q / p
            if p < 0.0:
                t0 = max(t0, t)
            else:
                t1 = min(t1, t)
            if t0 > t1:
                return False
    return True


def covering_tiles_exact_independent(rings, z):
    """Exact intersection set: center-rule tiles (tile wholly interior or
    polygon-inside-tile vertex cases) UNION tiles any ring edge crosses."""
    out = set(covering_tiles_independent(rings, z))
    pts = [p for r in rings for p in r]
    lon_min = min(p[0] for p in pts); lon_max = max(p[0] for p in pts)
    lat_min = min(p[1] for p in pts); lat_max = max(p[1] for p in pts)
    x0, y0 = tile_xy(lon_min, lat_max, z)
    x1, y1 = tile_xy(lon_max, lat_min, z)
    for x in range(x0, x1 + 1):
        for y in range(y0, y1 + 1):
            if (x, y) in out:
                continue
            rx0, rx1, ry0, ry1 = tile_bounds_lonlat(x, y, z)
            for ring in rings:
                if any(
                    segment_hits_rect(ring[i][0], ring[i][1],
                                      ring[i + 1][0], ring[i + 1][1],
                                      rx0, rx1, ry0, ry1)
                    for i in range(len(ring) - 1)
                ):
                    out.add((x, y))
                    break
    return out


def _project_independent(ring, z):
    """Fresh vertex-wise mercator projection (scalar math, no kernel import)."""
    n = float(1 << z)
    out = []
    for lon, lat in ring:
        lat = max(-85.05112878, min(85.05112878, lat))
        tx = (lon + 180.0) / 360.0 * n
        ty = (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n
        out.append((tx, ty))
    return out


def _clip_edge_independent(pts, nx, ny, d, snap_axis, snap_val):
    """Scalar generic-half-plane SH pass (keep nx*px + ny*py - d <= 0) —
    structurally different from the engine's axis/sign vectorized form;
    crossing points get the boundary coordinate written exactly."""
    out = []
    m = len(pts)
    for i in range(m):
        cx, cy = pts[i]
        qx, qy = pts[(i + 1) % m]
        fc = nx * cx + ny * cy - d
        fq = nx * qx + ny * qy - d
        inc, inq = fc <= 0.0, fq <= 0.0
        if inc:
            out.append((cx, cy))
        if inc != inq:
            t = fc / (fc - fq)
            ix, iy = cx + t * (qx - cx), cy + t * (qy - cy)
            if snap_axis == 0:
                ix = snap_val
            else:
                iy = snap_val
            out.append((ix, iy))
    return out


def clip_tile_independent(proj_rings, x, y):
    """(clipped open rings, |signed shoelace sum|) for tile (x, y) — scalar
    re-implementation of the kernels/clip.py frozen spec."""
    x0, y0, x1, y1 = float(x), float(y), float(x + 1), float(y + 1)
    rings_out = []
    total = 0.0
    for pr in proj_rings:
        pts = list(pr)
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        for nx, ny, d, ax, val in (
            (-1.0, 0.0, -x0, 0, x0), (1.0, 0.0, x1, 0, x1),
            (0.0, -1.0, -y0, 1, y0), (0.0, 1.0, y1, 1, y1),
        ):
            pts = _clip_edge_independent(pts, nx, ny, d, ax, val)
            if len(pts) < 3:
                pts = []
                break
        # consecutive dedup incl. wraparound, then <3 -> empty
        if pts:
            dd = [pts[0]]
            for p in pts[1:]:
                if p != dd[-1]:
                    dd.append(p)
            if len(dd) >= 2 and dd[0] == dd[-1]:
                dd = dd[:-1]
            pts = dd if len(dd) >= 3 else []
        if not pts:
            continue
        arr = np.asarray(pts, dtype=np.float64)
        # shoelace via the same np.sum pairing as geom.ring_signed_area so
        # the zero-classification of degenerate slivers cannot drift
        xx, yy = arr[:, 0], arr[:, 1]
        total += float(np.sum(xx * np.roll(yy, -1) - np.roll(xx, -1) * yy) / 2.0)
        rings_out.append(pts)
    return rings_out, abs(total)


def clip_tiles_independent(rings, z):
    """(x, y, n_pts, area) rows over the FULL bbox tile grid — keeps tiles
    with a nonzero-area cut. Deliberately does NOT reuse the covering-tile
    rule: enumerating every bbox tile and clipping is the ground truth the
    engine's cover-then-clip shortcut must reproduce."""
    pts = [p for r in rings for p in r]
    lon_min = min(p[0] for p in pts); lon_max = max(p[0] for p in pts)
    lat_min = min(p[1] for p in pts); lat_max = max(p[1] for p in pts)
    x0, y0 = tile_xy(lon_min, lat_max, z)
    x1, y1 = tile_xy(lon_max, lat_min, z)
    proj = [_project_independent(r, z) for r in rings]
    out = []
    for x in range(x0, x1 + 1):
        for y in range(y0, y1 + 1):
            local, area = clip_tile_independent(proj, x, y)
            if local and area != 0.0:
                out.append((x, y, sum(len(r) for r in local), area))
    return out


def _lb_interval_independent(ax, ay, bx, by, x0, y0, x1, y1):
    """Interval-form Liang-Barsky (fresh structure vs the engine's p/q loop):
    intersect the per-axis parameter intervals; None when empty."""
    dx, dy = bx - ax, by - ay
    t0, t1 = 0.0, 1.0
    if dx == 0.0:
        if ax < x0 or ax > x1:
            return None
    else:
        ta, tb = (x0 - ax) / dx, (x1 - ax) / dx
        lo, hi = (ta, tb) if ta <= tb else (tb, ta)
        t0, t1 = max(t0, lo), min(t1, hi)
    if dy == 0.0:
        if ay < y0 or ay > y1:
            return None
    else:
        ta, tb = (y0 - ay) / dy, (y1 - ay) / dy
        lo, hi = (ta, tb) if ta <= tb else (tb, ta)
        t0, t1 = max(t0, lo), min(t1, hi)
    if t0 > t1:
        return None
    return t0, t1


def _snap_independent(px, py, x0, y0, x1, y1):
    if px <= x0:
        px = x0
    elif px >= x1:
        px = x1
    if py <= y0:
        py = y0
    elif py >= y1:
        py = y1
    return px, py


def clip_line_tile_independent(proj, x, y):
    """(runs, length) of one projected polyline in tile (x, y) — scalar
    re-implementation of the kernels/clip.py line spec (LB + stitch)."""
    x0, y0, x1, y1 = float(x), float(y), float(x + 1), float(y + 1)
    runs, cur = [], []
    for i in range(len(proj) - 1):
        ax, ay = proj[i]
        bx, by = proj[i + 1]
        hit = _lb_interval_independent(ax, ay, bx, by, x0, y0, x1, y1)
        if hit is None:
            if len(cur) >= 2:
                runs.append(cur)
            cur = []
            continue
        t0, t1 = hit
        dx, dy = bx - ax, by - ay
        p0 = (ax, ay) if t0 == 0.0 else _snap_independent(
            ax + t0 * dx, ay + t0 * dy, x0, y0, x1, y1
        )
        p1 = (bx, by) if t1 == 1.0 else _snap_independent(
            ax + t1 * dx, ay + t1 * dy, x0, y0, x1, y1
        )
        if p0 == p1:
            continue
        if cur and cur[-1] == p0:
            cur.append(p1)
        else:
            if len(cur) >= 2:
                runs.append(cur)
            cur = [p0, p1]
    if len(cur) >= 2:
        runs.append(cur)
    length = sum(
        math.hypot(r[i + 1][0] - r[i][0], r[i + 1][1] - r[i][1])
        for r in runs
        for i in range(len(r) - 1)
    )
    return runs, length


def clip_line_tiles_independent(pts, z):
    """(x, y, n_pts, length) rows over the FULL bbox tile grid of the line
    (deliberately not the engine's per-segment cover — a cover bug would
    surface as a missing nonzero-cut tile here)."""
    proj = _project_independent(pts, z)
    xs = [p[0] for p in proj]; ys = [p[1] for p in proj]
    gx0, gx1 = int(math.floor(min(xs))), int(math.floor(max(xs)))
    gy0, gy1 = int(math.floor(min(ys))), int(math.floor(max(ys)))
    out = []
    for x in range(gx0, gx1 + 1):
        for y in range(gy0, gy1 + 1):
            runs, length = clip_line_tile_independent(proj, x, y)
            if runs and length != 0.0:
                out.append((x, y, sum(len(r) for r in runs), length))
    return out


def covering_tiles_independent(rings, z):
    pts = [p for r in rings for p in r]
    lon_min = min(p[0] for p in pts); lon_max = max(p[0] for p in pts)
    lat_min = min(p[1] for p in pts); lat_max = max(p[1] for p in pts)
    x0, y0 = tile_xy(lon_min, lat_max, z)   # north-west
    x1, y1 = tile_xy(lon_max, lat_min, z)   # south-east
    vert_tiles = {tile_xy(p[0], p[1], z) for p in pts}
    n = float(1 << z)
    out = set()
    for x in range(x0, x1 + 1):
        for y in range(y0, y1 + 1):
            lon_c = (x + 0.5) / n * 360.0 - 180.0
            lat_c = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (y + 0.5) / n))))
            if ray_cast(lon_c, lat_c, rings) or (x, y) in vert_tiles:
                out.add((x, y))
    return out


def main():
    spark = get_spark()
    qs = registry.queries()

    # --- independent covering-tiles golden (both refine modes, r5) ----------
    pdf = fixtures.make_polygons_admin(12)
    expected = set()
    for _, row in pdf.iterrows():
        rings = [np.asarray(r).tolist() for r in row["rings"]]
        for x, y in covering_tiles_independent(rings, 8):
            expected.add(("center", int(row["polygon_id"]), 8, x, y))
        for x, y in covering_tiles_exact_independent(rings, 8):
            expected.add(("exact", int(row["polygon_id"]), 8, x, y))
    # --- independent clip golden (J6c, r5) ----------------------------------
    expected_clip = set()
    clip_area_by_poly = {}
    for _, row in pdf.iterrows():
        rings = [np.asarray(r).tolist() for r in row["rings"]]
        pid = int(row["polygon_id"])
        proj_total = abs(sum(
            float(np.sum(
                np.asarray(p)[:, 0] * np.roll(np.asarray(p)[:, 1], -1)
                - np.roll(np.asarray(p)[:, 0], -1) * np.asarray(p)[:, 1]
            ) / 2.0)
            for p in (_project_independent(r, 8) for r in rings)
        ))
        tile_sum = 0.0
        for x, y, n_pts, area in clip_tiles_independent(rings, 8):
            expected_clip.add(("clip", pid, 8, x, y, n_pts, round(area, 9)))
            tile_sum += area
        # algorithm-independent exactness: tiles partition the plane, so
        # the cut areas must sum back to the projected polygon area
        if abs(tile_sum - proj_total) > 1e-9 * max(proj_total, 1.0):
            print("CLIP AREA NOT CONSERVED", pid, tile_sum, proj_total)
            sys.exit(1)
        clip_area_by_poly[pid] = tile_sum

    # --- independent polyline clip golden (J6c line side, r5) ---------------
    expected_clipline = set()
    for _, lrow in fixtures.make_lines_roads().iterrows():
        lid = int(lrow["line_id"])
        pts = [tuple(p) for p in lrow["pts"]]
        proj = _project_independent(pts, 8)
        full_len = sum(
            math.hypot(proj[i + 1][0] - proj[i][0], proj[i + 1][1] - proj[i][1])
            for i in range(len(proj) - 1)
        )
        tile_len = 0.0
        for x, y, n_pts, length in clip_line_tiles_independent(pts, 8):
            expected_clipline.add(("clipline", lid, 8, x, y, n_pts, round(length, 9)))
            tile_len += length
        if abs(tile_len - full_len) > 1e-9 * max(full_len, 1.0):
            print("LINE LENGTH NOT CONSERVED", lid, tile_len, full_len)
            sys.exit(1)

    fam = qs["polygon_covering_tiles_z8"](spark, "/root/testdata/sf0.01").collect()
    engine = {
        (r.refine, r.feature_id, r.z, r.x, r.y)
        for r in fam if r.refine in ("center", "exact")
    }
    engine_clip = {
        (r.refine, r.feature_id, r.z, r.x, r.y, r.n_pts, r.measure)
        for r in fam if r.refine == "clip"
    }
    engine_clipline = {
        (r.refine, r.feature_id, r.z, r.x, r.y, r.n_pts, r.measure)
        for r in fam if r.refine == "clipline"
    }
    only_exp = sorted(expected - engine)
    only_eng = sorted(engine - expected)
    print("covering tiles: expected", len(expected), "engine", len(engine))
    if only_exp or only_eng:
        print("MISMATCH only_expected:", only_exp[:20])
        print("MISMATCH only_engine:", only_eng[:20])
        sys.exit(1)
    oc, ec = sorted(expected_clip - engine_clip), sorted(engine_clip - expected_clip)
    print("clip tiles: expected", len(expected_clip), "engine", len(engine_clip))
    if oc or ec:
        print("CLIP MISMATCH only_expected:", oc[:10])
        print("CLIP MISMATCH only_engine:", ec[:10])
        sys.exit(1)
    ol = sorted(expected_clipline - engine_clipline)
    el = sorted(engine_clipline - expected_clipline)
    print("clipline tiles: expected", len(expected_clipline),
          "engine", len(engine_clipline))
    if ol or el:
        print("CLIPLINE MISMATCH only_expected:", ol[:10])
        print("CLIPLINE MISMATCH only_engine:", el[:10])
        sys.exit(1)

    # DuckDB type names matching the Spark result schema exactly (VALUES
    # literals default to INT32/DECIMAL and would dtype-mismatch the driver
    # hash the same way HUGEINT sums did in r1).
    _DUCK = {"long": "BIGINT", "bigint": "BIGINT", "integer": "INTEGER",
             "int": "INTEGER", "double": "DOUBLE", "string": "VARCHAR",
             "boolean": "BOOLEAN"}

    chunks = []

    def emit(name, rows, cols, types):
        vals = ",\n  ".join("(" + ", ".join(rows_fmt(v) for v in r) + ")" for r in rows)
        casts = ", ".join(
            f"CAST({c} AS {_DUCK[t]}) AS {c}" for c, t in zip(cols, types)
        )
        sql = (f"SELECT {casts} FROM (VALUES\n  {vals}\n) "
               f"AS t({', '.join(cols)})")
        chunks.append(f'{name.upper()} = """\n{sql}\n"""\n')

    def rows_fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    fam_rows = (
        [r + (None, None) for r in sorted(expected)]
        + sorted(expected_clip)
        + sorted(expected_clipline)
    )
    emit("polygon_covering_tiles_z8", fam_rows,
         ["refine", "feature_id", "z", "x", "y", "n_pts", "measure"],
         ["string", "long", "integer", "long", "long", "integer", "double"])

    for name in ["relation_multipolygon_family", "import_pipeline_landusages",
                 "generalized_landusages", "wkb_roundtrip_landusages"]:
        if name == "import_pipeline_landusages":
            # r5 fold: the standalone row became part='rows' of the
            # all-tables family; the golden keeps its original 4-col form
            # because the family oracle UNIONs it back in with padding
            df = (
                qs["import_pipeline_all_tables"](spark, "/root/testdata/sf0.01")
                .where("part = 'rows'")
                .select("id", "name", "type", "area")
            )
        else:
            df = qs[name](spark, "/root/testdata/sf0.01")
        if name == "generalized_landusages":
            # registry composes _GEN_BOTH_ORACLE from this golden ('gen'
            # variant) + the analytic chain oracle — keep the 3-col form
            df = df.where("variant = 'gen'").drop("variant")
        rows = [tuple(r) for r in df.collect()]
        types = [f.dataType.simpleString() for f in df.schema.fields]
        emit(name, sorted(rows), df.columns, types)

    header = '''"""Golden-row DuckDB oracles for the fixture-based queries (FIXTURES.md MP-01..09).

GENERATED by scripts/gen_golden_oracles.py — do not hand-edit. The
covering-tiles golden is cross-checked at generation time against an
independent re-implementation of the FIXTURES §4 tile rule (fresh tile
math + ray-cast, no engine kernel imports); the MP goldens are the
hand-verified FIXTURES.md §2 expected rows (e.g. MP-05 dropped_unclosed=1,
MP-08 way 81 double-emitted, MP-09 absent; wkb_len byte-arithmetic checked:
186 = 9 wrapper + 9 poly + 2 rings x (4 + 5 pts x 16)).
"""

'''
    with open("/root/repo/imposm2_spark/plans/golden.py", "w") as f:
        f.write(header + "\n".join(chunks))
    print("wrote imposm2_spark/plans/golden.py")


if __name__ == "__main__":
    main()
