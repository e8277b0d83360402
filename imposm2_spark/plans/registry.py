"""Driver-facing query registry: every operator exposed as (Spark fn, oracle SQL).

Each entry is one SURVEY.md §2 operator driven end-to-end on the sf testdata,
with a DuckDB-runnable ANSI-SQL oracle producing identical rows (column names
aliased identically on both sides; double aggregates pass through exact DECIMAL
then round, so partial-sum order can't flip the value hash).

Non-SQL-expressible kernels (ring assembly, Douglas-Peucker, covering tiles)
register without an oracle — the driver records rows-only checks; their exact
semantics are golden-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import spatial
from ..operators.pip import pip_join
from ..sources import fixtures, testdata
from ..sources.testdata import PTS_DENSE_SQL, PTS_SQL, derived_points, derived_points_dense, load

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Tiles (J6): point tile assignment at z=8 — pure JVM column math.
# Oracle uses ln(t + sqrt(t^2+1)) for asinh (DuckDB lacks asinh).
# ---------------------------------------------------------------------------
@register(
    "tile_assign_z8",
    oracle=f"""
WITH pts AS ({PTS_SQL})
SELECT doc_id,
       CAST(floor((lon + 180.0) / 360.0 * 256) AS BIGINT) AS x,
       CAST(floor((1.0 - ln(tan(radians(lat)) + sqrt(tan(radians(lat))*tan(radians(lat)) + 1.0)) / pi()) / 2.0 * 256) AS BIGINT) AS y
FROM pts
""",
)
def q_tile_assign_z8(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derived_points(spark, sf_dir)
    return pts.select(
        "doc_id",
        spatial.tile_x(F.col("lon"), 8).alias("x"),
        spatial.tile_y(F.col("lat"), 8).alias("y"),
    )


# ---------------------------------------------------------------------------
# PIP join (J4): docs vs the 20-rectangle admin grid (half-open bbox semantics
# make the exact ray-cast SQL-checkable as a range join).
# ---------------------------------------------------------------------------
_GRID_SQL = """
SELECT (r.r * 4 + c.c) AS polygon_id,
       -10.0 + c.c * 5.0 AS x0, -10.0 + r.r * 4.0 AS y0,
       -10.0 + c.c * 5.0 + 5.0 AS x1, -10.0 + r.r * 4.0 + 4.0 AS y1
FROM (SELECT unnest(generate_series(0, 4)) AS r) r,
     (SELECT unnest(generate_series(0, 3)) AS c) c
"""


@register(
    "pip_join_grid",
    oracle=f"""
WITH pts AS ({PTS_DENSE_SQL}), grid AS ({_GRID_SQL})
SELECT p.doc_id, g.polygon_id
FROM pts p JOIN grid g
  ON p.lon >= g.x0 AND p.lon < g.x1 AND p.lat >= g.y0 AND p.lat < g.y1
""",
)
def q_pip_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derived_points_dense(spark, sf_dir)
    polys = fixtures.polygons_admin_df(spark).where(F.col("polygon_id") < 20)
    return pip_join(pts, polys, keep_point_cols=["doc_id"]).select("doc_id", "polygon_id")


# ---------------------------------------------------------------------------
# Exact dedup (training-data op): hash-groupBy on md5(text).
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# Aggregation core (A-class ops): pricing summary with exact-decimal sums.
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_base,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_disc,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(18,6)"
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(dec)).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(dec)).cast("double"), 4).alias("sum_base"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(dec)
                    * (F.lit(1.0) - F.col("l_discount")).cast(dec)
                ).cast("double"),
                4,
            ).alias("sum_disc"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Window top-k (W3): top-3 events per user, deterministic tiebreak.
# ---------------------------------------------------------------------------
@register(
    "topk_events_per_user",
    oracle="""
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) t
WHERE rn <= 3
""",
)
def q_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# JSON scalar functions (§2.8): props extraction + agg.
# ---------------------------------------------------------------------------
@register(
    "events_json_agg",
    oracle="""
SELECT event_type,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
""",
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Union view (U1): NULL-padded UNION ALL over heterogeneous tables.
# ---------------------------------------------------------------------------
@register(
    "union_view",
    oracle="""
SELECT o_orderkey AS id, 'orders' AS src, o_totalprice AS amount, CAST(NULL AS DOUBLE) AS qty
FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT l_orderkey AS id, 'lineitem' AS src, CAST(NULL AS DOUBLE) AS amount, l_quantity AS qty
FROM lineitem WHERE l_linenumber = 1
""",
)
def q_union_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(
            F.col("o_orderkey").alias("id"),
            F.lit("orders").alias("src"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") == 1)
        .select(
            F.col("l_orderkey").alias("id"),
            F.lit("lineitem").alias("src"),
            F.col("l_quantity").alias("qty"),
        )
    )
    return orders.unionByName(li, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Cache merge (S6): last-write-wins union of overlapping "extract" reads.
# ---------------------------------------------------------------------------
@register(
    "cache_merge_last_wins",
    oracle="""
SELECT c_custkey, c_nationkey, file_ord FROM (
  SELECT c_custkey, c_nationkey, file_ord,
         row_number() OVER (PARTITION BY c_custkey ORDER BY file_ord DESC) AS rn
  FROM (
    SELECT c_custkey, c_nationkey, 0 AS file_ord FROM customer WHERE c_nationkey < 12
    UNION ALL
    SELECT c_custkey, c_nationkey, 1 AS file_ord FROM customer WHERE c_nationkey > 8
  ) u
) t WHERE rn = 1
""",
)
def q_cache_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    f0 = cust.where(F.col("c_nationkey") < 12).select(
        "c_custkey", "c_nationkey", F.lit(0).alias("file_ord")
    )
    f1 = cust.where(F.col("c_nationkey") > 8).select(
        "c_custkey", "c_nationkey", F.lit(1).alias("file_ord")
    )
    from ..operators.merge import merge_extracts

    return merge_extracts([f0, f1], key="c_custkey")


# ---------------------------------------------------------------------------
# Anti/semi joins (J7/P4 shape).
# ---------------------------------------------------------------------------
@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c.c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey"
    )


@register(
    "semi_join_customers_with_big_order",
    oracle="""
SELECT c.c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey"
    )


# ---------------------------------------------------------------------------
# Broadcast dimension join (J8/O11): revenue by region.
# ---------------------------------------------------------------------------
@register(
    "join_revenue_by_region",
    oracle="""
SELECT r.r_name AS region,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 4).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )
