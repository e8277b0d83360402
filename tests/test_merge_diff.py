"""S6b apply_diff: OSC-style create/modify/delete application semantics and
the single-aggregation plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from imposm2_spark.operators.merge import apply_diff


def _frames(spark):
    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c"), (4, 5, "old-but-high")],
        ["id", "version", "val"],
    )
    diff = spark.createDataFrame(
        [
            (2, 2, "modify", "b2"),     # supersedes base v1
            (3, 2, "delete", None),     # removes id 3
            (5, 1, "create", "e"),      # new id
            (4, 2, "modify", "stale"),  # LOSES: base already at v5
            (1, 1, "modify", "a-diff"), # equal version: diff beats base
        ],
        ["id", "version", "op", "val"],
    )
    return base, diff


def test_apply_diff_semantics(spark):
    base, diff = _frames(spark)
    out = apply_diff(base, diff, key="id")
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 4, 5}          # 3 deleted, 5 created
    assert rows[2]["val"] == "b2" and rows[2]["version"] == 2
    assert rows[4]["val"] == "old-but-high"   # stale diff loses to newer base
    assert rows[1]["val"] == "a-diff"         # tie -> diff wins over base
    assert rows[5]["op"] == "create"


def test_apply_diff_delete_only_at_top_version(spark):
    """A delete that is itself superseded by a later modify must NOT drop
    the id (resurrection semantics, matching per-version precedence)."""
    base = spark.createDataFrame([(7, 1, "x")], ["id", "version", "val"])
    diff = spark.createDataFrame(
        [(7, 2, "delete", None), (7, 3, "modify", "back")],
        ["id", "version", "op", "val"],
    )
    rows = apply_diff(base, diff, key="id").collect()
    assert len(rows) == 1 and rows[0]["val"] == "back"


def test_apply_diff_single_exchange_plan(spark):
    """Scale shape: one map-side-combinable max_by aggregation — exactly one
    exchange, no sort window, no join."""
    base, diff = _frames(spark)
    plan = apply_diff(base, diff, key="id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" not in plan, plan
