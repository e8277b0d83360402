"""S6b apply_diff: OSC-style create/modify/delete application semantics and
the single-aggregation plan shape."""

from __future__ import annotations

import pytest
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


def test_apply_diff_chain_equivalence_monotone(spark):
    """Property: with versions monotonically increasing across batches,
    applying diffs batch-by-batch equals applying their union at once —
    in both tombstone modes."""
    base = spark.createDataFrame(
        [(i, 1, "v1") for i in range(20)], ["id", "version", "val"]
    )
    d1 = spark.createDataFrame(
        [(i, 2, "modify", "v2") for i in range(0, 20, 3)]
        + [(i, 2, "delete", None) for i in range(1, 20, 5)]
        + [(100 + i, 2, "create", "new") for i in range(3)],
        ["id", "version", "op", "val"],
    )
    d2 = spark.createDataFrame(
        [(i, 3, "modify", "v3") for i in range(0, 20, 4)]
        + [(i, 3, "delete", None) for i in range(2, 20, 7)]
        + [(100, 3, "delete", None)],
        ["id", "version", "op", "val"],
    )
    for tomb in (False, True):
        chained = apply_diff(
            apply_diff(base, d1, key="id", keep_tombstones=tomb),
            d2, key="id", keep_tombstones=tomb,
        )
        combined = apply_diff(
            base, d1.unionByName(d2), key="id", keep_tombstones=tomb
        )
        a = {r["id"]: (r["version"], r["val"]) for r in chained.collect()
             if r["op"] != "delete"}
        b = {r["id"]: (r["version"], r["val"]) for r in combined.collect()
             if r["op"] != "delete"}
        assert a == b, (tomb, a, b)


def test_apply_diff_tombstone_blocks_resurrection(spark):
    """Out-of-order cross-batch diffs: a later batch carrying a LOWER-version
    modify for a deleted id resurrects it WITHOUT tombstones (the id is
    simply absent from the new base) but stays dead WITH them."""
    base = spark.createDataFrame([(1, 1, "x")], ["id", "version", "val"])
    schema = "id long, version long, op string, val string"
    d_del = spark.createDataFrame([(1, 5, "delete", None)], schema)
    d_late = spark.createDataFrame([(1, 3, "modify", "stale")], schema)

    no_tomb = apply_diff(apply_diff(base, d_del, key="id"), d_late, key="id")
    assert [r["val"] for r in no_tomb.collect()] == ["stale"]  # the hazard

    with_tomb = apply_diff(
        apply_diff(base, d_del, key="id", keep_tombstones=True),
        d_late, key="id", keep_tombstones=True,
    )
    rows = with_tomb.collect()
    assert len(rows) == 1 and rows[0]["op"] == "delete"  # still dead


def test_apply_diff_requires_op_column(spark):
    base = spark.createDataFrame([(1, 1, "x")], ["id", "version", "val"])
    bad = spark.createDataFrame([(1, 2, "y")], ["id", "version", "val"])
    import pytest

    with pytest.raises(ValueError, match="op"):
        apply_diff(base, bad, key="id")


def test_apply_diff_schema_check_precedes_op_probe(spark):
    """Review r5: a diff missing the version column must fail on the cheap
    driver-side schema check even when allowed_ops is set and the diff ALSO
    carries a malformed op — pre-fix the allowed_ops probe ran a cluster job
    (and raised ITS error) before the structural validation."""
    import pytest

    base = spark.createDataFrame([(1, 1, "x")], ["id", "version", "val"])
    diff = spark.createDataFrame(
        [(1, "nuke", "y")], "id long, op string, val string"
    )
    with pytest.raises(ValueError, match="version"):
        apply_diff(
            base, diff, key="id", allowed_ops=("create", "modify", "delete")
        )


def test_apply_diff_rejects_null_key_and_null_version(spark):
    """Review r5: the malformed-diff probe must catch NULL keys (all null-id
    rows would merge into ONE winner) and NULL versions (the row always loses
    max_by and is silently dropped), not just out-of-vocabulary ops."""
    from imposm2_spark.operators.merge import apply_diff

    base = spark.createDataFrame(
        [(1, 1, "x")], "id long, version long, payload string"
    )
    ops = ("create", "modify", "delete")
    null_key = spark.createDataFrame(
        [(None, 5, "create", "y")], "id long, version long, op string, payload string"
    )
    with pytest.raises(ValueError, match="malformed diff row"):
        apply_diff(base, null_key, key="id", allowed_ops=ops)
    null_version = spark.createDataFrame(
        [(2, None, "create", "y")], "id long, version long, op string, payload string"
    )
    with pytest.raises(ValueError, match="malformed diff row"):
        apply_diff(base, null_version, key="id", allowed_ops=ops)
    # and a clean diff still applies (the probe is a gate, not a filter)
    ok = spark.createDataFrame(
        [(2, 5, "create", "y")], "id long, version long, op string, payload string"
    )
    got = apply_diff(base, ok, key="id", allowed_ops=ops)
    assert got.count() == 2


def test_merge_extracts_tie_within_one_extract_is_deterministic(spark):
    """Review r5: duplicate keys at the SAME ordinal resolved by shuffle
    arrival order; they must resolve by the deterministic payload-hash
    tiebreak — same winner on every evaluation."""
    from imposm2_spark.operators.merge import merge_extracts

    ext = spark.createDataFrame(
        [(1, 0, "payload-a"), (1, 0, "payload-b"), (2, 0, "only")],
        "id long, file_ord int, payload string",
    ).repartition(8)
    winners = set()
    for _ in range(5):
        got = {r.id: r.payload for r in merge_extracts([ext], key="id").collect()}
        assert got[2] == "only"
        winners.add(got[1])
    assert len(winners) == 1, winners
