"""T28 sketch profiling: driver-scale (sf0.01) exactness vs DuckDB, sketch
mergeability (the 100 TB rollup-without-rescan property), bounded error in
the genuinely-approximate regime, plan shape (one exchange, one scan), and
the NULL-group / 'ALL'-row distinction."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from imposm2_spark.functions.sketches import (
    KLL_K,
    THETA_LGK,
    kll_quantile,
    sketch_profile,
    theta_distinct,
)

SF_DRIVER = "/root/testdata/sf0.01"


def test_profile_exact_at_driver_scale(spark):
    """The driver's correctness gate runs sf0.01: every profile cell must be
    bit-exact against DuckDB's exact COUNT(DISTINCT) + explicit inclusive-
    rank order statistics there (sf0.001 is covered by test_oracle_parity)."""
    docs = spark.read.parquet(f"{SF_DRIVER}/documents.parquet")
    got = {
        r["group_key"]: r
        for r in sketch_profile(docs).collect()
    }
    exp = duckdb.sql(
        f"""
        SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS g,
               COUNT(*) AS n,
               COUNT(DISTINCT lang) AS dl,
               COUNT(DISTINCT text) AS dt,
               (list_sort(list(n_chars)))[CAST(GREATEST(1, CEIL(0.5 * COUNT(n_chars))) AS INT)] AS p50,
               (list_sort(list(n_chars)))[CAST(GREATEST(1, CEIL(0.9 * COUNT(n_chars))) AS INT)] AS p90
        FROM '{SF_DRIVER}/documents.parquet' GROUP BY ROLLUP(source)
        """
    ).fetchall()
    assert len(got) == len(exp) == 21
    for g, n, dl, dt, p50, p90 in exp:
        row = got[g]
        assert (row["n_docs"], row["distinct_lang"], row["distinct_text"]) == (n, dl, dt)
        assert row["p50_n_chars"] == pytest.approx(float(p50), abs=0)
        assert row["p90_n_chars"] == pytest.approx(float(p90), abs=0)


def test_hll_union_merges_per_group_sketches(spark):
    """Per-source HLL sketches union into the corpus total WITHOUT a second
    scan — the property that makes per-shard profiles roll up at 10^12 rows."""
    docs = spark.read.parquet(f"{SF_DRIVER}/documents.parquet")
    # lgk=14 keeps both the per-source sketches and the direct sketch in the
    # exact regime at this cardinality (500 distinct texts); the default
    # lgk=12 already estimates here (measured direct=496, merged=501).
    per_src = docs.groupBy("source").agg(
        F.expr(f"hll_sketch_agg(text, {THETA_LGK})").alias("sk")
    )
    merged = per_src.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("d")
    ).collect()[0]["d"]
    direct = docs.agg(
        F.expr(f"hll_sketch_estimate(hll_sketch_agg(text, {THETA_LGK}))").alias("d")
    ).collect()[0]["d"]
    true_d = docs.select(F.countDistinct("text")).collect()[0][0]
    assert merged == direct == true_d


def test_kll_merge_of_halves_equals_whole(spark):
    """kll_sketch_merge over two disjoint halves answers every probe quantile
    identically to the single-pass sketch (both exact at this size)."""
    docs = spark.read.parquet(f"{SF_DRIVER}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("v")
    )
    halves = docs.withColumn("h", F.pmod(F.col("doc_id"), F.lit(2)))
    per_half = halves.groupBy("h").agg(
        F.expr(f"kll_sketch_agg_double(v, {KLL_K})").alias("sk")
    )
    a, b = [r["sk"] for r in per_half.orderBy("h").collect()]
    merged = spark.createDataFrame([(a, b)], "a binary, b binary")
    whole = docs.agg(F.expr(f"kll_sketch_agg_double(v, {KLL_K})").alias("sk"))
    for q in (0.1, 0.5, 0.9, 0.99):
        m = merged.select(
            F.expr(
                f"kll_sketch_get_quantile_double(kll_sketch_merge_double(a, b), {q})"
            ).alias("x")
        ).collect()[0]["x"]
        w = whole.select(
            F.expr(f"kll_sketch_get_quantile_double(sk, {q})").alias("x")
        ).collect()[0]["x"]
        assert m == w


def test_approximate_regime_error_bounded(spark):
    """Past the exact thresholds the estimates must stay inside the sketch
    error envelope: theta lgk=14 has RSE ~1/sqrt(2^14) ~ 0.8%, so 5% is a
    generous CI; KLL k=8192 rank error ~<1% at n=200k."""
    n = 200_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 100_000).cast("string").alias("s"),
        F.col("id").cast("double").alias("v"),
    )
    true_d = df.select(F.countDistinct("s")).collect()[0][0]
    est = df.agg(theta_distinct("s").alias("d")).collect()[0]["d"]
    assert abs(est - true_d) / true_d < 0.05
    p50 = df.agg(kll_quantile("v", 0.5).alias("q")).collect()[0]["q"]
    assert abs(p50 - n / 2) / n < 0.01


def test_plan_single_pass(spark):
    """One scan of the corpus, one exchange (of (group, sketch) partials) —
    the rollup's Expand must not add a second pass, and no final extra
    shuffle may appear above the aggregate."""
    from tests.test_plans import n_exchanges, plan_of

    import re

    docs = spark.read.parquet(f"{SF_DRIVER}/documents.parquet")
    p = plan_of(sketch_profile(docs))
    # detail headers only — formatted mode prints each node twice
    assert len(re.findall(r"\n\(\d+\) Scan parquet", p)) == 1
    assert n_exchanges(p) == 1
    assert "Expand" in p
    # the partial aggregate must carry SKETCH buffers map-side (the property
    # that bounds the shuffle to n_groups * k bytes, not the corpus)
    assert "partial_theta_sketch_agg" in p and "partial_kll_sketch_agg_double" in p


def test_null_group_distinct_from_all_row(spark):
    """A genuinely NULL group value keeps its own row (group_key NULL) and is
    NOT folded into the rollup total labeled 'ALL'."""
    rows = [
        Row(doc_id=1, text="a", lang="en", source="s1", n_chars=1),
        Row(doc_id=2, text="b", lang="en", source=None, n_chars=2),
        Row(doc_id=3, text="c", lang="de", source=None, n_chars=3),
    ]
    df = spark.createDataFrame(rows)
    out = {r["group_key"]: r for r in sketch_profile(df).collect()}
    assert set(out) == {"s1", None, "ALL"}
    assert out[None]["n_docs"] == 2
    assert out[None]["distinct_lang"] == 2
    assert out["ALL"]["n_docs"] == 3
    assert out["ALL"]["p50_n_chars"] == 2.0


def test_kll_inclusive_rank_convention_grid(spark):
    """Pin the frozen quantile convention the DuckDB oracle encodes: while
    exact, kll_sketch_get_quantile(q) returns the 1-based order statistic at
    rank max(1, ceil(q*n)) — INCLUSIVE ranks. A silent Spark default change
    (e.g. to exclusive ranks) would break the corpus_sketch_profile oracle
    only on some (q, n) boundaries; this grid (duplicate-heavy values, n
    incl. 1/2/primes/exact-multiples, q incl. 0/1 and rank-integer points)
    catches it deterministically in ONE Spark job."""
    import math

    sizes = [1, 2, 3, 7, 8, 10, 29, 100, 240]
    qs = [0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    # duplicate-heavy deterministic values: v = (i * 13) % max(3, n // 2)
    cases = [
        (n, sorted(float((i * 13) % max(3, n // 2)) for i in range(n)))
        for n in sizes
    ]
    rows = [
        Row(case=n, v=val) for n, vals in cases for val in vals
    ]
    df = spark.createDataFrame(rows)
    aggs = [
        kll_quantile("v", q).alias(f"q{int(q * 100)}") for q in qs
    ]
    got = {r["case"]: r for r in df.groupBy("case").agg(*aggs).collect()}
    for n, vals in cases:
        for q in qs:
            rank = max(1, math.ceil(q * n))
            expected = vals[rank - 1]
            actual = got[n][f"q{int(q * 100)}"]
            assert actual == expected, (n, q, rank, actual, expected)


def test_validation_errors(spark):
    docs = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(1).alias("n_chars"),
    )
    with pytest.raises(ValueError, match="missing"):
        sketch_profile(docs, group_col="nope")
    with pytest.raises(ValueError, match="quantile"):
        sketch_profile(docs, quantiles=(1.5,))
    with pytest.raises(ValueError, match="reserved"):
        sketch_profile(docs.withColumn("group_key", F.lit(1)))
    with pytest.raises(TypeError, match="column NAME"):
        theta_distinct(F.col("text"))
    with pytest.raises(ValueError, match="quantile"):
        kll_quantile("n_chars", -0.1)
