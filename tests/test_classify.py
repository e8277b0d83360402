"""T31 quality-classifier scoring: hand-computed logits, inline == join,
plan locks, and the vocabulary-size plan switch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imposm2_spark.functions.classify import grams_expr, score_quality

W = {"the": 100, "fast": 200, "slow": -300, "the_fast": 50, "dup_dup": -400}

DOCS = [
    (1, "The fast fox"),          # the+fast+the_fast = 350
    (2, "slow DUP dup dup"),      # slow + 2x dup_dup = -1100
    (3, ""),                      # empty -> bias only
    (4, "nothing matches here"),  # zero-match -> bias only
    (5, "the the"),               # repeated unigram counts twice = 200
]
SCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def _rows(df):
    return sorted(
        (r.doc_id, r.n_grams, r.logit_milli, r.keep) for r in df.collect()
    )


def test_hand_computed_logits(spark):
    got = _rows(score_quality(_docs(spark), W, bias_milli=-50))
    assert got == [
        (1, 5, 300, True),    # 3 toks + 2 bigrams; 350 - 50
        (2, 7, -1150, False),
        (3, 0, -50, False),
        (4, 5, -50, False),
        (5, 3, 150, True),    # the,the,the_the -> 100+100+0 - 50
    ]


def test_inline_equals_join_plan(spark):
    docs = _docs(spark)
    inline = _rows(score_quality(docs, W, bias_milli=-50))
    # force the broadcast-join plan by shrinking the inline cap
    join = _rows(score_quality(docs, W, bias_milli=-50, max_inline_weights=2))
    assert inline == join


def test_weights_dataframe_input(spark):
    docs = _docs(spark)
    wdf = spark.createDataFrame(
        sorted(W.items()), "gram string, weight_milli long"
    )
    assert _rows(score_quality(docs, wdf, bias_milli=-50)) == _rows(
        score_quality(docs, W, bias_milli=-50)
    )


def test_empty_weights(spark):
    got = _rows(score_quality(_docs(spark), {}, bias_milli=7))
    assert all(logit == 7 and keep for _, _, logit, keep in got)


def test_threshold_boundary(spark):
    # logit == threshold keeps (>=)
    got = {
        r.doc_id: r.keep
        for r in score_quality(
            _docs(spark), W, bias_milli=0, threshold_milli=350
        ).collect()
    }
    assert got[1] is True and got[5] is False


def test_inline_plan_is_exchange_free_jvm_only(spark):
    df = score_quality(_docs(spark), W)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_join_plan_broadcasts_weights_no_corpus_shuffle(spark):
    df = score_quality(_docs(spark), W, max_inline_weights=2)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in p
    assert "partial_sum" in p  # per-doc weight sum combines map-side


def test_grams_expr_shapes(spark):
    got = (
        spark.createDataFrame([("a b c",), ("",), ("x",)], "text string")
        .select(grams_expr(F.col("text")).alias("g"))
        .collect()
    )
    assert [r.g for r in got] == [["a", "b", "c", "a_b", "b_c"], [], ["x"]]


def test_null_text_scores_bias_only(spark):
    docs = spark.createDataFrame([(9, None)], "doc_id long, text string")
    r = score_quality(docs, W, bias_milli=-5).collect()[0]
    assert (r.n_grams, r.logit_milli, r.keep) == (0, -5, False)


def test_arrow_engine_equals_inline(spark):
    got_i = _rows(score_quality(_docs(spark), W, bias_milli=-50))
    got_a = _rows(score_quality(_docs(spark), W, bias_milli=-50, engine="arrow"))
    assert got_i == got_a


def test_arrow_engine_fuzz_corpus_and_random(spark):
    import random

    rng = random.Random(7)
    vocab = list(W) + ["zz", "q q", "the fast", "x"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(200)
    ] + [(900, None), (901, ""), (902, "  \t the   fast \n dup dup ")]
    docs = spark.createDataFrame(rows, SCHEMA)
    a = _rows(score_quality(docs, W, bias_milli=3, threshold_milli=100))
    b = _rows(
        score_quality(docs, W, bias_milli=3, threshold_milli=100, engine="arrow")
    )
    assert a == b
    # and on the real sf corpus
    from imposm2_spark.sources.testdata import load

    corpus = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ca = _rows(score_quality(corpus, W))
    cb = _rows(score_quality(corpus, W, engine="arrow"))
    assert ca == cb


def test_unknown_engine_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown engine"):
        score_quality(_docs(spark), W, engine="nope")
