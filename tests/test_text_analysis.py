"""Text-analysis column functions: edge cases the oracle corpus can't hit."""

import pytest
from pyspark.sql import functions as F

from imposm2_spark.functions import text_analysis as ta

pytestmark = pytest.mark.spark


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).first().v


def test_empty_and_whitespace_text(spark):
    for t in ("", "   "):
        assert _one(spark, t, ta.token_count_ws(F.col("text"))) == 0
        assert _one(spark, t, ta.lang_id(F.col("text"))) == "und"
        assert _one(spark, t, ta.quality_score(F.col("text"))) == 0.0


def test_lang_id_stopword_sets(spark):
    cases = {
        "the cat and the dog is in a house": "en",
        "der hund und die katze ist von den": "de",
        "le chat et la maison les des un une": "fr",
        "el perro y la casa los que en un": "es",
        "zzz qqq xxx": "und",
    }
    for text, want in cases.items():
        assert _one(spark, text, ta.lang_id(F.col("text"))) == want, text


def test_lang_id_tiebreak_prefers_lang_order(spark):
    # 'la' is in both fr and es sets; equal hits -> earlier LANG_ORDER wins (fr)
    assert _one(spark, "la la la", ta.lang_id(F.col("text"))) == "fr"


def test_fingerprint_is_order_sensitive(spark):
    a = _one(spark, "alpha beta", ta.fingerprint(F.col("text")))
    b = _one(spark, "beta alpha", ta.fingerprint(F.col("text")))
    assert a != b
    assert a == _one(spark, "alpha beta", ta.fingerprint(F.col("text")))


def test_token_count_bpe_splits_punct(spark):
    assert _one(spark, "don't stop-me now!!", ta.token_count_bpe(F.col("text"))) == 9


def test_quality_monotone_in_alpha(spark):
    clean = _one(spark, "the clean readable sentence and it is fine", ta.quality_score(F.col("text")))
    noisy = _one(spark, "@@## $$%% ^^&& ))(( ||\\\\ ??>>", ta.quality_score(F.col("text")))
    assert clean > noisy
    assert noisy == 0.0
