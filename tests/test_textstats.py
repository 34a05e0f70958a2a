"""Repetition-metric properties with hand-computed expectations."""

from __future__ import annotations

import pytest

from vector_db_light_spark.operators.textstats import repetition_metrics


def _row(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return repetition_metrics(df).collect()[0]


def test_alternating_bigram_dominates(spark):
    # tokens [a b a b a b]: "a b" occurs 3x, 2 chars -> top2 covers 6/6 chars
    r = _row(spark, "a b a b a b")
    assert r["n_tokens"] == 6
    assert r["unique_token_ratio"] == pytest.approx(2 / 6)
    assert r["top2_char_frac"] == pytest.approx(1.0)
    # every 5-gram is unique -> no duplicated-5-gram coverage
    assert r["dup5_char_frac"] == 0.0


def test_dup5_counts_overlapping_coverage_once(spark):
    # tokens [x y z x y z x y z w]: "x y z x y" at pos 1,4 and
    # "y z x y z" at pos 2,5 -> covered positions 1..9 of 10 -> 0.9
    r = _row(spark, "x y z x y z x y z w")
    assert r["dup5_char_frac"] == pytest.approx(0.9)


def test_short_doc_no_grams(spark):
    r = _row(spark, "lonely")
    assert r["n_tokens"] == 1
    assert r["unique_token_ratio"] == 1.0
    assert r["top2_char_frac"] == 0.0
    assert r["dup5_char_frac"] == 0.0


def test_full_self_repeat_covers_everything(spark):
    base = "one two three four five six"
    r = _row(spark, base + " " + base)
    # every 5-gram inside each copy occurs twice; coverage spans all tokens
    assert r["dup5_char_frac"] == pytest.approx(1.0)
    assert r["unique_token_ratio"] == pytest.approx(0.5)
