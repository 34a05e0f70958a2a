"""Unit tests for decontamination (n-gram eval-set overlap) and PII scrub
with hand-computed expectations on tiny in-memory frames."""

from __future__ import annotations

from vector_db_light_spark.operators.decontam import ngram_overlap
from vector_db_light_spark.operators.pii import scrub


def _doc(words):
    return " ".join(words)


def test_ngram_overlap_hand_computed(spark):
    # eval doc: tokens a..j  => 8-grams: a..h, b..i, c..j  (3 grams)
    letters = "a b c d e f g h i j".split()
    eval_docs = spark.createDataFrame([(0, _doc(letters))], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            # identical -> 3/3 grams matched
            (1, _doc(letters)),
            # first 9 tokens + new tail: grams a..h (hit), b..i (hit),
            # c..i,zz (miss)
            (2, _doc(letters[:9] + ["zz"])),
            # disjoint vocabulary -> 0 matched
            (3, _doc([f"w{i}" for i in range(10)])),
            # shorter than n -> zero grams, zero frac
            (4, _doc(letters[:5])),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_overlap(corpus, eval_docs, n=8, threshold=0.5).collect()
    }
    assert (rows[1]["n_grams"], rows[1]["n_matched"]) == (3, 3)
    assert rows[1]["contaminated"] == 1
    assert (rows[2]["n_grams"], rows[2]["n_matched"]) == (3, 2)
    assert abs(rows[2]["overlap_frac"] - 2 / 3) < 1e-12
    assert rows[2]["contaminated"] == 1
    assert (rows[3]["n_grams"], rows[3]["n_matched"]) == (3, 0)
    assert (rows[4]["n_grams"], rows[4]["n_matched"]) == (0, 0)
    assert rows[4]["overlap_frac"] == 0.0


def test_ngram_overlap_counts_distinct_grams(spark):
    # "x y x y x y x y x y x y" has many positions but only 2 distinct 8-grams
    eval_docs = spark.createDataFrame([(0, "x y " * 6)], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "x y " * 6)], "doc_id long, text string")
    row = ngram_overlap(corpus, eval_docs, n=8).collect()[0]
    assert row["n_grams"] == 2  # 'x y x y x y x y' and 'y x y x y x y x'
    assert row["n_matched"] == 2


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org today"),
            (2, "ssn 123-45-6789 and phone 555-867-5309"),
            (3, "hosts 10.0.0.1 and 192.168.13.42"),
            (4, "nothing sensitive here"),
            (5, "two mails a@b.co c@d.io"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["has_pii"] == 1
    assert "<EMAIL>" in rows[1]["redacted"]
    assert "jo.doe" not in rows[1]["redacted"]
    assert (rows[2]["n_ssn"], rows[2]["n_phone"]) == (1, 1)
    assert rows[2]["redacted"] == "ssn <SSN> and phone <PHONE>"
    assert rows[3]["n_ipv4"] == 2
    assert rows[3]["redacted"] == "hosts <IP> and <IP>"
    assert rows[4]["has_pii"] == 0
    assert rows[4]["redacted"] == "nothing sensitive here"
    assert rows[5]["n_email"] == 2
    assert rows[5]["redacted"] == "two mails <EMAIL> <EMAIL>"


def test_pii_ssn_phone_do_not_cross_match(spark):
    # 3-3-4 digit phones must not be eaten by the 3-2-4 SSN pattern and
    # vice versa.
    df = spark.createDataFrame(
        [(1, "555-867-5309"), (2, "123-45-6789")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in scrub(df).collect()}
    assert (rows[1]["n_phone"], rows[1]["n_ssn"]) == (1, 0)
    assert (rows[2]["n_phone"], rows[2]["n_ssn"]) == (0, 1)


def test_luhn_valid_hand_cases(spark):
    """ISO 7812 checksum: known-valid test numbers pass, off-by-one check
    digits fail, and validation composes inside the higher-order filter."""
    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.pii import cc_detection, luhn_valid

    cases = [
        ("4532-0151-1283-0366", True),   # computed check digit
        ("4532-0151-1283-0367", False),  # broken check digit
        ("4111-1111-1111-1111", True),   # classic Visa test number
        ("1234-5678-9012-3456", False),
    ]
    df = spark.createDataFrame(cases, "card string, expect boolean")
    got = df.select("expect", luhn_valid(F.col("card")).alias("got")).collect()
    assert all(r["expect"] == r["got"] for r in got)

    text_df = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 or ref 1234-5678-9012-3456 ok")],
        "doc_id bigint, text string",
    )
    d = cc_detection("text")
    row = text_df.select(
        d["n_cc_candidates"].alias("c"), d["n_cc_valid"].alias("v")
    ).collect()[0]
    assert (row["c"], row["v"]) == (2, 1)
