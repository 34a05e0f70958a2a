"""BM25 distributed result == scalar reference computation."""

from __future__ import annotations

import math

import pytest

from vector_db_light_spark.operators.text_search import bm25_score_py, bm25_topk


def test_bm25_matches_scalar_reference(spark):
    corpus = [
        (1, "spark query engine runs a fast query"),
        (2, "table scan and table join in spark"),
        (3, "nothing relevant here at all"),
        (4, "query"),
        (5, "spark spark spark table query batch"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["spark", "query"], k=5).collect()}

    # scalar reference
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    want = {}
    for term in ("spark", "query"):
        df = sum(1 for t in toks.values() if term in t)
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                want[d] = want.get(d, 0.0) + bm25_score_py(tf, df, n, dls[d], avgdl)
    want = {d: round(s, 6) for d, s in want.items()}

    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6)
    # doc 3 matches nothing and must be absent
    assert 3 not in got
    # heavier term repetition saturates, not explodes: doc5 tops doc1
    assert got[5] > got[1]


def test_bm25_idf_downweights_common_terms(spark):
    # 'common' appears everywhere, 'rare' once: the rare-term doc must win
    corpus = [(i, "common filler text") for i in range(1, 9)] + [
        (9, "common rare text")
    ]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    top = bm25_topk(docs, ["common", "rare"], k=1).collect()[0]
    assert top["doc_id"] == 9


def test_bm25_score_py_is_finite_and_positive(spark):
    s = bm25_score_py(tf=2, df=3, n=100, dl=50, avgdl=40.0)
    assert s > 0 and math.isfinite(s)


def test_phrase_match_chain_join_hand_cases(spark):
    """Positional phrase search: overlapping matches, repeated phrase
    terms, and phrase-absent docs — the chain join must count exactly the
    start offsets a direct scan finds."""
    from vector_db_light_spark.operators.text_search import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),      # "a b a": overlapping at 0 and 2
            (2, "x a b a y"),      # one match at 1
            (3, "a b b a"),        # none
            (4, "a a a a"),        # "a a a" would overlap; not our phrase
        ],
        "doc_id bigint, text string",
    )
    postings = positional_postings(docs)
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(postings, ["a", "b", "a"]).collect()
    }
    assert got == {1: (2, 0), 2: (1, 1)}
    # single-term phrase degenerates to the posting list itself
    one = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(postings, ["a"]).collect()
    }
    assert one == {1: 3, 2: 2, 3: 2, 4: 4}


def test_proximity_match_hand_cases(spark):
    """NEAR/slop: either order, per-doc fan-out bounded by posting lists,
    min_span is the tightest pair."""
    from vector_db_light_spark.operators.text_search import (
        positional_postings,
        proximity_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha x x beta"),        # span 3
            (2, "beta alpha"),            # reversed, span 1
            (3, "alpha x x x x x beta"),  # span 6 > slop
            (4, "alpha beta x alpha"),    # spans 1 and 2 (two alphas)
        ],
        "doc_id bigint, text string",
    )
    postings = positional_postings(docs)
    got = {
        r["doc_id"]: (r["n_matches"], r["min_span"])
        for r in proximity_match(postings, "alpha", "beta", slop=4).collect()
    }
    assert got == {1: (1, 3), 2: (1, 1), 4: (2, 1)}


def test_wand_equals_full_scoring_and_prunes(spark):
    """bm25_wand_topk must return EXACTLY bm25_topk's rows (score + tie
    order) while exactly scoring strictly fewer postings than full
    scoring touches — the lossless-prune contract."""
    from vector_db_light_spark.operators.text_search import (
        bm25_wand_topk,
        wand_pruning_stats,
    )

    # Skewed corpus: a few docs stack the query terms (high scores), a
    # long tail mentions one term once in a long doc (low upper bounds) —
    # the shape WAND prunes. The tail must exceed the seed POOL
    # (max(8k, 64) exactly-scored docs, now honestly counted in the
    # stats — ADVICE r10) for a strict prune to be observable.
    tail = [
        (100 + i, "spark " + " ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(200)
    ]
    corpus = [
        (1, "spark query spark query table scan"),
        (2, "query table spark join table"),
        (3, "spark spark query"),
        (4, "table query spark batch"),
        (5, "unrelated words only here"),
    ] + tail
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    terms = ["spark", "query", "table"]

    full = bm25_topk(docs, terms, k=3).collect()
    wand = bm25_wand_topk(docs, terms, k=3).collect()
    assert [r.asDict() for r in wand] == [r.asDict() for r in full]

    st = wand_pruning_stats(docs, terms, k=3).collect()[0]
    assert st["n_postings_scored"] < st["n_postings_total"]
    assert st["n_docs_scored"] >= 3  # at least the top-k themselves


def test_wand_equals_full_scoring_under_ties_and_small_corpus(spark):
    """k larger than the corpus + exact ties: θ comes from fewer than k
    seeds and every doc must survive — degenerate but lossless."""
    from vector_db_light_spark.operators.text_search import bm25_wand_topk

    corpus = [
        (1, "alpha beta"),
        (2, "alpha beta"),  # exact tie with doc 1 — doc_id breaks it
        (3, "beta gamma"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    full = bm25_topk(docs, ["alpha", "beta"], k=10).collect()
    wand = bm25_wand_topk(docs, ["alpha", "beta"], k=10).collect()
    assert [r.asDict() for r in wand] == [r.asDict() for r in full]
