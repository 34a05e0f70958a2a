"""Lexical (BM25) retrieval — the keyword-ranking complement to the vector
path (beyond the reference's surface; its retrieval is embedding-only,
vector_db_query.py). Pure Catalyst: tokenize -> explode -> per-(doc, term)
TF -> per-term DF -> idf join -> score aggregate. The exploded (term, doc)
layout IS the inverted index at cluster scale: partition/bucket it by term
and a query touches only its terms' partitions.

Float-parity note: ln() is the one op here that is only ~1-ulp reproducible
across engines (java.lang.Math.log vs libm), so BM25 scores are rounded to
6 decimals on BOTH sides before ranking and output; ordering ties broken by
doc id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_expr

K1 = 1.2
B = 0.75


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, dl): term counts per doc plus the doc's token length.
    One explode + one (id, term) groupBy — the inverted-index build."""
    toks = docs.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    exploded = toks.select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    return exploded.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by BM25(k1=1.2, b=0.75) for a bag of query terms.

    Dataflow: TF table filtered to the query's terms FIRST (at scale: a
    partition-pruned read of the term-partitioned index — the filter is in
    the scan, everything after it is proportional to the posting lists, not
    the corpus), DF per term over the filtered postings, idf as the
    Robertson-Sparck-Jones smoothed form ln(1 + (N - df + .5)/(df + .5)),
    then one per-doc aggregate. N and avgdl are 1-row aggregates broadcast
    into the score expression.
    """
    tfs = term_frequencies(docs, id_col=id_col, text_col=text_col)
    stats = docs.select(
        F.count(F.lit(1)).alias("_n"),
    ).crossJoin(
        tfs.select(id_col, "dl")
        .distinct()
        .agg(F.avg("dl").alias("_avgdl"))
    )
    postings = tfs.filter(F.col("term").isin([t.lower() for t in query_terms]))
    df_per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_score_py(tf: int, df: int, n: int, dl: int, avgdl: float) -> float:
    """Reference scalar BM25 (tests cross-check the distributed result)."""
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))


def vocabulary(
    docs: DataFrame,
    top_k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: (term, tf, df) — total occurrences and document
    frequency per term — optionally truncated to the top_k terms by
    (df desc, tf desc, term asc).

    The tokenizer-training / corpus-profiling companion to the BM25 index:
    same explode, but aggregated per TERM instead of per (doc, term). Two
    shuffles — the (doc, term) partial (which also serves as the exact
    distinct-doc count input) then the term rollup; both carry one row per
    distinct key thanks to map-side partial aggregation. The top-k is
    TakeOrdered over the (small) term table, never a global sort of the
    corpus."""
    per_doc = term_frequencies(docs, id_col=id_col, text_col=text_col)
    vocab = per_doc.groupBy("term").agg(
        F.sum("tf").alias("tf"),
        F.count(F.lit(1)).alias("df"),
    )
    if top_k is not None:
        vocab = vocab.orderBy(
            F.col("df").desc(), F.col("tf").desc(), F.col("term")
        ).limit(top_k)
    return vocab


def cross_rerank(
    candidates: DataFrame,
    query_text: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Second-stage reranker over a RETRIEVED CANDIDATE SET — the two-stage
    retrieval shape (retrieve cheap & wide, rerank expensive & narrow) the
    reference's single-stage pipeline lacks. The scorer runs as an
    Arrow-batched ``mapInPandas`` pairwise model over (query, doc) pairs;
    at 100 TB this stage sees only the k1 candidates per query — broadcast
    scale — never the corpus, so an arbitrarily expensive cross-encoder
    slots in without any plan change.

    The scorer here is a deterministic surrogate (distinct-token Dice
    coefficient, ``2|Q∩D| / (|Q|+|D|)``) standing in for a cross-encoder
    forward pass; integer set sizes + one final division keep it
    oracle-exact. Replace ``_dice`` with a model call when the lib is
    present (same seam as functions/embedding.py).

    Tokenization matches the oracle's RE2 ``\\s`` class ``[\\t\\n\\f\\r ]``
    EXPLICITLY — Python ``str.split()`` also splits on \\x0b/\\x1c-\\x1f/
    U+00A0 etc., a silent divergence waiting for the first non-ascii
    fixture regeneration."""
    import re

    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    _ws = re.compile(r"[\t\n\f\r ]+")

    def _tokens(text: str) -> set[str]:
        return {t for t in _ws.split(text.lower()) if t}

    q_toks = _tokens(query_text)
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("rerank_score", DoubleType(), False),
        ]
    )

    def _dice(text: str) -> float:
        d_toks = _tokens(text)
        denom = len(q_toks) + len(d_toks)
        if denom == 0:
            return 0.0
        return 2.0 * len(q_toks & d_toks) / denom

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "rerank_score": [_dice(t) for t in pdf[text_col]],
                }
            )

    return candidates.select(id_col, text_col).mapInPandas(run, schema=schema)


def bm25_topk_terms_df(
    docs: DataFrame,
    terms_df: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`bm25_topk` with a DATA-DEPENDENT term set (a 1-column
    ``term`` DataFrame) — the postings filter becomes a broadcast
    left-semi join instead of a literal IN, which is what a query-
    expansion stage needs (its terms come out of the corpus, not the
    caller). Same scoring, same 6-decimal rounding contract."""
    tfs = term_frequencies(docs, id_col=id_col, text_col=text_col)
    stats = docs.select(F.count(F.lit(1)).alias("_n")).crossJoin(
        tfs.select(id_col, "dl").distinct().agg(F.avg("dl").alias("_avgdl"))
    )
    postings = tfs.join(F.broadcast(terms_df.select("term")), "term", "left_semi")
    df_per_term = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def prf_expansion_terms(
    docs: DataFrame,
    seed_terms: list[str],
    n_fb_docs: int = 5,
    n_fb_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio-style, rank-only): take the
    seed query's BM25 top-``n_fb_docs``, then pick the ``n_fb_terms``
    terms that (a) are not seed terms, (b) occur in at least 2 feedback
    docs (theme, not one doc's quirk), ranked by total feedback tf
    (INTEGER ordering — the selection is float-free; only the BM25 stages
    keep the 6-decimal rounding contract), tie alphabetic. Returns the
    expanded 1-column ``term`` DataFrame (seed + feedback)."""
    fb_docs = bm25_topk(
        docs, seed_terms, k=n_fb_docs, id_col=id_col, text_col=text_col
    ).select(id_col)
    tfs = term_frequencies(docs, id_col=id_col, text_col=text_col)
    fb_tf = tfs.join(F.broadcast(fb_docs), id_col)
    seeds = [t.lower() for t in seed_terms]
    fb_terms = (
        fb_tf.filter(~F.col("term").isin(seeds))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("fb_df"),
            F.sum("tf").alias("fb_tf"),
        )
        .filter(F.col("fb_df") >= 2)
        .orderBy(F.col("fb_tf").desc(), F.col("term").asc())
        .limit(n_fb_terms)
        .select("term")
    )
    seed_df = docs.sparkSession.createDataFrame(
        [(t,) for t in seeds], "term string"
    )
    return seed_df.unionByName(fb_terms).distinct()


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, pos): the POSITIONAL inverted index (0-based token
    offsets) that phrase and proximity queries need beyond bag-of-words
    BM25. One tokenize + one posexplode — at cluster scale this table is
    written once, partitioned/bucketed by term, and a phrase query reads
    only its terms' partitions."""
    toks = docs.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    return toks.select(
        F.col(id_col), F.posexplode("_toks").alias("pos", "term")
    ).select(id_col, "term", "pos")


def phrase_match(
    postings: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_matches, first_pos) for documents containing the exact token
    ``phrase``: the classic positional-index chain join — the first term's
    postings equi-join each later term's on (id, pos + offset). Every join
    side is pre-filtered to ONE term (partition-pruned at the index scan),
    so work is proportional to the phrase terms' posting lists, never the
    corpus. Duplicate phrase terms are handled naturally: the join is on
    positions, not terms."""
    if not phrase:
        raise ValueError("empty phrase")
    terms = [t.lower() for t in phrase]
    base = postings.filter(F.col("term") == terms[0]).select(
        F.col(id_col), F.col("pos").alias("_p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("_p0")
        )
        base = base.join(nxt, [id_col, "_p0"])
    return base.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("_p0").cast("long").alias("first_pos"),
    )


def proximity_match(
    postings: DataFrame,
    term_a: str,
    term_b: str,
    slop: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_matches, min_span) for documents where ``term_a`` and
    ``term_b`` occur within ``slop`` token positions of each other in
    either order (the NEAR/n operator). One equi-join on the doc id with
    the |pos diff| window as a join residual; both sides are one-term
    posting lists, so the doc-id join fans out as |pa| x |pb| PER DOC —
    bounded by per-doc term frequency, never the corpus."""
    a = postings.filter(F.col("term") == term_a.lower()).select(
        F.col(id_col), F.col("pos").alias("_pa")
    )
    b = postings.filter(F.col("term") == term_b.lower()).select(
        F.col(id_col), F.col("pos").alias("_pb")
    )
    span = F.abs(F.col("_pa") - F.col("_pb"))
    return (
        a.join(b, id_col)
        .filter(span <= slop)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min(span).cast("long").alias("min_span"),
        )
    )
