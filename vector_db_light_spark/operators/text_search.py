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
from pyspark.sql.window import Window

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


def build_text_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Persistable positional index: :func:`positional_postings` plus the
    ``term_bucket`` partition key (same 256-way md5 bucket as the TF
    index), so phrase/NEAR queries read only their terms' partitions.
    Pure per-doc rows — incremental append needs NO merge (api and the
    streaming maintenance just append the new docs' positions)."""
    return positional_postings(docs, id_col=id_col, text_col=text_col).withColumn(
        "term_bucket", term_bucket_expr(F.col("term"))
    )


def positions_for_terms(positions: DataFrame, terms: list[str]) -> DataFrame:
    """Query-term positional postings with the driver-computed bucket
    filter first (PartitionFilters in the artifact scan)."""
    lowered = [t.lower() for t in terms]
    buckets = sorted({term_bucket_py(t) for t in lowered})
    return positions.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(lowered)
    ).select(*[c for c in positions.columns if c != "term_bucket"])


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


def _bm25_sc(tf, dl, df, n, avgdl):
    """Per-posting BM25 contribution — the EXACT expression shape
    ``bm25_topk`` scores with, shared so the WAND-pruned path's rounded
    per-doc sums are bit-compatible with the full-scoring path."""
    return (
        F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        * (tf * (K1 + 1))
        / (tf + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * dl / avgdl))
    )


def bm25_wand_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_size: int | None = None,
) -> DataFrame:
    """Top-k BM25 with max-score/WAND upper-bound pruning — result-equal to
    ``bm25_topk`` (same terms, same 6-decimal rounding, same tie-break) but
    only a θ-pruned candidate subset is ever exactly scored.
    ``block_size`` switches the upper bounds to BLOCK-MAX (per-(term,
    id-div-block) maxima, _wand_parts_from docstring) — still lossless for
    any block size; tightness requires blocks smaller than the heavy-doc
    spacing (measured: 5.7x fewer exactly-scored docs on the skewed
    corpus at block 8, no change at 64).

    Index-time metadata (stored WITH the postings at cluster scale, like
    block-max WAND's per-block maxima): per-term ``(df, tf_max, dl_min)``
    integer aggregates. Because the BM25 contribution is monotone
    increasing in tf and decreasing in dl for a fixed term,
    ``ub_t = sc(tf_max, dl_min)`` upper-bounds every posting of t, so
    ``Σ_t∈doc ub_t`` upper-bounds every doc's true score.

    Query time: (1) per-doc upper bounds from the membership-only postings
    scan + the broadcast term sidecar; (2) seed the floor θ by exactly
    scoring a SEED POOL of ``max(8k, 64)`` docs with the largest upper
    bounds — θ = the k-th best rounded seed score. The pool is bigger than
    k on purpose: per-doc ub is Σ of per-TERM constants, so every doc
    containing the same query-term subset ties in ub, and the top-k-by-ub
    pick inside the tie group is arbitrary — k seeds then give a weak θ
    (measured: 13% posting prune vs the 45%-of-candidate-docs ideal at
    sf0.1). A 8k-sized pool of exactly-scored seeds pushes θ to ~the true
    floor for the cost of scoring 8k docs. (3) exactly score only docs
    with ub ≥ θ − 1e-6 (the guard absorbs the 6-dp rounding of θ plus
    float-sum noise, so no true top-k doc — score ≥ θ implies ub ≥ θ — is
    ever pruned).

    Correctness does not depend on the pruning decision (any superset of
    {score ≥ θ} yields the identical top-k); the pruning only bounds the
    scored-postings work, which ``wand_pruning_stats`` measures. Prune
    DEPTH is corpus-dependent: term-level WAND can only drop docs whose
    query-term SUBSET bounds them under θ, so on the uniform word-salad
    fixture the ceiling is exactly the docs missing ≥1 term (~45% of
    candidates; block-max per-(term, doc-block) maxima were measured and
    move that ceiling only at block size ~4 on this corpus), while on
    skewed corpora (the unit test's shape) it prunes the long tail. At
    100 TB the postings are term-partitioned, the sidecar is
    dictionary-scale broadcast state, and survivors are ~k-scale (AQE
    converts the semi-join to broadcast at runtime if the static hint is
    ever wrong)."""
    terms = [t.lower() for t in query_terms]
    blk = (
        F.expr(f"{id_col} div {int(block_size)}") if block_size else None
    )
    parts = _wand_parts(docs, terms, k, id_col, text_col, block_expr=blk)
    scored = _bm25_exact_scores(
        parts["postings"].join(
            F.broadcast(parts["survivors"]), id_col, "left_semi"
        ),
        parts["term_meta"],
        parts["stats"],
        id_col,
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def _bm25_exact_scores(postings, term_meta, stats, id_col):
    return (
        postings.join(F.broadcast(term_meta.select("term", "df")), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            _bm25_sc(
                F.col("tf"), F.col("dl"), F.col("df"), F.col("_n"), F.col("_avgdl")
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
    )


def _wand_parts(docs, terms, k, id_col, text_col, block_expr=None):
    """Shared WAND dataflow pieces (also consumed by wand_pruning_stats).

    ``postings`` (query-term rows) and ``stats`` (1 row) are each consumed
    by several downstream branches, so both get an eager localCheckpoint —
    the CLAUDE.md multi-consumer rule; without it every branch re-runs the
    corpus tokenize+explode. The full TF table is deliberately NOT
    materialized: it is scanned twice (stats, postings) but checkpointing
    the corpus-sized table costs more than the second scan (measured
    1.9 s -> 2.5 s at sf0.1). At cluster scale neither scan exists —
    ``term_frequencies`` IS the stored term-partitioned index and avgdl/N
    live in its build-time stats sidecar."""
    tfs = term_frequencies(docs, id_col=id_col, text_col=text_col)
    stats = (
        docs.select(F.count(F.lit(1)).alias("_n"))
        .crossJoin(
            tfs.select(id_col, "dl").distinct().agg(F.avg("dl").alias("_avgdl"))
        )
        .localCheckpoint(eager=True)
    )
    postings = tfs.filter(F.col("term").isin(terms)).localCheckpoint(
        eager=True
    )
    term_meta = (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.max("tf").alias("tf_max"),
            F.min("dl").alias("dl_min"),
        )
        .localCheckpoint(eager=True)
    )
    return _wand_parts_from(
        postings, term_meta, stats, k, id_col, block_expr=block_expr
    )


def _wand_parts_from(
    postings, term_meta, stats, k, id_col, block_expr=None, block_meta=None
):
    """WAND dataflow from prebuilt (postings, term_meta, stats) — the
    index-backed entry point: when the three tables come from a persisted
    text index (:func:`build_text_index_tables`), no corpus tokenize runs
    at query time at all. ``postings`` must already be filtered to the
    query's terms; ``term_meta`` per-term (df, tf_max, dl_min) over those
    terms (the index stores exactly this — query-filtering a global meta
    table yields the same rows the corpus path computes); ``stats`` one
    row (_n, _avgdl).

    ``block_expr`` (BLOCK-MAX WAND, round 11): when given, upper bounds
    use per-(term, block) maxima — ``max(tf)`` / ``min(dl)`` within each
    doc block — instead of the term-global pair. Still a valid upper
    bound per posting (every posting's (tf, dl) is dominated by its own
    block's extrema), so the prune stays lossless for ANY block
    assignment; tightness is what the assignment buys. Measured on the
    short-heavy/long-tail skewed corpus at sf0.1: 3180 exactly-scored
    docs term-level -> 558 with doc_id-div-8 blocks (5.7x), while blocks
    of 64 prune NOTHING there because every 64-wide block contains one of
    the every-50th heavy docs and inherits its extrema — block size must
    undercut the heavy-doc spacing, the classic BM-WAND sizing rule. At
    cluster scale the (term, block) table is the block-meta sidecar of
    the persisted index (one row per posting block, built once)."""
    if block_expr is None:
        ub_meta = term_meta.select(
            "term", F.lit(0).alias("_blk"), "tf_max", "dl_min"
        )
        p_blk = postings.withColumn("_blk", F.lit(0))
    elif block_meta is not None:
        # persisted block sidecar (build_text_block_meta): extrema come
        # from the artifact, zero query-time extrema computation
        p_blk = postings.withColumn("_blk", block_expr)
        ub_meta = block_meta
    else:
        p_blk = postings.withColumn("_blk", block_expr)
        ub_meta = p_blk.groupBy("term", "_blk").agg(
            F.max("tf").alias("tf_max"), F.min("dl").alias("dl_min")
        )
    ub_per_term = (
        ub_meta.join(F.broadcast(term_meta.select("term", "df")), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "_blk",
            _bm25_sc(
                F.col("tf_max"), F.col("dl_min"), F.col("df"), F.col("_n"), F.col("_avgdl")
            ).alias("_ub"),
        )
    )
    doc_ub = (
        p_blk.join(F.broadcast(ub_per_term), ["term", "_blk"])
        .groupBy(id_col)
        .agg(F.sum("_ub").alias("_doc_ub"))
        .localCheckpoint(eager=True)
    )
    # seed POOL larger than k (operator docstring: per-doc ubs tie within
    # same-term-subset groups, so k seeds give a weak θ); θ = k-th best
    # exactly-scored seed = min over the top-k of the pool's scores
    pool = max(8 * k, 64)
    seeds = doc_ub.orderBy(F.col("_doc_ub").desc(), F.col(id_col).asc()).limit(
        pool
    )
    theta = (
        _bm25_exact_scores(
            postings.join(
                F.broadcast(seeds.select(id_col)), id_col, "left_semi"
            ),
            term_meta,
            stats,
            id_col,
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
        .agg(F.min("bm25").alias("_theta"))
    )
    survivors = (
        doc_ub.crossJoin(F.broadcast(theta))
        .filter(F.col("_doc_ub") >= F.col("_theta") - F.lit(1e-6))
        .select(id_col)
    )
    return {
        "postings": postings,
        "stats": stats,
        "term_meta": term_meta,
        "seed_pool": seeds.select(id_col),
        "survivors": survivors,
    }


def wand_pruning_stats(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_size: int | None = None,
) -> DataFrame:
    """1-row measurement of the WAND prune: total query-term postings vs
    postings that actually reach the exact scorer. The exactly-scored set
    is the UNION of the seed pool (scored to establish θ, even when a seed
    is then pruned by θ) and the θ-survivors — counting only survivors
    would under-report the work the operator really does (ADVICE r10).
    tests/test_text_search assert scored < total; SCALE.md records the
    sf0.1 reduction. ``block_size`` measures the BLOCK-MAX variant."""
    terms = [t.lower() for t in query_terms]
    blk = (
        F.expr(f"{id_col} div {int(block_size)}") if block_size else None
    )
    parts = _wand_parts(docs, terms, k, id_col, text_col, block_expr=blk)
    postings = parts["postings"]
    scored_ids = (
        parts["seed_pool"]
        .unionByName(parts["survivors"])
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = postings.select(F.count(F.lit(1)).alias("n_postings_total"))
    n_scored = (
        postings.join(F.broadcast(scored_ids), id_col, "left_semi")
        .select(F.count(F.lit(1)).alias("n_postings_scored"))
    )
    n_docs = scored_ids.select(F.count(F.lit(1)).alias("n_docs_scored"))
    return n_total.crossJoin(n_scored).crossJoin(n_docs)


def batch_bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Multi-query BM25 top-k: a batch of B queries — (query_id, term)
    rows — answered with ONE pass over the postings, not B. The postings
    filter is the UNION of the batch's terms (a broadcast semi-join that
    at cluster scale is a partition-pruned read of the term-partitioned
    index), per-term df / corpus stats are query-independent, and the
    per-(query, doc) score re-joins the filtered postings against the
    broadcast query-term table. Per query the rounded scores and tie
    order are EXACTLY ``bm25_topk``'s for that query's terms (df/avgdl/N
    are global statistics, unaffected by what else is in the batch) —
    pinned by test_stream_serving_lexical. Top-k per query is the
    WindowGroupLimit shape."""
    terms = query_terms.select(
        F.col(query_id_col), F.lower(F.col(term_col)).alias("term")
    )
    tfs = term_frequencies(docs, id_col=id_col, text_col=text_col)
    stats = docs.select(F.count(F.lit(1)).alias("_n")).crossJoin(
        tfs.select(id_col, "dl").distinct().agg(F.avg("dl").alias("_avgdl"))
    )
    postings = tfs.join(
        F.broadcast(terms.select("term").distinct()), "term", "left_semi"
    ).localCheckpoint(eager=True)  # consumed by df-count and scoring
    df_per_term = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(terms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            _bm25_sc(
                F.col("tf"), F.col("dl"), F.col("df"), F.col("_n"), F.col("_avgdl")
            ).alias("_s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


# ---------------------------------------------------------------------------
# Persisted lexical index (VERDICT r10 #2): the lexical twin of
# api.build_ivf_index. Three tables, together the whole serving state —
# nothing at query time re-touches the corpus:
#
#   * postings  — term_frequencies(docs) + a ``term_bucket`` partition key
#     (first 2 hex chars of md5(term): 256 parquet partitions). A query
#     computes its terms' buckets DRIVER-SIDE and filters on the partition
#     column, so the scan is partition-pruned to ~terms/256 of the index.
#   * term_meta — per-term (df, tf_max, dl_min): df for idf, the
#     (tf_max, dl_min) pair is exactly WAND's upper-bound input.
#   * stats     — ONE row of MONOID components (n_docs, sum_dl, n_dl)
#     rather than the derived avgdl, so an incremental append merges
#     exactly: n' = n + n_new componentwise, and avgdl = sum_dl / n_dl is
#     re-derived at read (same IEEE division both paths — bit-identical
#     to the corpus path's avg(dl), which Spark also computes as exact
#     long sum / count).
#
# Incremental append contract (api.append rebuild-free path): postings of
# the NEW docs append to their partitions; term_meta merges by
# (sum df, max tf_max, min dl_min) — a commutative monoid, so
# append-then-merge == full rebuild bit-for-bit (pinned by
# test_text_index); stats adds componentwise. Deletions are NOT
# monoid-mergeable (max/min don't invert), so api.delete_documents
# rebuilds — the bounded-delta alternative (recompute meta only for the
# deleted docs' terms) is documented there.
# ---------------------------------------------------------------------------


def term_bucket_expr(term_col) -> "F.Column":
    """Partition key of the persisted postings: md5-prefix bucket (256)."""
    return F.substring(F.md5(term_col), 1, 2)


def term_bucket_py(term: str) -> str:
    """Driver-side twin of :func:`term_bucket_expr` for pruning literals."""
    import hashlib

    return hashlib.md5(term.encode()).hexdigest()[:2]


def build_text_index_tables(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
):
    """(postings, term_meta, stats) — the three persistable index tables.
    One tokenize pass; term_meta/stats are dictionary- and 1-row-scale."""
    tfs = term_frequencies(docs, id_col=id_col, text_col=text_col)
    postings = tfs.withColumn("term_bucket", term_bucket_expr(F.col("term")))
    term_meta = tfs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.max("tf").cast("long").alias("tf_max"),
        F.min("dl").cast("long").alias("dl_min"),
    )
    stats = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
        tfs.select(id_col, "dl")
        .distinct()
        .agg(
            F.sum("dl").cast("long").alias("sum_dl"),
            F.count(F.lit(1)).cast("long").alias("n_dl"),
        )
    )
    return postings, term_meta, stats


def _index_stats_view(stats: DataFrame) -> DataFrame:
    """Scoring-shape (_n, _avgdl) view of the monoid stats row."""
    return stats.select(
        F.col("n_docs").alias("_n"),
        (F.col("sum_dl") / F.col("n_dl")).alias("_avgdl"),
    )


def _index_postings_for(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Query-term postings with the partition-pruning bucket filter first
    (driver-computed literals -> PartitionFilters in the parquet scan)."""
    buckets = sorted({term_bucket_py(t) for t in terms})
    return postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )


def bm25_topk_from_index(
    postings: DataFrame,
    term_meta: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k served from the persisted index: bit-identical rows to
    :func:`bm25_topk` on the indexed corpus (pinned by test_text_index),
    but the query plan reads ~terms/256 of the postings and never touches
    the corpus text."""
    terms = [t.lower() for t in query_terms]
    p = _index_postings_for(postings, terms)
    scored = _bm25_exact_scores(
        p, term_meta.filter(F.col("term").isin(terms)), _index_stats_view(stats), id_col
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


TEXT_INDEX_BLOCK_SIZE = 8


def build_text_block_meta(
    postings: DataFrame,
    id_col: str = "doc_id",
    block_size: int = TEXT_INDEX_BLOCK_SIZE,
) -> DataFrame:
    """(term, term_bucket, _blk, tf_max, dl_min, block_size): the
    BLOCK-MAX sidecar of the persisted text index — per-(term, id-block)
    extrema, one row per posting block. (max, min) are a commutative
    monoid per (term, _blk), so an incremental append merges exactly
    (api._append_text_index). ``block_size`` rides along as a column so
    readers derive the matching block expression without a separate meta
    file; blocks must undercut the corpus' heavy-doc spacing to buy any
    prune (the measured BM-WAND sizing rule, SCALE.md)."""
    return postings.groupBy(
        "term",
        "term_bucket",
        F.expr(f"{id_col} div {int(block_size)}").alias("_blk"),
    ).agg(
        F.max("tf").alias("tf_max"),
        F.min("dl").alias("dl_min"),
        F.lit(int(block_size)).alias("block_size"),
    )


def index_block_size(block_meta: DataFrame) -> int:
    """The block-max sidecar's ``block_size`` is a single INDEX-LEVEL
    invariant (ADVICE r11 medium): postings get their ``_blk`` computed
    query-side with ONE size, so a sidecar holding rows built with two
    different sizes would silently drop the mismatched postings from the
    (term, _blk) join, shrink the per-doc upper bounds, and turn the
    'lossless' WAND prune lossy. Assert uniformity at read time and fail
    loudly instead of picking an arbitrary row. One-int-column distinct —
    map-side combined, dictionary-scale result. Empty sidecar falls back
    to the build default (nothing to mismatch)."""
    sizes = sorted(
        r[0] for r in block_meta.select("block_size").distinct().collect()
    )
    if len(sizes) > 1:
        raise ValueError(
            f"mixed block_size in block-max sidecar: {sizes}; "
            "rebuild the text index with one size"
        )
    return int(sizes[0]) if sizes else TEXT_INDEX_BLOCK_SIZE


def bm25_wand_topk_from_index(
    postings: DataFrame,
    term_meta: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    block_meta: DataFrame | None = None,
) -> DataFrame:
    """WAND-pruned BM25 from the persisted index — the sidecar's
    (df, tf_max, dl_min) feed the upper bounds directly, so the θ pass
    costs only the seed pool's postings. Pass the persisted
    ``block_meta`` sidecar (:func:`build_text_block_meta`) and the upper
    bounds tighten to BLOCK-MAX per-(term, id-block) extrema — no
    query-time extrema computation at all; the sidecar row count is
    postings/block_size, read pruned by the same term buckets."""
    terms = [t.lower() for t in query_terms]
    p = _index_postings_for(postings, terms).localCheckpoint(eager=True)
    meta = term_meta.filter(F.col("term").isin(terms)).localCheckpoint(
        eager=True
    )
    st = _index_stats_view(stats).localCheckpoint(eager=True)
    if block_meta is not None:
        buckets = sorted({term_bucket_py(t) for t in terms})
        bm = (
            block_meta.filter(
                F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
            )
            .select("term", "_blk", "tf_max", "dl_min", "block_size")
            .localCheckpoint(eager=True)
        )
        # index_block_size raises on a mixed-size sidecar (ADVICE r11:
        # a limit(1) pick would silently compute _blk with one size and
        # drop postings whose sidecar rows used another)
        blk_expr = F.expr(f"{id_col} div {index_block_size(bm)}")
        parts = _wand_parts_from(
            p, meta, st, k, id_col, block_expr=blk_expr,
            block_meta=bm.drop("block_size"),
        )
    else:
        parts = _wand_parts_from(p, meta, st, k, id_col)
    scored = _bm25_exact_scores(
        parts["postings"].join(
            F.broadcast(parts["survivors"]), id_col, "left_semi"
        ),
        parts["term_meta"],
        parts["stats"],
        id_col,
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def batch_bm25_topk_from_index(
    postings: DataFrame,
    term_meta: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Index-backed twin of :func:`batch_bm25_topk` (streaming lexical
    serving): the batch's union-of-terms semi-join carries the bucket key
    too, so dynamic partition pruning can restrict the postings scan to
    the batch's buckets; df comes from the sidecar, not a postings
    re-count. Per query bit-identical to ``bm25_topk`` on the indexed
    corpus."""
    terms = query_terms.select(
        F.col(query_id_col), F.lower(F.col(term_col)).alias("term")
    ).withColumn("term_bucket", term_bucket_expr(F.col("term")))
    p = postings.join(
        F.broadcast(terms.select("term_bucket", "term").distinct()),
        ["term_bucket", "term"],
        "left_semi",
    )
    scored = (
        p.join(F.broadcast(term_meta.select("term", "df")), "term")
        .join(F.broadcast(terms.select(query_id_col, "term")), "term")
        .crossJoin(F.broadcast(_index_stats_view(stats)))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            _bm25_sc(
                F.col("tf"), F.col("dl"), F.col("df"), F.col("_n"), F.col("_avgdl")
            ).alias("_s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
