"""Benchmark decontamination: flag corpus documents whose word n-grams
overlap an evaluation set's n-gram dictionary.

The standard pre-training hygiene step (the reference has no analogue; this
is part of the beyond-reference training-data surface): any document sharing
long n-grams with a held-out benchmark leaks test data into training. The
classic recipe — used by GPT-3/PaLM-style dedup appendices — is 8-gram
(or 13-gram) exact overlap.

Scale shape (100 TB corpus, megabyte-scale benchmark): the eval-set gram
dictionary is tiny relative to the corpus (benchmarks are thousands of
documents, the corpus billions), so it BROADCASTS — the corpus is scanned
once, narrow explode, broadcast hash join against the gram dictionary, and
ONE shuffle (the per-doc count aggregation) keyed on doc id. The corpus is
never shuffled on the gram. If the eval side ever outgrows broadcast range,
pass ``broadcast_eval=False`` to fall back to a gram-keyed shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_from_tokens, tokens_expr


def eval_gram_dictionary(
    eval_docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the evaluation set — the (small) probe side."""
    toks = eval_docs.select(tokens_expr(text_col).alias("_toks"))
    return (
        toks.select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("gram"))
        .distinct()
    )


def ngram_overlap(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document distinct-n-gram overlap fraction against the eval set.

    Returns (id, n_grams, n_matched, overlap_frac, contaminated): the count
    of the document's distinct n-grams, how many appear verbatim in the eval
    set, their ratio, and a 0/1 flag at ``threshold``. Documents shorter
    than n tokens yield n_grams = 0 and overlap_frac = 0.0.
    """
    dictionary = eval_gram_dictionary(eval_docs, n, text_col).withColumn(
        "_hit", F.lit(1)
    )
    # Hint at the join (a hint placed before withColumn is dropped by the
    # Project wrapped around it).
    hits = F.broadcast(dictionary) if broadcast_eval else dictionary

    toks = corpus.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    # explode_outer keeps zero-gram documents as a single NULL-gram row, so
    # every input document survives the aggregation (count() skips NULLs).
    exploded = toks.select(
        F.col(id_col),
        F.explode_outer(shingles_from_tokens(F.col("_toks"), n)).alias("gram"),
    )
    agg = (
        exploded.join(hits, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("_hit").alias("n_matched"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_matched").cast("double") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        "n_grams",
        "n_matched",
        frac.alias("overlap_frac"),
        F.when(frac >= threshold, 1).otherwise(0).alias("contaminated"),
    )


def bloom_screened_overlap(
    corpus: DataFrame,
    words: DataFrame,
    dictionary: DataFrame,
    n: int = 8,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """:func:`ngram_overlap` with the Bloom word table as the membership
    pre-screen: every DISTINCT document n-gram probes the broadcast bitset
    (``words`` — kilobytes, from sketches.bloom_word_table), and the exact
    dictionary join runs ONLY on the maybe-set. Same columns as
    ngram_overlap over distinct grams: (id, n_grams, n_matched,
    overlap_frac, contaminated).

    The regime this exists for (the ``bloom_prefilter_decontam`` query's
    argument, made an operator): at 100 TB a large eval suite's gram
    dictionary can outgrow comfortable broadcast range while its Bloom
    filter never does — the corpus scan then carries only the bitset, and
    the exact join (broadcast here; shuffle in that regime) receives the
    tiny maybe-set instead of every corpus gram. No false negatives by
    construction, so screened == unscreened exactly; false positives cost
    only wasted probes, never a wrong flag. The ``maybe`` frame feeds both
    the per-doc gram count and the exact join — hot callers should
    checkpoint upstream of this (the streaming admission gate checkpoints
    the gated batch)."""
    toks = corpus.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    # distinct grams as a materialized column (shingles_from_tokens is
    # already array_distinct), exploded once into the probe rows
    probes = toks.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("gram"),
    )
    from .sketches import bloom_maybe_contains

    maybe = bloom_maybe_contains(
        probes, words, "gram", [id_col, "gram"], n_bits, k
    )
    counts = maybe.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    matched = (
        maybe.filter(F.col("bloom_maybe") == 1)
        .join(F.broadcast(dictionary.select("gram")), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    # zero-gram documents produce no probe rows — restore them from the
    # corpus id set so every input doc gets a (0, 0, 0.0, 0) row
    agg = (
        corpus.select(id_col)
        .join(counts, id_col, "left")
        .join(matched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_matched").cast("double") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        "n_grams",
        "n_matched",
        frac.alias("overlap_frac"),
        F.when(frac >= threshold, 1).otherwise(0).alias("contaminated"),
    )
