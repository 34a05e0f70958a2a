"""Sampling / dataset-split / sequence-packing queries — training-data
pipeline operators over the documents table (beyond-reference surface,
operators/sampling.py). All deterministic via md5 hex prefixes, so every
query hash-matches its oracle with zero RNG or float involvement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sampling as SM
from ..operators.dedup import tokens_expr
from .._registry_core import load, register

# Downsample the dominant language, keep the tail — the canonical
# rebalancing move before training-data mixing.
_RATES = {"en": 0.25, "de": 0.6, "fr": 0.6, "es": 0.6}
_DEFAULT_RATE = 0.5  # zh + anything unexpected

_TOKS_SQL = r"list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != '')"


@register(
    "sample_stratified_lang",
    f"""
SELECT doc_id, lang
FROM documents
WHERE {SM.stratified_sample_sql('lang', _RATES, 'doc_id', _DEFAULT_RATE)}
ORDER BY doc_id
""",
)
def sample_stratified_lang(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    kept = SM.stratified_sample(
        docs, "lang", _RATES, key_col="doc_id", default_rate=_DEFAULT_RATE
    )
    return kept.select("doc_id", "lang").orderBy("doc_id")


@register(
    "split_train_val_test",
    f"""
SELECT doc_id, {SM.split_case_sql('doc_id')} AS split
FROM documents
ORDER BY doc_id
""",
)
def split_train_val_test(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = SM.train_val_test_split(docs, key_col="doc_id")
    return out.select("doc_id", "split").orderBy("doc_id")


@register(
    "pack_sequences_bins",
    f"""
WITH toks AS (
  SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens FROM documents
),
sharded AS (
  SELECT doc_id, n_tokens, CAST(doc_id % 32 AS INT) AS shard FROM toks
),
packed AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS tokens_before
  FROM sharded
)
SELECT doc_id, shard, n_tokens, tokens_before // 512 AS bin_id
FROM packed
ORDER BY doc_id
""",
)
def pack_sequences_bins(spark, sf_dir):
    """Sequence packing into 512-token context bins, shard-local (32
    shards): running token sum in doc_id order per shard; integer division
    only, so both engines agree exactly."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_expr("text")).cast("bigint").alias("n_tokens")
    )
    packed = SM.pack_sequences(
        docs, token_col="n_tokens", capacity=512, key_col="doc_id", num_shards=32
    )
    return packed.select("doc_id", "shard", "n_tokens", "bin_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Per-source quota: cap every origin at 20 docs, chosen by deterministic
# md5 order — no single domain dominates the mix.
# ---------------------------------------------------------------------------

@register(
    "quota_per_source",
    """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'quota'), 1, 4),
                    doc_id) AS rk
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rk <= 20
ORDER BY doc_id
""",
)
def quota_per_source(spark, sf_dir):
    """Domain-quota subsample: at most 20 docs per source, md5-ordered
    (reproducible under any partitioning; WindowGroupLimit pre-filters hot
    sources map-side)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return SM.cap_per_key(docs, "source", 20, id_col="doc_id", salt="quota").orderBy(
        "doc_id"
    )


@register(
    "sample_mixture_temperature",
    f"""
WITH kept AS (
{SM.temperature_mixture_sql('documents', 'lang', 'd.doc_id', 0.5)}
),
before AS (
  SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY 1
)
SELECT b.lang, CAST(b.n_before AS BIGINT) AS n_before,
       CAST(COALESCE(COUNT(k.doc_id), 0) AS BIGINT) AS n_after,
       CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS kept_id_sum
FROM before b LEFT JOIN kept k ON k.lang = b.lang
GROUP BY b.lang, b.n_before
ORDER BY b.lang
""",
)
def sample_mixture_temperature(spark, sf_dir):
    """Data-driven alpha=1/2 temperature mixing (operators/sampling.py::
    temperature_mixture): dominant langs downsampled toward a flat
    mixture, total ~= 50% of the corpus; per-lang before/after counts +
    kept-id checksum, all integer-exact."""
    docs = load(spark, sf_dir, "documents")
    kept = SM.temperature_mixture(docs, "lang", key_col="doc_id")
    before = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    after = kept.groupBy("lang").agg(
        F.count("*").alias("n_after"),
        F.sum("doc_id").alias("kept_id_sum"),
    )
    return (
        before.join(after, "lang", "left")
        .select(
            "lang",
            F.col("n_before").cast("long").alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
            F.coalesce(F.col("kept_id_sum"), F.lit(0))
            .cast("long")
            .alias("kept_id_sum"),
        )
        .orderBy("lang")
    )


@register(
    "sample_weighted_pps",
    f"""
WITH kept AS (
{SM.pps_systematic_sample_sql('documents', 'n_chars', 60, 'd.doc_id')}
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, lang
FROM kept
ORDER BY doc_id
""",
)
def sample_weighted_pps(spark, sf_dir):
    """PPS systematic sampling by document length (~60 picks): long docs
    proportionally more likely, pure BIGINT arithmetic end to end, no
    global sort (two-level cumulative construction)."""
    docs = load(spark, sf_dir, "documents")
    kept = SM.pps_systematic_sample(docs, "n_chars", 60, "doc_id")
    return kept.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "lang"
    ).orderBy("doc_id")
