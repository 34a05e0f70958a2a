"""Data-hygiene queries: benchmark decontamination and PII scrubbing.

Beyond-reference training-data-pipeline surface. The PII query injects
deterministic synthetic PII into the fixture text (the synthetic corpus
contains none) — the injection expression is mirrored verbatim in the
oracle, so detection/redaction is exercised on non-trivial counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.decontam import ngram_overlap
from ..operators.pii import scrub
from .._registry_core import load_docs, register
from .dedup import _CORPUS_SQL, _corpus

# ---------------------------------------------------------------------------
# Benchmark decontamination: 8-gram overlap of a dup-injected corpus against
# an md5-banded "benchmark" slice of the base documents. The exact/near
# copies of benchmark docs are the contaminated set the filter must find.
# ---------------------------------------------------------------------------

_NGRAM8_SQL = r"""
    CASE WHEN len(toks) >= 8
         THEN list_transform(range(1, len(toks) - 6),
                             i -> array_to_string(toks[i:i+7], ' '))
         ELSE []::VARCHAR[] END
"""


@register(
    "decontaminate_ngram",
    f"""
WITH mut AS ({_CORPUS_SQL}),
eval_docs AS (
  SELECT doc_id, text FROM documents WHERE substr(md5(text), 1, 1) = '0'
),
corpus AS (
  SELECT doc_id, text FROM mut
  WHERE doc_id NOT IN (SELECT doc_id FROM eval_docs)
),
ctoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t != '') AS toks
  FROM corpus
),
cgrams AS (
  SELECT doc_id, unnest(list_distinct({_NGRAM8_SQL})) AS gram FROM ctoks
),
etoks AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t != '') AS toks
  FROM eval_docs
),
egrams AS (
  SELECT DISTINCT unnest({_NGRAM8_SQL}) AS gram FROM etoks
),
agg AS (
  SELECT g.doc_id, count(*) AS n_grams, count(e.gram) AS n_matched
  FROM cgrams g LEFT JOIN egrams e ON e.gram = g.gram
  GROUP BY 1
),
final AS (
  SELECT c.doc_id,
         coalesce(a.n_grams, 0) AS n_grams,
         coalesce(a.n_matched, 0) AS n_matched
  FROM (SELECT doc_id FROM corpus) c
  LEFT JOIN agg a ON a.doc_id = c.doc_id
)
SELECT doc_id, n_grams, n_matched,
       CASE WHEN n_grams > 0 THEN n_matched::DOUBLE / n_grams
            ELSE 0.0 END AS overlap_frac,
       CASE WHEN n_grams > 0
                 AND n_matched::DOUBLE / n_grams >= '0.05'::DOUBLE
            THEN 1 ELSE 0 END AS contaminated
FROM final
ORDER BY doc_id
""",
)
def decontaminate_ngram(spark, sf_dir):
    """8-gram eval-set overlap per corpus doc; the corpus is the dedup
    fixtures' dup-injected variant minus the benchmark slice, so the
    injected copies of benchmark docs are the expected contamination."""
    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    eval_docs = docs.filter(F.substring(F.md5("text"), 1, 1) == "0")
    corpus = _corpus(spark, sf_dir).join(
        F.broadcast(eval_docs.select("doc_id")), "doc_id", "left_anti"
    )
    return ngram_overlap(corpus, eval_docs, n=8, threshold=0.05).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII scrub: detect + redact emails / SSNs / phones / IPv4s.
# ---------------------------------------------------------------------------

_INJECT_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' call 555-867-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ssn 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS text
  FROM documents
"""


def _injected(spark, sf_dir):
    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    did = F.col("doc_id")

    def _piece(mod, expr):
        return F.when(did % mod == 0, expr).otherwise(F.lit(""))

    pad4 = F.lpad((did % 10000).cast("string"), 4, "0")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            _piece(2, F.concat(F.lit(" contact user"), did.cast("string"),
                               F.lit("@example.com"))),
            _piece(3, F.concat(F.lit(" call 555-867-"), pad4)),
            _piece(5, F.concat(F.lit(" from 192.168."),
                               (did % 256).cast("string"), F.lit("."),
                               (did % 100).cast("string"))),
            _piece(7, F.concat(F.lit(" ssn 123-45-"), pad4)),
        ).alias("text"),
    )


@register(
    "pii_scrub",
    f"""
WITH injected AS ({_INJECT_SQL})
SELECT doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
       len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS n_ssn,
       len(regexp_extract_all(text,
           '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b')) AS n_phone,
       len(regexp_extract_all(text,
           '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b')) AS n_ipv4,
       CASE WHEN len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
               + len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b'))
               + len(regexp_extract_all(text,
                     '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b'))
               + len(regexp_extract_all(text,
                     '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b')) > 0
            THEN 1 ELSE 0 END AS has_pii,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>',
               'g'),
             '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
           '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b', '<PHONE>', 'g'),
         '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b', '<IP>', 'g') AS redacted
FROM injected
ORDER BY doc_id
""",
)
def pii_scrub(spark, sf_dir):
    """Detect + redact synthetic PII injected into the fixture text; counts
    per kind, a has_pii flag, and the redacted text (patterns applied in
    PII_PATTERNS order on both engines)."""
    return scrub(_injected(spark, sf_dir)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination pre-filter: the eval-set gram dictionary
# compressed into a 64 Kbit / 2048-word broadcast bitset. bloom_matched is
# pinned >= exact_matched per doc (no false negatives — the property that
# makes a Bloom pre-screen SAFE: only maybe-hits need the exact join).
# ---------------------------------------------------------------------------

_BLOOM_BITS, _BLOOM_K = 65536, 4
_BLOOM_J_SQL = "unnest([" + ", ".join(str(j) for j in range(_BLOOM_K)) + "]) AS t(j)"
_BLOOM_POS_SQL = (
    "('0x' || substr(md5(gram || '#b' || j::VARCHAR), 1, 12))::BIGINT"
    f" % {_BLOOM_BITS}"
)


@register(
    "bloom_prefilter_decontam",
    f"""
WITH mut AS ({_CORPUS_SQL}),
eval_docs AS (
  SELECT doc_id, text FROM documents WHERE substr(md5(text), 1, 1) = '0'
),
corpus AS (
  SELECT doc_id, text FROM mut
  WHERE doc_id NOT IN (SELECT doc_id FROM eval_docs)
),
etoks AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t != '') AS toks
  FROM eval_docs
),
egrams AS (
  SELECT DISTINCT unnest({_NGRAM8_SQL}) AS gram FROM etoks
),
epos AS (
  SELECT {_BLOOM_POS_SQL} AS pos FROM egrams, {_BLOOM_J_SQL}
),
words AS (
  SELECT pos // 32 AS word_idx,
         bit_or(1::BIGINT << ((pos % 32)::INTEGER)) AS word
  FROM epos GROUP BY 1
),
ctoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t != '') AS toks
  FROM corpus
),
cgrams AS (
  SELECT doc_id, unnest(list_distinct({_NGRAM8_SQL})) AS gram FROM ctoks
),
cpos AS (
  SELECT doc_id, gram, {_BLOOM_POS_SQL} AS pos FROM cgrams, {_BLOOM_J_SQL}
),
probed AS (
  SELECT c.doc_id, c.gram,
         min(((coalesce(w.word, 0) >> ((c.pos % 32)::INTEGER)) & 1)::INTEGER)
           AS maybe
  FROM cpos c LEFT JOIN words w ON w.word_idx = c.pos // 32
  GROUP BY 1, 2
),
ex AS (
  SELECT g.doc_id, count(*) AS n_grams, count(e.gram) AS exact_matched
  FROM cgrams g LEFT JOIN egrams e ON e.gram = g.gram
  GROUP BY 1
),
bm AS (
  SELECT doc_id, CAST(sum(maybe) AS BIGINT) AS bloom_matched
  FROM probed GROUP BY 1
)
SELECT ex.doc_id, CAST(ex.n_grams AS BIGINT) AS n_grams,
       CAST(ex.exact_matched AS BIGINT) AS exact_matched,
       bm.bloom_matched,
       bm.bloom_matched >= ex.exact_matched AS no_false_negative
FROM ex JOIN bm ON bm.doc_id = ex.doc_id
ORDER BY ex.doc_id
""",
)
def bloom_prefilter_decontam(spark, sf_dir):
    """Same corpus/eval split as decontaminate_ngram, but the membership
    test is a 2048-word broadcast Bloom bitset instead of the gram
    dictionary itself. At 100 TB the dictionary of a large eval suite can
    outgrow comfortable broadcast range while its Bloom filter never does
    (64 Kbit here; size m/n ~ 16 bits/key keeps fp ~ 0.2% at k=4) — the
    exact join then runs only on the maybe-set. Docs with zero 8-grams
    carry no membership question and are omitted."""
    from ..operators import sketches as SK
    from ..operators.decontam import eval_gram_dictionary
    from ..operators.dedup import shingles_from_tokens, tokens_expr

    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    eval_docs = docs.filter(F.substring(F.md5("text"), 1, 1) == "0")
    corpus = _corpus(spark, sf_dir).join(
        F.broadcast(eval_docs.select("doc_id")), "doc_id", "left_anti"
    )
    egrams = eval_gram_dictionary(eval_docs, 8)
    words = SK.bloom_word_table(egrams, "gram", _BLOOM_BITS, _BLOOM_K)
    ctoks = corpus.select("doc_id", tokens_expr("text").alias("_toks"))
    cgrams = ctoks.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("_toks"), 8)).alias("gram"),
    )
    maybe = SK.bloom_maybe_contains(
        cgrams, words, "gram", ["doc_id", "gram"], _BLOOM_BITS, _BLOOM_K
    )
    ex = (
        cgrams.join(F.broadcast(egrams.withColumn("_hit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count("_hit").cast("bigint").alias("exact_matched"),
        )
    )
    bm = maybe.groupBy("doc_id").agg(
        F.sum("bloom_maybe").cast("bigint").alias("bloom_matched")
    )
    return (
        ex.join(bm, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "exact_matched",
            "bloom_matched",
            (F.col("bloom_matched") >= F.col("exact_matched")).alias(
                "no_false_negative"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Luhn-validated credit-card detection (operators/pii.cc_detection): the
# candidate regex alone false-positives on any 16-digit id; the ISO 7812
# checksum — an unrolled pure-integer expression usable inside
# higher-order lambdas on both engines — separates real card numbers.
# Fixture: docs get a VALID card appended for doc_id%10==0 and an
# off-by-one INVALID candidate for doc_id%10==5.
# ---------------------------------------------------------------------------

_CC_VALID = "4532-0151-1283-0366"    # Luhn-valid (check digit computed)
_CC_INVALID = "4532-0151-1283-0367"  # same prefix, broken check digit

# DuckDB lambdas forbid subqueries, so the digit source inlines per term
_D = "replace(x, '-', '')"
_LUHN_SQL_TERMS = " + ".join(
    (
        f"(CASE WHEN 2 * (substr({_D}, {j}, 1)::INT) > 9 "
        f"THEN 2 * (substr({_D}, {j}, 1)::INT) - 9 "
        f"ELSE 2 * (substr({_D}, {j}, 1)::INT) END)"
        if j % 2 == 1
        else f"(substr({_D}, {j}, 1)::INT)"
    )
    for j in range(1, 17)
)
_LUHN_SQL = "x -> (" + _LUHN_SQL_TERMS + ") % 10 = 0"


@register(
    "cc_luhn_detection",
    f"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 10 = 0 THEN ' pay: {_CC_VALID}'
                      WHEN doc_id % 10 = 5 THEN ' ref: {_CC_INVALID}'
                      ELSE '' END AS text
  FROM documents
),
hits AS (
  SELECT doc_id,
         regexp_extract_all(text, '\\b\\d{{4}}-\\d{{4}}-\\d{{4}}-\\d{{4}}\\b')
           AS cands
  FROM corpus
)
SELECT doc_id,
       CAST(len(cands) AS BIGINT) AS n_cc_candidates,
       CAST(len(list_filter(cands, {_LUHN_SQL})) AS BIGINT) AS n_cc_valid
FROM hits
WHERE len(cands) > 0
ORDER BY doc_id
""",
)
def cc_luhn_detection(spark, sf_dir):
    """Candidates vs Luhn-valid card counts per doc over the injected
    corpus — the scrub decision a pipeline makes before redacting (valid
    cards redact; random 16-digit ids survive). Narrow no-shuffle map."""
    from ..operators.pii import cc_detection

    docs = load_docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 10 == 0, f" pay: {_CC_VALID}")
            .when(F.col("doc_id") % 10 == 5, f" ref: {_CC_INVALID}")
            .otherwise(""),
        ).alias("text"),
    )
    d = cc_detection("text")
    return (
        docs.select(
            "doc_id",
            d["n_cc_candidates"].cast("long").alias("n_cc_candidates"),
            d["n_cc_valid"].cast("long").alias("n_cc_valid"),
        )
        .filter(F.col("n_cc_candidates") > 0)
        .orderBy("doc_id")
    )
