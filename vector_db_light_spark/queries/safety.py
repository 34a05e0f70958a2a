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
from ..registry import load_docs, register
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
