"""Retrieval-surface queries: V2-V4 (all metrics), F1-F3/F6-F9, J1, A2-A4,
X1/X6/X7 — the reference's entire query path (SURVEY.md §2.2-§2.6).

Each registered query has a DuckDB oracle built from the identical operation
sequence (see _sqlutil).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vector as V
from ..operators import knn as K
from .._registry_core import load, register
from ._sqlutil import QUERY_VEC, QUERY_VEC_SQL, clip01_sql, dot_sql, sumsq_sql

K_DEFAULT = 6  # reference config.py:28 (contexts)
THRESHOLD_DEFAULT = 0.4  # reference config.py:29 (similarity)
# The fixture vectors are random (max cosine ~0.34 at sf0.01), so the
# registered pipeline query uses a reachable threshold; tests cover the
# reference default separately.
THRESHOLD_FIXTURE = 0.15


# ---------------------------------------------------------------------------
# V2 + V3 + V4: brute-force k-NN with per-metric similarity conversion
# (vector_db_query.py:158-202). One query per metric incl. the unknown-metric
# fallback branch.
# ---------------------------------------------------------------------------

def _knn_oracle(metric: str, k: int = K_DEFAULT) -> str:
    if metric == "cosine":
        d = f"1.0 - {dot_sql('embedding')}"
        order = "ASC"
        sim = clip01_sql("1.0 - distance")
    elif metric == "l2":
        d = f"sqrt({sumsq_sql('embedding')})"
        order = "ASC"
        sim = clip01_sql(
            "CASE WHEN max(distance) OVER () > 0.0 "
            "THEN 1.0 - distance / max(distance) OVER () ELSE 1.0 END"
        )
    elif metric == "sum_of_squares":
        d = sumsq_sql("embedding")
        order = "ASC"
        sim = clip01_sql(
            "CASE WHEN max(distance) OVER () > 0.0 "
            "THEN 1.0 - distance / max(distance) OVER () ELSE 1.0 END"
        )
    elif metric == "inner_product":
        d = dot_sql("embedding")
        order = "DESC"
        sim = (
            "CASE WHEN max(distance) OVER () > min(distance) OVER () "
            "THEN (distance - min(distance) OVER ()) "
            "/ (max(distance) OVER () - min(distance) OVER ()) ELSE 1.0 END"
        )
    else:  # unknown-metric fallback: cosine distance, 1 - d^2/2 conversion
        d = f"1.0 - {dot_sql('embedding')}"
        order = "ASC"
        sim = clip01_sql("1.0 - (distance * distance) / 2.0")
    return f"""
WITH scored AS (
  SELECT vec_id, {d} AS distance FROM embeddings
), topk AS (
  SELECT * FROM scored ORDER BY distance {order}, vec_id ASC LIMIT {k}
)
SELECT vec_id, distance, {sim} AS similarity
FROM topk
ORDER BY similarity DESC, vec_id ASC
"""


def _make_knn_query(metric: str):
    def q(spark, sf_dir):
        return K.knn(load(spark, sf_dir, "embeddings"), QUERY_VEC,
                     k=K_DEFAULT, metric=metric)

    return q


for _metric in ("cosine", "l2", "sum_of_squares", "inner_product", "unknown"):
    register(f"knn_{_metric}_topk", _knn_oracle(_metric))(_make_knn_query(_metric))


# ---------------------------------------------------------------------------
# Full retrieval pipeline: V2-V4 + F1 threshold + J1 lookup join + F2 keyword
# (vector_db_query.py:136-267). Flagship query — also what entry() runs.
# ---------------------------------------------------------------------------

@register(
    "search_pipeline",
    f"""
WITH scored AS (
  SELECT vec_id, 1.0 - {dot_sql('embedding')} AS distance FROM embeddings
), topk AS (
  SELECT * FROM scored ORDER BY distance ASC, vec_id ASC LIMIT 20
), conv AS (
  SELECT vec_id, distance,
         {clip01_sql('1.0 - distance')} AS similarity
  FROM topk
), hits AS (
  SELECT * FROM conv WHERE similarity >= {THRESHOLD_FIXTURE}
)
SELECT d.doc_id, d.source, d.lang, d.text, h.distance, h.similarity
FROM hits h JOIN documents d ON d.doc_id = h.vec_id
WHERE contains(lower(d.text), 'data')
ORDER BY h.similarity DESC, d.doc_id ASC
""",
)
def search_pipeline(spark, sf_dir):
    res = K.search(
        load(spark, sf_dir, "embeddings"),
        load(spark, sf_dir, "documents"),
        QUERY_VEC,
        k=20,
        score_threshold=THRESHOLD_FIXTURE,
        search_term="data",
    )
    return res.select("doc_id", "source", "lang", "text", "distance", "similarity")


def flagship(spark, sf_dir):
    """entry()'s query: the full search pipeline at the given scale."""
    return search_pipeline(spark, sf_dir)


# ---------------------------------------------------------------------------
# F1: similarity threshold filter over the whole corpus (no top-k) —
# vector_db_query.py:206-213 isolated.
# ---------------------------------------------------------------------------

@register(
    "filter_threshold",
    f"""
SELECT vec_id,
       {clip01_sql(f"1.0 - (1.0 - {dot_sql('embedding')})")} AS similarity
FROM embeddings
WHERE {clip01_sql(f"1.0 - (1.0 - {dot_sql('embedding')})")} >= 0.1
ORDER BY similarity DESC, vec_id ASC
""",
)
def filter_threshold(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    sim = V.clip01(F.lit(1.0) - V.cosine_distance("embedding", QUERY_VEC))
    return (
        emb.select("vec_id", sim.alias("similarity"))
        .filter(F.col("similarity") >= 0.1)
        .orderBy(F.col("similarity").desc(), F.col("vec_id").asc())
    )


# ---------------------------------------------------------------------------
# F2: case-insensitive keyword containment (vector_db_query.py:247-254).
# ---------------------------------------------------------------------------

@register(
    "filter_keyword",
    """
SELECT doc_id, source, text
FROM documents
WHERE contains(lower(text), lower('MERGE'))
ORDER BY doc_id
""",
)
def filter_keyword(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.contains(F.lower("text"), F.lower(F.lit("MERGE"))))
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# F3: document-type equality filter (vector_db_query.py:256-261). The fixture
# has no document_type column (FIXTURES.md §1), so the engine derives one the
# same way on both sides, then filters — exercising derive + equality filter.
# ---------------------------------------------------------------------------

_DOCTYPE_SQL = (
    "CASE doc_id % 4 WHEN 0 THEN 'document' WHEN 1 THEN 'image' "
    "WHEN 2 THEN 'audio' ELSE '' END"
)


@register(
    "filter_doctype",
    f"""
SELECT doc_id, source, {_DOCTYPE_SQL} AS document_type
FROM documents
WHERE {_DOCTYPE_SQL} = 'document'
ORDER BY doc_id
""",
)
def filter_doctype(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    doctype = (
        F.when(F.col("doc_id") % 4 == 0, "document")
        .when(F.col("doc_id") % 4 == 1, "image")
        .when(F.col("doc_id") % 4 == 2, "audio")
        .otherwise("")
    )
    return (
        docs.withColumn("document_type", doctype)
        .filter(F.col("document_type") == "document")
        .select("doc_id", "source", "document_type")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# F7 + F8 + F9: text repair / non-printable strip / whitespace normalization
# (embedding_models.py:36-51, vector_db_creator.py:108-116,
# vector_db_query.py:62-63).
# ---------------------------------------------------------------------------

@register(
    "clean_text",
    r"""
SELECT doc_id,
       coalesce(nullif(trim(regexp_replace(text, '[^\x20-\x7E\n\t]', '', 'g')), ''), ' ')
         AS clean_text,
       length(coalesce(nullif(trim(regexp_replace(text, '[^\x20-\x7E\n\t]', '', 'g')), ''), ' '))
         AS clean_len
FROM documents
ORDER BY doc_id
""",
)
def clean_text(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    stripped = F.regexp_replace("text", r"[^\x20-\x7E\n\t]", "")
    cleaned = F.coalesce(F.nullif(F.trim(stripped), F.lit("")), F.lit(" "))
    return (
        docs.select(
            "doc_id",
            cleaned.alias("clean_text"),
            F.length(cleaned).alias("clean_len"),
        ).orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# A2: citation group-aggregation (utilities.py:25-40): per file, min/max
# similarity, hit count, sorted distinct pdf pages.
# A3: gaps-and-islands page-range compaction (utilities.py:42-56) -> "3-5, 9".
# Hits are the top-50 cosine matches joined to documents with derived
# file_type/page_number (fixtures carry no pages; derivation is mirrored in
# the oracle).
# ---------------------------------------------------------------------------

_HITS_SQL = f"""
  SELECT h.vec_id, h.similarity, d.source AS file_path,
         CASE WHEN d.doc_id % 2 = 0 THEN '.pdf' ELSE '.txt' END AS file_type,
         CAST(d.doc_id % 12 + 1 AS INT) AS page_number
  FROM (
    SELECT vec_id, {clip01_sql(f"1.0 - (1.0 - {dot_sql('embedding')})")} AS similarity
    FROM embeddings ORDER BY similarity DESC, vec_id ASC LIMIT 50
  ) h JOIN documents d ON d.doc_id = h.vec_id
"""


def _hits_df(spark, sf_dir, k: int = 50):
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    sim = V.clip01(F.lit(1.0) - V.cosine_distance("embedding", QUERY_VEC))
    topk = (
        emb.select("vec_id", sim.alias("similarity"))
        .orderBy(F.col("similarity").desc(), F.col("vec_id").asc())
        .limit(k)
    )
    return (
        docs.join(F.broadcast(topk), docs["doc_id"] == topk["vec_id"])
        .select(
            "vec_id",
            "similarity",
            F.col("source").alias("file_path"),
            F.when(F.col("doc_id") % 2 == 0, ".pdf").otherwise(".txt").alias("file_type"),
            (F.col("doc_id") % 12 + 1).cast("int").alias("page_number"),
        )
    )


@register(
    "citations_agg",
    f"""
WITH hits AS ({_HITS_SQL})
SELECT file_path,
       min(similarity) AS min_score,
       max(similarity) AS max_score,
       count(*) AS n_hits,
       arg_max(file_type, vec_id) AS file_type,
       CASE WHEN arg_max(file_type, vec_id) = '.pdf'
            THEN array_to_string(list_sort(list_distinct(list(page_number))), ',')
            ELSE '' END AS pages
FROM hits
GROUP BY file_path
ORDER BY file_path
""",
)
def citations_agg(spark, sf_dir):
    # Parity notes: pages is emitted as a ','-joined STRING (never an array —
    # the driver's canonicalizer cannot sort list columns), and file_type is
    # picked with max_by(file_type, vec_id) / arg_max (first() is
    # shuffle-order-dependent on both engines).
    hits = _hits_df(spark, sf_dir)
    file_type = F.max_by("file_type", "vec_id")
    pages = F.when(
        file_type == ".pdf",
        F.array_join(F.array_sort(F.array_distinct(F.collect_list("page_number"))), ","),
    ).otherwise(F.lit(""))
    return (
        hits.groupBy("file_path")
        .agg(
            F.min("similarity").alias("min_score"),
            F.max("similarity").alias("max_score"),
            F.count(F.lit(1)).alias("n_hits"),
            file_type.alias("file_type"),
            pages.alias("pages"),
        )
        .orderBy("file_path")
    )


@register(
    "page_ranges",
    f"""
WITH hits AS ({_HITS_SQL}),
pages AS (
  SELECT DISTINCT file_path, page_number
  FROM hits WHERE file_type = '.pdf'
),
islands AS (
  SELECT file_path, page_number,
         page_number - row_number() OVER (PARTITION BY file_path ORDER BY page_number)
           AS island
  FROM pages
),
ranges AS (
  SELECT file_path, min(page_number) AS range_start, max(page_number) AS range_end
  FROM islands GROUP BY file_path, island
)
SELECT file_path,
       string_agg(
         CASE WHEN range_start = range_end THEN CAST(range_start AS VARCHAR)
              ELSE CAST(range_start AS VARCHAR) || '-' || CAST(range_end AS VARCHAR) END,
         ', ' ORDER BY range_start) AS page_ranges
FROM ranges
GROUP BY file_path
ORDER BY file_path
""",
)
def page_ranges(spark, sf_dir):
    hits = _hits_df(spark, sf_dir)
    pages = hits.filter(F.col("file_type") == ".pdf").select("file_path", "page_number").distinct()
    w = Window.partitionBy("file_path").orderBy("page_number")
    islands = pages.withColumn("island", F.col("page_number") - F.row_number().over(w))
    ranges = islands.groupBy("file_path", "island").agg(
        F.min("page_number").alias("range_start"),
        F.max("page_number").alias("range_end"),
    )
    label = F.when(
        F.col("range_start") == F.col("range_end"),
        F.col("range_start").cast("string"),
    ).otherwise(
        F.concat_ws("-", F.col("range_start").cast("string"), F.col("range_end").cast("string"))
    )
    return (
        ranges.select("file_path", F.struct("range_start", label.alias("label")).alias("r"))
        .groupBy("file_path")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("r")), lambda s: s["label"]),
                ", ",
            ).alias("page_ranges")
        )
        .orderBy("file_path")
    )


# ---------------------------------------------------------------------------
# X1: sha256 content hash (document_processor.py:42-43);
# X6: lower-case compare; exact-dup detection input.
# ---------------------------------------------------------------------------

@register(
    "hash_sha256",
    """
SELECT doc_id, sha256(text) AS text_sha256, md5(text) AS text_md5
FROM documents
ORDER BY doc_id
""",
)
def hash_sha256(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha256"),
        F.md5("text").alias("text_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X7: JSON encode/decode of metadata (vector_db_creator.py:167-169 /
# vector_db_query.py:235) over the events.props JSON column.
# ---------------------------------------------------------------------------

@register(
    "json_props_extract",
    """
SELECT COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10, -1) AS k_bucket,
       count(*) AS n,
       CAST(COALESCE(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)), 0) AS BIGINT) AS k_sum
FROM events
GROUP BY 1
ORDER BY k_bucket
""",
)
def json_props_extract(spark, sf_dir):
    # Parity note: rows whose props lack $.k form a NULL group — Spark sorts
    # NULLS FIRST, DuckDB NULLS LAST, and nullable ints hash as object dtype,
    # so both the bucket and the sum are coalesced to sentinels on BOTH sides.
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.groupBy(F.coalesce(k % 10, F.lit(-1)).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(k), F.lit(0)).alias("k_sum"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# L3 citation HTML, oracle-checked: the REAL rag.format_citations runs in a
# grouped Pandas stage over the retrieval hits (rows pre-sorted by
# (file_name, vec_id) so the group's first-row file_type and the stable
# min-score ordering are deterministic); the oracle rebuilds the exact HTML
# with printf('%.3f') score spans and gaps-and-islands page ranges.
# ---------------------------------------------------------------------------

@register(
    "rag_citations_html",
    f"""
WITH hits AS ({_HITS_SQL}),
grouped AS (
  SELECT file_path AS file_name,
         min(similarity) AS min_s,
         max(similarity) AS max_s,
         arg_min(file_type, vec_id) AS ftype
  FROM hits GROUP BY file_path
),
pages AS (
  SELECT DISTINCT h.file_path AS file_name, h.page_number
  FROM hits h JOIN grouped g ON g.file_name = h.file_path
  WHERE g.ftype = '.pdf'
),
islands AS (
  SELECT file_name, page_number,
         page_number - row_number() OVER (PARTITION BY file_name
                                          ORDER BY page_number) AS island
  FROM pages
),
ranges AS (
  SELECT file_name, min(page_number) AS s, max(page_number) AS e
  FROM islands GROUP BY file_name, island
),
prange AS (
  SELECT file_name,
         string_agg(CASE WHEN s = e THEN CAST(s AS VARCHAR)
                         ELSE CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR) END,
                    ', ' ORDER BY s) AS pr
  FROM ranges GROUP BY file_name
)
SELECT '<ol>' || string_agg(
         '<li>' || g.file_name || ' (score ' || printf('%.3f', g.min_s) || '-'
           || printf('%.3f', g.max_s) || ')'
           || CASE WHEN p.pr IS NOT NULL THEN ' p.' || p.pr ELSE '' END
           || '</li>',
         '' ORDER BY g.min_s ASC, g.file_name ASC) || '</ol>' AS citations_html,
       count(*) AS n_files
FROM grouped g LEFT JOIN prange p ON p.file_name = g.file_name
HAVING count(*) > 0
""",
)
def rag_citations_html(spark, sf_dir):
    import pandas as pd

    from ..rag import format_citations

    hits = _hits_df(spark, sf_dir).select(
        F.col("file_path").alias("file_name"),
        "similarity",
        "file_type",
        "page_number",
        "vec_id",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["file_name", "vec_id"])
        html = format_citations(pdf.to_dict("records"))
        return pd.DataFrame(
            {"citations_html": [html], "n_files": [pdf["file_name"].nunique()]}
        )

    return (
        hits.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(build, "citations_html string, n_files bigint")
        .select("citations_html", "n_files")
    )
