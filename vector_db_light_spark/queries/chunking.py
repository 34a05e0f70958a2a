"""Chunking queries: X8 fixed-stride, X5+overlap PDF chunker with page
attribution, A1 per-file chunk counts (SURVEY.md §2.1/§2.4/§2.6).

The fixture documents carry no ``[[pageN]]`` markers, so the overlap query
injects them deterministically (identically on both sides) and then *parses*
them back — exercising the real marker-extraction path
(document_processor.py:248-292), not assumed positions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import chunking as C
from .._registry_core import load_docs, register

CHUNK_SIZE = 120  # scaled to the ~300-char fixture docs (reference: 1200)
OV_SIZE, OV_OVERLAP = 150, 50  # step 100 (reference: 1200/600 -> step 600)


# ---------------------------------------------------------------------------
# X8: fixed-stride chunker (document_processor.py:78-92).
# ---------------------------------------------------------------------------

@register(
    "chunk_fixed_stride",
    f"""
WITH offs AS (
  SELECT doc_id, text, unnest(range(0, length(text), {CHUNK_SIZE})) AS chunk_offset
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       doc_id * {C.ID_STRIDE} + chunk_offset AS chunk_id,
       chunk_offset,
       regexp_replace(regexp_replace(substr(text, chunk_offset + 1, {CHUNK_SIZE}), '^\s+', ''), '\s+$', '') AS chunk_text
FROM offs
WHERE regexp_replace(regexp_replace(substr(text, chunk_offset + 1, {CHUNK_SIZE}), '^\s+', ''), '\s+$', '') != ''
ORDER BY chunk_id
""",
)
def chunk_fixed_stride(spark, sf_dir):
    docs = load_docs(spark, sf_dir)
    out = C.chunk_fixed(docs, CHUNK_SIZE)
    return out.select(
        "doc_id",
        "chunk_id",
        F.col("chunk_offset").cast("bigint").alias("chunk_offset"),
        "chunk_text",
    ).orderBy("chunk_id")


# ---------------------------------------------------------------------------
# X5 + overlap chunker: [[pageN]] markers parsed from the text, sliding
# window with step = size - overlap, page = last marker at-or-before chunk
# start (document_processor.py:248-292).
# ---------------------------------------------------------------------------

_MARKED_SQL = (
    "'[[page1]]' || substr(text, 1, 120) || "
    "'[[page2]]' || substr(text, 121, 120) || "
    "'[[page3]]' || substr(text, 241)"
)


def _marked_docs(spark, sf_dir):
    docs = load_docs(spark, sf_dir)
    marked = F.concat(
        F.lit("[[page1]]"), F.substring("text", 1, 120),
        F.lit("[[page2]]"), F.substring("text", 121, 120),
        F.lit("[[page3]]"), F.substring("text", 241, 2_000_000_000),
    )
    return docs.select("doc_id", marked.alias("text"))


@register(
    "chunk_overlap_pages",
    rf"""
WITH marked AS (
  SELECT doc_id, {_MARKED_SQL} AS text FROM documents
),
parsed AS (
  SELECT doc_id,
         regexp_extract_all(text, '\[\[page(\d+)\]\]', 1) AS pages,
         string_split_regex(text, '\[\[page\d+\]\]') AS segs,
         regexp_replace(text, '\[\[page\d+\]\]', '', 'g') AS clean
  FROM marked
),
markers AS (
  SELECT doc_id,
         CAST(pages[i] AS INT) AS page_number,
         i - 1 AS marker_idx,
         list_reduce(list_transform(segs[1:i], s -> length(s)), (a, b) -> a + b)
           AS clean_pos
  FROM parsed, unnest(range(1, len(pages) + 1)) AS t(i)
),
chunks AS (
  SELECT doc_id, chunk_offset,
         regexp_replace(regexp_replace(substr(clean, chunk_offset + 1, {OV_SIZE}), '^\s+', ''), '\s+$', '') AS chunk_text
  FROM (
    SELECT doc_id, clean,
           unnest(range(0, length(clean), {OV_SIZE - OV_OVERLAP})) AS chunk_offset
    FROM parsed WHERE length(clean) > 0
  )
  WHERE regexp_replace(regexp_replace(substr(clean, chunk_offset + 1, {OV_SIZE}), '^\s+', ''), '\s+$', '') != ''
)
SELECT c.doc_id,
       c.doc_id * {C.ID_STRIDE} + c.chunk_offset AS chunk_id,
       c.chunk_offset,
       max_by(m.page_number, m.marker_idx) AS page_number,
       c.chunk_text
FROM chunks c
JOIN markers m ON m.doc_id = c.doc_id AND m.clean_pos <= c.chunk_offset
GROUP BY c.doc_id, c.chunk_offset, c.chunk_text
ORDER BY chunk_id
""",
)
def chunk_overlap_pages(spark, sf_dir):
    out = C.chunk_overlap_with_pages(
        _marked_docs(spark, sf_dir), chunk_size=OV_SIZE, chunk_overlap=OV_OVERLAP
    )
    return out.select(
        "doc_id",
        "chunk_id",
        F.col("chunk_offset").cast("bigint").alias("chunk_offset"),
        "page_number",
        "chunk_text",
    ).orderBy("chunk_id")


# ---------------------------------------------------------------------------
# A1: per-file chunk counts keyed by content hash
# (vector_db_creator.py:94-98: chunk_counters[file_hash] += 1).
# ---------------------------------------------------------------------------

@register(
    "chunk_count_per_doc",
    f"""
WITH chunks AS (
  SELECT doc_id, sha256(text) AS doc_hash,
         unnest(range(0, length(text), {CHUNK_SIZE})) AS chunk_offset, text
  FROM documents WHERE length(text) > 0
)
SELECT doc_hash, count(*) AS n_chunks
FROM chunks
WHERE regexp_replace(regexp_replace(substr(text, chunk_offset + 1, {CHUNK_SIZE}), '^\s+', ''), '\s+$', '') != ''
GROUP BY doc_hash
ORDER BY doc_hash
""",
)
def chunk_count_per_doc(spark, sf_dir):
    docs = load_docs(spark, sf_dir)
    chunks = C.chunk_fixed(docs, CHUNK_SIZE)
    hashes = docs.select("doc_id", F.sha2("text", 256).alias("doc_hash"))
    return (
        chunks.join(hashes, "doc_id")
        .groupBy("doc_hash")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .orderBy("doc_hash")
    )
