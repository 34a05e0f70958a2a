"""Document chunking as pure Catalyst expressions (no Python UDFs).

Reference semantics:
  * ``FixedSizeTextSplitter`` (``/root/reference/document_processor.py:78-92``):
    non-overlapping ``chunk_size``-char slices, each ``.strip()``-ed, empty
    slices dropped.
  * ``add_pymupdf_page_metadata`` (``document_processor.py:248-292``): strip
    ``[[pageN]]`` markers, slide a ``chunk_size`` window with step
    ``chunk_size - chunk_overlap`` over the clean text, attribute each chunk
    to the last marker at-or-before its start, drop empty chunks and chunks
    before the first marker.

Spark shape: ``sequence -> transform -> posexplode`` keeps chunking inside
whole-stage codegen; one doc row fans out to its chunks with zero shuffles.
At 100 TB this is embarrassingly parallel — the only data movement is the
scan itself.

Chunk ids are deterministic ``doc_id * ID_STRIDE + chunk_offset`` instead of
the reference's collision-unsafe ``random.randint(0, 2^64-1)``
(``vector_db_creator.py:79,99`` — SURVEY.md §7 hard-part #2): reproducible,
63-bit-safe, and join-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ID_STRIDE = 1_000_000  # max supported clean-text length per document

PAGE_MARKER_RE = r"\[\[page(\d+)\]\]"


def strip_ws(col: Column) -> Column:
    """Python ``str.strip()`` parity for ASCII whitespace. SQL ``trim`` only
    removes spaces, but the reference strips \\n and \\t too
    (document_processor.py:88 ``piece.strip()``) — found by hypothesis."""
    return F.regexp_replace(F.regexp_replace(col, r"^\s+", ""), r"\s+$", "")


def chunk_fixed(
    docs: DataFrame,
    chunk_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FixedSizeTextSplitter parity: returns
    ``(doc_id, chunk_id, chunk_offset, chunk_text)``.

    ``chunk_offset`` is the 0-based char offset of the slice in the original
    text (stable provenance; the reference keeps no such lineage).
    """
    nonempty = docs.filter(F.length(text_col) > 0)
    offsets = F.sequence(
        F.lit(0), F.length(text_col) - F.lit(1), F.lit(int(chunk_size))
    )
    exploded = nonempty.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(offsets).alias("chunk_offset"),
    )
    piece = strip_ws(F.substring(F.col(text_col), F.col("chunk_offset") + 1, int(chunk_size)))
    return (
        exploded.select(
            F.col(id_col),
            (F.col(id_col) * ID_STRIDE + F.col("chunk_offset")).alias("chunk_id"),
            F.col("chunk_offset"),
            piece.alias("chunk_text"),
        )
        .filter(F.col("chunk_text") != "")
    )


def page_markers(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Parse ``[[pageN]]`` markers (document_processor.py:252-257):
    returns ``(doc_id, page_number, clean_pos)`` where ``clean_pos`` is the
    marker's offset in the marker-stripped text.

    Implementation: split on the marker regex; the marker i's clean position
    is the cumulative length of the first i+1 segments (segment 0 precedes
    the first marker).
    """
    pages = F.expr(rf"regexp_extract_all({text_col}, '\\[\\[page(\\d+)\\]\\]', 1)")
    segs = F.split(F.col(text_col), PAGE_MARKER_RE)
    # clean_pos(i) = sum(length(segs[j]) for j <= i); marker i sits after
    # segment i. zip pages with their cumulative segment prefix lengths.
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(pages).alias("marker_idx", "page_number"),
            segs.alias("_segs"),
        )
        .select(
            F.col(id_col),
            F.col("page_number").cast("int").alias("page_number"),
            F.aggregate(
                F.slice(F.transform(F.col("_segs"), lambda s: F.length(s)), F.lit(1), F.col("marker_idx") + 1),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("clean_pos"),
            F.col("marker_idx"),
        )
    )


def chunk_overlap_with_pages(
    docs: DataFrame,
    chunk_size: int = 1200,
    chunk_overlap: int = 600,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """add_pymupdf_page_metadata parity over marker-annotated text:
    returns ``(doc_id, chunk_id, chunk_offset, page_number, chunk_text)``.
    """
    step = int(chunk_size) - int(chunk_overlap)
    if step <= 0:
        raise ValueError("chunk_overlap must be < chunk_size")
    clean = F.regexp_replace(F.col(text_col), PAGE_MARKER_RE, "")
    cleaned = docs.select(F.col(id_col), clean.alias("_clean")).filter(
        F.length("_clean") > 0
    )
    offsets = F.sequence(F.lit(0), F.length("_clean") - F.lit(1), F.lit(step))
    chunks = cleaned.select(
        F.col(id_col),
        F.explode(offsets).alias("chunk_offset"),
        strip_ws(F.substring(F.col("_clean"), F.col("chunk_offset") + 1, int(chunk_size))).alias("chunk_text"),
    ).filter(F.col("chunk_text") != "")

    markers = page_markers(docs, id_col=id_col, text_col=text_col)
    # page = marker with the greatest clean_pos <= chunk_offset (reference
    # walks markers in reverse; ties impossible since positions are unique
    # per doc). Chunks before the first marker drop via the inner join —
    # the `page_num is not None` branch.
    joined = chunks.alias("c").join(
        markers.alias("m"),
        (F.col(f"c.{id_col}") == F.col(f"m.{id_col}"))
        & (F.col("m.clean_pos") <= F.col("c.chunk_offset")),
        "inner",
    )
    best = joined.groupBy(
        F.col(f"c.{id_col}").alias(id_col), "c.chunk_offset", "c.chunk_text"
    ).agg(
        F.max_by("m.page_number", "m.marker_idx").alias("page_number")
    )
    return best.select(
        F.col(id_col),
        (F.col(id_col) * ID_STRIDE + F.col("chunk_offset")).alias("chunk_id"),
        "chunk_offset",
        "page_number",
        "chunk_text",
    )
