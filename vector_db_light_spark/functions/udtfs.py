"""Python UDTFs (Spark 4 table functions) — the SQL-ergonomics face of the
chunking operator.

The engine's hot paths never use these: chunking is a pure Catalyst
expression (operators/chunking.py), parsing/embedding are Arrow-batched
mapInPandas (§2.9). A UDTF evaluates row-at-a-time in Python — the slow
path by this repo's own rules. It earns its place for ONE reason: it is
the only way a pure-SQL user (spark.sql, JDBC, notebook SQL cell) can
fan a column out into rows through custom Python via LATERAL, without
leaving SQL for the DataFrame API. Registered under ``chunk_text`` so

    SELECT d.doc_id, c.chunk_offset, c.chunk_text
    FROM documents d, LATERAL chunk_text(d.text, 200) c

matches operators/chunking.chunk_fixed exactly (same stride windows, the
same str.strip() + drop-empty semantics of the reference's
FixedSizeTextSplitter, document_processor.py:78-92; the equivalence is
pytest-pinned). Arrow transfer is enabled
(useArrow=True) so batches cross the boundary columnar even though eval
itself is per-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_offset int, chunk_text string", useArrow=True)
class ChunkTextUDTF:
    """Fixed-stride chunker as a table function: one row per ``size``-char
    window of ``text`` (last window ragged), each piece str.strip()-ed and
    dropped when empty, nothing for NULL/empty input — chunk_fixed's exact
    output contract."""

    def eval(self, text: str, size: int):  # noqa: A002 - UDTF contract
        if not text or size is None or size <= 0:
            return
        for i in range(0, len(text), size):
            piece = text[i : i + size].strip()
            if piece:
                yield i, piece


def register_udtfs(spark: SparkSession) -> None:
    """Register the SQL-visible table functions on this session."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
