"""Document ingest: directory scan -> multi-format parse -> documents table.

Reference flow (``/root/reference/document_processor.py:219-246``): enumerate
files whose extension is in the loader map (``constants.py:294-311``),
parse each with a per-format loader (``document_processor.py:127-217``) on a
thread pool, attach metadata (name/type/hash/timestamps,
``document_processor.py:54-75``), silently dropping failures.

Spark shape:
  * S1 scan    = ``spark.read.format("binaryFile")`` with ``pathGlobFilter``
    (task-parallel, no thread pool needed — S4 is free);
  * S2 parse   = ``mapInPandas`` dispatching on extension. Heavy formats
    (pdf/docx/epub/...) need libs not present in this container: their
    parsers raise and the row carries a ``parse_error`` instead of being
    silently dropped (an upgrade over the reference, which loses the file).
    Plain text-ish formats (txt/md/csv/html/log/json) parse for real.
  * metadata   = X1-X4 column expressions (sha256, basename, extension,
    timestamps from the binaryFile columns).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Extension -> parser family (reference loader map, constants.py:294-311).
TEXT_EXTS = {".txt", ".md", ".log", ".csv", ".json"}
HTML_EXTS = {".html", ".htm"}
HEAVY_EXTS = {
    ".pdf", ".docx", ".epub", ".eml", ".msg", ".enex",
    ".xls", ".xlsx", ".xlsm", ".rtf", ".odt",
}
ALLOWED_EXTS = TEXT_EXTS | HTML_EXTS | HEAVY_EXTS

_TAG_RE = re.compile(r"<[^>]+>")


def _parse_text(content: bytes) -> str:
    return content.decode("utf-8", errors="replace")


def _parse_html(content: bytes) -> str:
    return _TAG_RE.sub(" ", content.decode("utf-8", errors="replace"))


def _parse_heavy_missing(ext: str):
    def parse(content: bytes) -> str:
        # Real parsers (PyMuPDF, python-docx, ...) are optional extras not
        # present in this container (SURVEY.md §7 hard-part #4). Register a
        # real one with register_parser(ext, fn) when the lib is installed.
        raise NotImplementedError(f"no parser library available for {ext}")

    return parse


# Pluggable dispatch table (the reference's loader map is a per-extension
# class table, document_processor.py:127-217 / constants.py:294-311): a
# parser lib drops in per extension without touching the pipeline.
# parse_documents snapshots this dict into its closure at plan-build time,
# so registrations made before building the plan ship to executors with it.
PARSERS: dict[str, object] = {
    **{ext: _parse_text for ext in TEXT_EXTS},
    **{ext: _parse_html for ext in HTML_EXTS},
    **{ext: _parse_heavy_missing(ext) for ext in HEAVY_EXTS},
}


def register_parser(ext: str, parser) -> None:
    """Install/override the parser callable (``bytes -> str``) for an
    extension, e.g. ``register_parser('.pdf', lambda b: fitz_extract(b))``
    once PyMuPDF is available (reference document_processor.py:95-113).
    Newly registered extensions are automatically allowed through ingest."""
    ext = ext.lower()
    if not ext.startswith("."):
        ext = "." + ext
    PARSERS[ext] = parser
    ALLOWED_EXTS.add(ext)


def scan_files(spark: SparkSession, source_dir: str, glob: str = "*") -> DataFrame:
    """S1: binaryFile scan -> (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(source_dir)
    )


def _parse_bytes(ext: str, content: bytes, parsers: dict | None = None) -> str:
    parser = (PARSERS if parsers is None else parsers).get(ext)
    if parser is None:
        raise ValueError(f"unsupported extension {ext}")
    return parser(content)


def parse_documents(files: DataFrame) -> DataFrame:
    """S2+S4: per-file parse with failures surfaced as ``parse_error``.

    The dispatch table is SNAPSHOTTED by value into the mapInPandas closure
    here: module-level lookup on the executor would re-import this module
    and see only the defaults, silently dropping runtime
    ``register_parser`` installs."""
    schema = StructType(
        [
            StructField("file_path", StringType(), False),
            StructField("text", StringType(), True),
            StructField("parse_error", StringType(), True),
        ]
    )
    parsers = dict(PARSERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                ext = "." + path.rsplit(".", 1)[-1].lower() if "." in path else ""
                try:
                    out.append((path, _parse_bytes(ext, bytes(content), parsers), None))
                except Exception as ex:
                    out.append((path, None, f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(out, columns=["file_path", "text", "parse_error"])

    return files.select("path", "content").mapInPandas(run, schema=schema)


def documents_table(files: DataFrame, parsed: DataFrame) -> DataFrame:
    """S7/S9 documents table with X1-X4 metadata columns
    (document_processor.py:54-75): name, type, content hash, timestamps."""
    meta = files.select(
        F.col("path").alias("file_path"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.lower(
            F.concat(F.lit("."), F.substring_index(F.col("path"), ".", -1))
        ).alias("file_type"),
        F.sha2(F.col("content"), 256).alias("hash"),
        F.col("modificationTime").alias("modification_date"),
        F.col("length").alias("file_size"),
    )
    return meta.join(parsed, "file_path")


def ingest(spark: SparkSession, source_dir: str, glob: str = "*") -> DataFrame:
    """S1 -> S2 -> documents table, one lazy plan (SURVEY.md §3.1)."""
    from ..registry import _ship_package

    _ship_package(spark)  # parse stage is mapInPandas; see registry docstring
    files = scan_files(spark, source_dir, glob)
    allowed = files.filter(
        F.lower(F.concat(F.lit("."), F.substring_index("path", ".", -1))).isin(
            *sorted(ALLOWED_EXTS)
        )
    )
    return documents_table(allowed, parse_documents(allowed))
