"""Document ingest: directory scan -> multi-format parse -> documents table.

Reference flow (``/root/reference/document_processor.py:219-246``): enumerate
files whose extension is in the loader map (``constants.py:294-311``),
parse each with a per-format loader (``document_processor.py:127-217``) on a
thread pool, attach metadata (name/type/hash/timestamps,
``document_processor.py:54-75``), silently dropping failures.

Spark shape:
  * S1 scan    = ``spark.read.format("binaryFile")`` with ``pathGlobFilter``
    (task-parallel, no thread pool needed — S4 is free);
  * S2 parse   = ``mapInPandas`` dispatching on extension. Text-ish formats
    (txt/md/csv/html/log/json) and the stdlib-parseable containers
    (docx/odt/epub via zipfile+ElementTree, eml via email) parse for real;
    formats that genuinely need native libs (pdf/msg/xlsx/rtf/enex) raise
    and the row carries a ``parse_error`` instead of being silently dropped
    (an upgrade over the reference, which loses the file).
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
# zip/XML container formats and RFC-822 mail parse with the stdlib alone
# (zipfile + xml.etree + email) — no native parser libs needed.
CONTAINER_EXTS = {".docx", ".odt", ".epub", ".eml"}
HEAVY_EXTS = {
    ".pdf", ".msg", ".enex",
    ".xls", ".xlsx", ".xlsm", ".rtf",
}
ALLOWED_EXTS = TEXT_EXTS | HTML_EXTS | CONTAINER_EXTS | HEAVY_EXTS

_TAG_RE = re.compile(r"<[^>]+>")
# ascii-space collapse/strip (NOT str.strip(): the SQL oracles mirror these
# exact regexes; see CLAUDE.md float/trim parity rules)
_WS_RE = re.compile(r"[ \t\r\n]+")
_EDGE_RE = re.compile(r"^ +| +$")

_DOCX_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_ODT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def _parse_text(content: bytes) -> str:
    return content.decode("utf-8", errors="replace")


def _parse_html(content: bytes) -> str:
    return _TAG_RE.sub(" ", content.decode("utf-8", errors="replace"))


def _parse_docx(content: bytes) -> str:
    """.docx = zip + WordprocessingML. Paragraphs (``w:p``) joined with a
    blank line, runs (``w:t``) concatenated — the text shape the reference's
    Docx2txtLoader produces (document_processor.py:25, constants.py loader
    map; docx2txt separates paragraphs with ``\\n\\n``)."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter(_DOCX_NS + "p"):
        paras.append("".join(t.text or "" for t in p.iter(_DOCX_NS + "t")))
    return "\n\n".join(paras)


def _parse_odt(content: bytes) -> str:
    """.odt = zip + OpenDocument content.xml; ``text:p``/``text:h`` blocks
    joined with a blank line (reference: UnstructuredODTLoader in 'single'
    mode, document_processor.py:139-146)."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        root = ET.fromstring(z.read("content.xml"))
    paras = []
    for p in root.iter():
        if p.tag in (_ODT_NS + "p", _ODT_NS + "h"):
            paras.append("".join(p.itertext()))
    return "\n\n".join(paras)


def _parse_epub(content: bytes) -> str:
    """.epub = zip of xhtml chapters. Chapters are read in OPF spine order
    (falling back to archive order when the package manifest is absent or
    unparseable), tag-stripped, whitespace-collapsed, and joined with a
    blank line (reference: UnstructuredEPubLoader 'single' mode,
    document_processor.py:139-146)."""
    import io
    import posixpath
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = z.namelist()
        content_docs = [
            n for n in names if n.lower().endswith((".xhtml", ".html", ".htm"))
        ]
        opf = next((n for n in names if n.lower().endswith(".opf")), None)
        if opf is not None:
            try:
                root = ET.fromstring(z.read(opf))
                ns = {"o": "http://www.idpf.org/2007/opf"}
                hrefs = {
                    it.get("id"): it.get("href")
                    for it in root.findall(".//o:manifest/o:item", ns)
                }
                base = posixpath.dirname(opf)
                ordered = [
                    posixpath.normpath(posixpath.join(base, hrefs[ref.get("idref")]))
                    for ref in root.findall(".//o:spine/o:itemref", ns)
                    if ref.get("idref") in hrefs
                ]
                if ordered:
                    content_docs = [n for n in ordered if n in names]
            except ET.ParseError:
                pass
        chapters = []
        for name in content_docs:
            stripped = _TAG_RE.sub(" ", z.read(name).decode("utf-8", "replace"))
            chapters.append(_EDGE_RE.sub("", _WS_RE.sub(" ", stripped)))
    return "\n\n".join(c for c in chapters if c)


def _parse_eml(content: bytes) -> str:
    """.eml = RFC-822 via stdlib ``email``. Body text only — text/plain
    parts joined with a blank line, falling back to tag-stripped text/html
    (reference: UnstructuredEmailLoader, 'single' mode,
    process_attachments=False — document_processor.py:154-162)."""
    import email
    import email.policy

    msg = email.message_from_bytes(content, policy=email.policy.compat32)
    plain, html = [], []
    for part in msg.walk():
        ctype = part.get_content_type()
        if ctype not in ("text/plain", "text/html"):
            continue
        raw = part.get_payload(decode=True)
        if raw is None:
            continue
        charset = part.get_content_charset() or "utf-8"
        text = raw.decode(charset, errors="replace")
        (plain if ctype == "text/plain" else html).append(text)
    if plain:
        return "\n\n".join(plain)
    return "\n\n".join(_TAG_RE.sub(" ", h) for h in html)


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
    ".docx": _parse_docx,
    ".odt": _parse_odt,
    ".epub": _parse_epub,
    ".eml": _parse_eml,
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
