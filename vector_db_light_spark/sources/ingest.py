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
    (txt/md/csv/html/log/json) and the stdlib-parseable formats
    (docx/odt/epub via zipfile+ElementTree, eml via email, xlsx/xlsm via
    SpreadsheetML, rtf via a small state machine, enex via ElementTree,
    basic pdf via stream scan + zlib + show-operator extraction with
    ``[[pageN]]`` markers, msg via a minimal CFB/OLE2 reader, legacy xls
    via a BIFF8 record parser over the same CFB base) parse for real;
    genuinely library-bound formats raise, carrying a ``parse_error``
    instead of being silently dropped (an upgrade over the reference,
    which loses the file).
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
# zip/XML container formats, RFC-822 mail, SpreadsheetML, RTF, Evernote
# XML and basic PDF all parse with the stdlib alone (zipfile + xml.etree +
# email + zlib + a small RTF state machine) — no native parser libs needed.
CONTAINER_EXTS = {
    ".docx", ".odt", ".epub", ".eml",
    ".xlsx", ".xlsm", ".rtf", ".enex", ".pdf", ".msg", ".xls",
}
# Extensions whose parser genuinely needs a native library. Empty since the
# BIFF8 .xls reader landed (round 8) — kept as the registration seam for
# formats a deployment may add (e.g. .doc OLE word binaries).
HEAVY_EXTS: set[str] = set()
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


_XLSX_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _parse_xlsx(content: bytes) -> str:
    """.xlsx/.xlsm = zip + SpreadsheetML, stdlib-only (zipfile + xml.etree):
    shared strings resolved, cells tab-joined, rows newline-joined, sheets
    (archive order) blank-line-joined — the flat text shape the reference's
    UnstructuredExcelLoader produces in 'single' mode
    (document_processor.py:139-146). Formulas contribute their cached
    ``<v>`` value, matching what Excel last computed."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.iter(_XLSX_MAIN_NS + "si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(_XLSX_MAIN_NS + "t"))
                )
        sheets = sorted(
            n for n in names
            if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
        )
        blocks = []
        for name in sheets:
            root = ET.fromstring(z.read(name))
            rows = []
            for row in root.iter(_XLSX_MAIN_NS + "row"):
                cells = []
                for c in row.iter(_XLSX_MAIN_NS + "c"):
                    ctype = c.get("t", "n")
                    if ctype == "inlineStr":
                        cells.append(
                            "".join(
                                t.text or "" for t in c.iter(_XLSX_MAIN_NS + "t")
                            )
                        )
                        continue
                    v = c.find(_XLSX_MAIN_NS + "v")
                    if v is None or v.text is None:
                        continue
                    if ctype == "s":
                        idx = int(v.text)
                        cells.append(shared[idx] if idx < len(shared) else "")
                    else:
                        cells.append(v.text)
                if cells:
                    rows.append("\t".join(cells))
            if rows:
                blocks.append("\n".join(rows))
    return "\n\n".join(blocks)


_RTF_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "themedata",
    "header", "footer", "generator", "datastore", "xmlnstbl",
}
_RTF_CW_RE = re.compile(
    rb"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-zA-Z])|([{}])"
)


def _parse_rtf(content: bytes) -> str:
    """.rtf via a small stdlib state machine: control words consumed,
    ``\\par``/``\\line`` -> newline, ``\\tab`` -> tab, ``\\'hh`` and
    ``\\uN`` escapes decoded, destination groups (font/color tables,
    embedded pictures, metadata) skipped whole. Covers the text layer the
    reference's UnstructuredRTFLoader extracts; exotic encodings degrade
    to replacement chars rather than failing the row."""
    out: list[str] = []
    skip_depth = 0  # >0 while inside a skipped destination group
    depth = 0
    uc_skip = 1  # chars to skip after \uN (RTF spec \ucN, default 1)
    pending_skip = 0
    pos = 0
    data = content
    while pos < len(data):
        m = _RTF_CW_RE.match(data, pos)
        if m is None:
            ch = data[pos:pos + 1]
            pos += 1
            if skip_depth:
                continue
            if pending_skip > 0:
                pending_skip -= 1
                continue
            if ch not in (b"\r", b"\n"):
                out.append(ch.decode("cp1252", errors="replace"))
            continue
        pos = m.end()
        word, param, hexb, esc, brace = m.groups()
        if brace is not None:
            if brace == b"{":
                depth += 1
                # a destination group opens as {\*\dest or {\dest
                nxt = data[pos:pos + 24]
                probe = nxt[2:] if nxt.startswith(b"\\*") else nxt
                mm = re.match(rb"\\([a-zA-Z]+)", probe)
                if skip_depth == 0 and (
                    nxt.startswith(b"\\*")
                    or (mm and mm.group(1).decode() in _RTF_DESTS)
                ):
                    skip_depth = depth
            else:
                if skip_depth == depth:
                    skip_depth = 0
                depth = max(0, depth - 1)
            continue
        if skip_depth:
            continue
        if hexb is not None:
            if pending_skip > 0:
                pending_skip -= 1
            else:
                out.append(bytes([int(hexb, 16)]).decode("cp1252", "replace"))
            continue
        if esc is not None:
            out.append(esc.decode("cp1252", "replace"))
            continue
        w = word.decode()
        if w in ("par", "line"):
            out.append("\n")
        elif w == "tab":
            out.append("\t")
        elif w == "uc" and param is not None:
            uc_skip = int(param)
        elif w == "u" and param is not None:
            out.append(chr(int(param) % 0x10000))
            pending_skip = uc_skip
    return _merge_surrogates("".join(out))


def _merge_surrogates(s: str) -> str:
    r"""RTF writes non-BMP characters as TWO \uN escapes carrying a UTF-16
    surrogate pair; the per-escape chr() above therefore leaves lone
    surrogates, which cannot utf-8-encode at the Arrow boundary — turning a
    decodable file into a failed task instead of a parse_error row (ADVICE
    r6). Combine adjacent high/low pairs into the real code point and
    replace any unpaired surrogate with U+FFFD."""
    if not any("\ud800" <= c <= "\udfff" for c in s):
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        o = ord(s[i])
        if 0xD800 <= o <= 0xDBFF and i + 1 < n and 0xDC00 <= ord(s[i + 1]) <= 0xDFFF:
            out.append(chr(0x10000 + ((o - 0xD800) << 10) + (ord(s[i + 1]) - 0xDC00)))
            i += 2
        elif 0xD800 <= o <= 0xDFFF:
            out.append("\ufffd")
            i += 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _parse_enex(content: bytes) -> str:
    """.enex = Evernote export XML: per note, title + tag-stripped ENML
    body (the CDATA payload), notes joined with a blank line (reference:
    EverNoteLoader, document_processor.py loader map)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    notes = []
    for note in root.iter("note"):
        title = note.findtext("title") or ""
        body = note.findtext("content") or ""
        body = _TAG_RE.sub(" ", body)
        body = _EDGE_RE.sub("", _WS_RE.sub(" ", body))
        notes.append((title + "\n" + body) if title else body)
    return "\n\n".join(n for n in notes if n)


_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PDF_TEXT_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"  # (..) Tj / (..) '
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?:Tj|')"     # <hex> Tj / <hex> '
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"         # [(..) -12 <hex>] TJ
)
_PDF_LIT_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>"
)
_PDF_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i:i + 1]
        if c == b"\\" and i + 1 < len(lit):
            nxt = lit[i + 1:i + 2]
            if nxt in b"01234567":  # octal \d, \dd, \ddd — 0-7 ONLY:
                # \8 / \9 are "ignore the backslash" per the PDF spec's
                # unknown-escape rule (hypothesis-found: isdigit() admitted
                # them and int(..., 8) raised, failing the whole file)
                j = i + 1
                while j < len(lit) and j < i + 4 and lit[j:j + 1] in b"01234567":
                    j += 1
                out += bytes([int(lit[i + 1:j], 8) % 256])
                i = j
                continue
            out += _PDF_ESC.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _pdf_hex_text(hx: bytes) -> str:
    """Decode a PDF hex show string (<48656C6C6F>): whitespace allowed
    inside, odd length pads a trailing 0 (PDF spec 7.3.4.3). Assumes the
    simple byte-mapped-font case like the literal path; 2-byte CID hex
    (CMap fonts) decodes to mostly-unprintable bytes, which the caller's
    printability gate discards instead of emitting mojibake."""
    h = b"".join(hx.split())
    if len(h) % 2:
        h += b"0"
    try:
        raw = bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return ""
    txt = raw.decode("latin-1", "replace")
    if not txt:
        return ""
    printable = sum(1 for ch in txt if ch.isprintable() or ch in "\n\t\r")
    return txt if printable * 5 >= len(txt) * 4 else ""  # >= 80% printable


def _pdf_a85(data: bytes) -> bytes | None:
    """ASCII85Decode (PDF 7.4.3): stdlib a85decode with the PDF `~>` EOD
    marker tolerated; None when the payload is not a85."""
    import base64

    body = data.split(b"~>")[0].strip()
    if not body:
        return None
    try:
        return base64.a85decode(body)  # default ignorechars covers ws
    except Exception:
        # not a85 — candidate chain falls through (a spurious successful
        # decode of a non-a85 stream is harmless: garbage bytes contain
        # no show operators, so the caller's first-match loop skips it)
        return None


def _pdf_asciihex(data: bytes) -> bytes | None:
    """ASCIIHexDecode (PDF 7.4.2): hex pairs, whitespace ignored, `>` EOD,
    odd length pads a zero nibble; None when non-hex bytes appear."""
    body = b"".join(data.split(b">")[0].split())
    if not body:
        return None
    try:
        if len(body) % 2:
            body += b"0"
        return bytes.fromhex(body.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return None


def _pdf_lzw(data: bytes) -> bytes | None:
    """LZWDecode (PDF 7.4.4 — the TIFF/GIF variable-code-width variant,
    MSB-first, codes start at 9 bits, 256 = clear, 257 = EOD). Returns
    None on any malformed code so the candidate chain falls through."""
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    width, acc, nbits = 9, 0, 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out) if out else None
            if prev is None:
                if code > 255:
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            # early-change (PDF default) + the decoder's one-entry lag:
            # the encoder widens after assigning entry (2^w - 2), and the
            # decoder has appended one entry fewer when it must follow
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
    return bytes(out) if out else None


def _parse_pdf(content: bytes) -> str:
    """BASIC stdlib PDF text extraction: every content stream is tried raw
    and Flate-decompressed (zlib is stdlib), literal-string show operators
    ((..)Tj, (..)', [..]TJ) are collected in stream order, and each
    stream's text is prefixed with the ``[[pageN]]`` marker protocol
    (operators/chunking.py S3) — one content stream per page holds for the
    common writer layout, so the repo's own pdf -> page-aware overlap
    chunker path (F5) runs end to end. LIMITS (documented, not hidden):
    unencrypted PDFs, simple byte-mapped fonts; CMap/ToUnicode-encoded or
    hex-string text degrades to omission. The reference's PyMuPDF loader
    (document_processor.py:95-113) remains the drop-in upgrade via
    register_parser('.pdf', ...) where the native lib exists."""
    import zlib

    pages = []
    for m in _PDF_STREAM_RE.finditer(content):
        raw = m.group(1)
        # Decode-candidate chain, best-first: Flate, ASCII85(+Flate),
        # ASCIIHex(+Flate), LZW, then the raw bytes. Each try is guarded —
        # the first variant yielding show operators wins below.
        candidates = []
        stripped = raw.strip(b"\r\n")
        try:
            candidates.append(zlib.decompress(stripped))
        except Exception:
            pass
        for decoded in (_pdf_a85(stripped), _pdf_asciihex(stripped)):
            if decoded is None:
                continue
            try:
                candidates.append(zlib.decompress(decoded))
            except Exception:
                pass
            candidates.append(decoded)
        lzw = _pdf_lzw(stripped)
        if lzw is not None:
            candidates.append(lzw)
        candidates.append(raw)
        text_parts: list[str] = []
        for data in candidates:
            for tm in _PDF_TEXT_RE.finditer(data):
                if tm.group("lit") is not None:
                    text_parts.append(
                        _pdf_unescape(tm.group("lit")).decode("latin-1", "replace")
                    )
                elif tm.group("hex") is not None:
                    h = _pdf_hex_text(tm.group("hex"))
                    if h:
                        text_parts.append(h)
                else:
                    for lit in _PDF_LIT_RE.findall(tm.group("arr")):
                        if lit.startswith(b"<"):
                            h = _pdf_hex_text(lit[1:-1])
                            if h:
                                text_parts.append(h)
                        else:
                            text_parts.append(
                                _pdf_unescape(lit[1:-1]).decode(
                                    "latin-1", "replace"
                                )
                            )
            if text_parts:
                break  # the decodable variant won; don't double-extract
        if text_parts:
            pages.append(" ".join(text_parts))
    if not pages:
        # junk or image-only/CMap-encoded pdf: surface parse_error rather
        # than ingesting an empty document
        raise ValueError("no extractable text streams")
    return "".join(
        f"[[page{i + 1}]]{t}" for i, t in enumerate(pages)
    )


_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_CFB_END = 0xFFFFFFFE  # ENDOFCHAIN
_CFB_FREE = 0xFFFFFFFF


def _cfb_streams(content: bytes) -> dict[str, bytes]:
    """Minimal stdlib reader for the Compound File Binary format (the OLE2
    container .msg uses): header -> DIFAT -> FAT -> directory; stream bytes
    come from the FAT chain, or from the mini-FAT + root mini-stream for
    streams under the 4096-byte cutoff. Covers single-DIFAT files (< ~7 MB
    of FAT, i.e. multi-GB payloads) — larger files raise and surface as
    parse_error. Returns {stream_name: bytes} for every stream entry."""
    import struct

    if content[:8] != _CFB_MAGIC:
        raise ValueError("not a compound file")
    sect_shift, mini_shift = struct.unpack_from("<HH", content, 30)
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    (first_dir,) = struct.unpack_from("<I", content, 48)
    (mini_cutoff,) = struct.unpack_from("<I", content, 56)
    first_minifat, n_minifat = struct.unpack_from("<II", content, 60)
    (n_difat,) = struct.unpack_from("<I", content, 72)
    if n_difat:
        raise ValueError("DIFAT-chained compound file not supported")
    difat = struct.unpack_from("<109I", content, 76)

    def sector(n: int) -> bytes:
        off = 512 + n * ssz
        return content[off:off + ssz]

    fat: list[int] = []
    for s in difat:
        if s in (_CFB_FREE, _CFB_END):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

    def chain(start: int, size: int) -> bytes:
        out, s, guard = bytearray(), start, 0
        while s != _CFB_END and s != _CFB_FREE and guard <= len(fat):
            out += sector(s)
            s = fat[s]
            guard += 1
        return bytes(out[:size])

    dir_raw = chain(first_dir, 1 << 62)
    minifat: list[int] = []
    if first_minifat not in (_CFB_FREE, _CFB_END) and n_minifat:
        raw = chain(first_minifat, n_minifat * ssz)
        minifat = list(struct.unpack(f"<{len(raw) // 4}I", raw))

    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        e = dir_raw[off:off + 128]
        (name_len,) = struct.unpack_from("<H", e, 64)
        etype = e[66]
        if etype == 0 or name_len < 2:
            continue
        name = e[:name_len - 2].decode("utf-16-le", "replace")
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = chain(root[2], root[3]) if root else b""

    def mini_chain(start: int, size: int) -> bytes:
        out, s, guard = bytearray(), start, 0
        while s != _CFB_END and s != _CFB_FREE and guard <= len(minifat):
            out += mini_stream[s * msz:(s + 1) * msz]
            s = minifat[s] if s < len(minifat) else _CFB_END
            guard += 1
        return bytes(out[:size])

    streams = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream objects only
            continue
        if size < mini_cutoff:
            streams[name] = mini_chain(start, size)
        else:
            streams[name] = chain(start, size)
    return streams


def _parse_msg(content: bytes) -> str:
    """.msg = MAPI properties in a CFB container. Subject
    (``__substg1.0_0037001F``) and body (``1000001F`` UTF-16LE, falling
    back to ``1000001E`` ANSI) streams extracted with the stdlib CFB
    reader above — the text the reference's UnstructuredLoader surfaces.
    RTF-compressed-only bodies (``10090102``) are out of scope and yield
    the subject alone (or a parse_error when nothing is found)."""
    streams = _cfb_streams(content)
    parts = []
    subj = streams.get("__substg1.0_0037001F")
    if subj:
        parts.append(subj.decode("utf-16-le", "replace"))
    body = streams.get("__substg1.0_1000001F")
    if body is not None:
        parts.append(body.decode("utf-16-le", "replace"))
    else:
        ansi = streams.get("__substg1.0_1000001E")
        if ansi is not None:
            parts.append(ansi.decode("cp1252", "replace"))
    if not parts:
        raise ValueError("no subject/body text streams in .msg")
    return "\n\n".join(parts)


# ---------------------------------------------------------------------------
# Legacy .xls: BIFF8 records inside the CFB 'Workbook' stream (public
# [MS-XLS] spec; the reference reads these via UnstructuredExcelLoader,
# document_processor.py:140-180). Reuses the stdlib CFB reader above.
# ---------------------------------------------------------------------------

_BIFF_BOF = 0x0809
_BIFF_EOF = 0x000A
_BIFF_CONTINUE = 0x003C
_BIFF_BOUNDSHEET = 0x0085
_BIFF_SST = 0x00FC
_BIFF_LABELSST = 0x00FD
_BIFF_LABEL = 0x0204
_BIFF_NUMBER = 0x0203
_BIFF_RK = 0x027E
_BIFF_MULRK = 0x00BD


class _BiffStrCursor:
    """Reader over an SST record plus its CONTINUE records. Character data
    of an XLUnicodeRichExtendedString may be split at ANY point across a
    CONTINUE boundary, and each continuation RE-STATES the 1-byte grbit
    (the string can switch between compressed and UTF-16 halves mid-string,
    [MS-XLS] 2.5.293) — so raw concatenation of record payloads would
    mis-decode real Excel files. Fixed-width fields (counts, format runs)
    span boundaries byte-transparently via :meth:`read`."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _advance_chunk(self) -> bool:
        while self.ci < len(self.chunks) and self.off >= len(self.chunks[self.ci]):
            self.ci += 1
            self.off = 0
        return self.ci < len(self.chunks)

    def eof(self) -> bool:
        return not self._advance_chunk()

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0 and self._advance_chunk():
            take = self.chunks[self.ci][self.off : self.off + n]
            out += take
            self.off += len(take)
            n -= len(take)
        if n:
            raise ValueError("truncated SST stream")
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        """cch CHARACTERS honouring the per-continuation grbit restart.

        The restart applies at EVERY record boundary crossed while inside
        a string's character run — including the boundary case where the
        3-byte string header ended exactly at the end of the previous
        record, so the continuation begins with the grbit before any
        character was emitted (found in review: guarding on 'characters
        already read' mis-decoded that alignment)."""
        out = []
        while cch > 0:
            if not self._advance_chunk():
                raise ValueError("truncated SST string")
            if self.off == 0:
                # at the start of a CONTINUE while mid-character-run:
                # fresh option byte for the rest of this string
                high = bool(self.read(1)[0] & 0x01)
                if not self._advance_chunk():
                    raise ValueError("truncated SST string")
            avail = len(self.chunks[self.ci]) - self.off
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:
                # a UTF-16 char split across the boundary: spec forbids it
                # (continuations break at character boundaries); treat a
                # dangling byte as corruption
                raise ValueError("SST continuation splits a UTF-16 unit")
            raw = self.read(take * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= take
        return "".join(out)


def _parse_sst(chunks: list[bytes]) -> list[str]:
    """Shared-string table from the SST record + CONTINUE payloads."""
    cur = _BiffStrCursor(chunks)
    import struct

    _total, unique = struct.unpack("<II", cur.read(8))
    out: list[str] = []
    for _ in range(unique):
        (cch,) = struct.unpack("<H", cur.read(2))
        flags = cur.read(1)[0]
        high = bool(flags & 0x01)
        n_runs = struct.unpack("<H", cur.read(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<I", cur.read(4))[0] if flags & 0x04 else 0
        out.append(cur.read_chars(cch, high))
        if n_runs:
            cur.read(4 * n_runs)  # formatting runs: presentation only
        if cb_ext:
            cur.read(cb_ext)  # phonetic/ext block
    return out


def _rk_value(rk: int):
    """Decode an RK cell value ([MS-XLS] 2.5.217): bit0 = /100,
    bit1 = 30-bit signed int vs top-30-bits-of-double."""
    import struct

    div100 = rk & 0x01
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        return v / 100 if div100 else v
    (d,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    return d / 100 if div100 else d


def _num_text(v) -> str:
    """Numeric cell -> text the way the xlsx parser surfaces cached <v>
    values: integral doubles render without a fractional part."""
    if isinstance(v, int) or (isinstance(v, float) and v == int(v)):
        return str(int(v))
    return repr(v)


def _parse_xls(content: bytes) -> str:
    """.xls = BIFF8 records in the CFB 'Workbook' stream: BOUNDSHEET order,
    SST/LABELSST + LABEL + NUMBER/RK/MULRK cells. Output shape matches
    ``_parse_xlsx``: cells tab-joined (column order), rows newline-joined
    (row order), sheets blank-line-joined. Unknown records are skipped by
    their declared length, so files with the full Excel record zoo (INDEX,
    XF, FORMAT, ...) parse their text layer fine; BIFF5 ('Book' stream,
    no SST) and encrypted workbooks raise -> parse_error."""
    import struct

    streams = _cfb_streams(content)
    wb = streams.get("Workbook")
    if wb is None:
        if "Book" in streams:
            raise ValueError("BIFF5 'Book' stream not supported (BIFF8 only)")
        raise ValueError("no Workbook stream in compound file")

    # pass 1: record walk — globals (SST, sheet order), then per-substream
    # cell records. Records: 2-byte id, 2-byte length, payload.
    pos = 0
    sst: list[str] = []
    sheet_starts: list[int] = []
    records: list[tuple[int, int, int]] = []  # (id, data_off, length)
    while pos + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, pos)
        if rid == 0 and ln == 0:
            break  # trailing padding
        records.append((rid, pos + 4, ln))
        pos += 4 + ln
    for i, (rid, off, ln) in enumerate(records):
        if rid == _BIFF_SST:
            chunks = [wb[off : off + ln]]
            j = i + 1
            while j < len(records) and records[j][0] == _BIFF_CONTINUE:
                _, coff, cln = records[j]
                chunks.append(wb[coff : coff + cln])
                j += 1
            sst = _parse_sst(chunks)
        elif rid == _BIFF_BOUNDSHEET:
            (lb_ply_pos,) = struct.unpack_from("<I", wb, off)
            sheet_starts.append(lb_ply_pos)

    blocks: list[str] = []
    for start in sheet_starts:  # BOUNDSHEET order == workbook tab order
        cells: dict[int, dict[int, str]] = {}
        pos = start
        depth = 0
        while pos + 4 <= len(wb):
            rid, ln = struct.unpack_from("<HH", wb, pos)
            off = pos + 4
            pos = off + ln
            if rid == _BIFF_BOF:
                depth += 1
                continue
            if rid == _BIFF_EOF:
                depth -= 1
                if depth <= 0:
                    break
                continue
            if rid == _BIFF_LABELSST:
                row, col, _ixfe, isst = struct.unpack_from("<HHHI", wb, off)
                if isst < len(sst):
                    cells.setdefault(row, {})[col] = sst[isst]
            elif rid == _BIFF_LABEL:
                row, col, _ixfe, cch = struct.unpack_from("<HHHH", wb, off)
                high = wb[off + 8] & 0x01
                raw = wb[off + 9 : off + 9 + cch * (2 if high else 1)]
                cells.setdefault(row, {})[col] = raw.decode(
                    "utf-16-le" if high else "latin-1"
                )
            elif rid == _BIFF_NUMBER:
                row, col, _ixfe = struct.unpack_from("<HHH", wb, off)
                (v,) = struct.unpack_from("<d", wb, off + 6)
                cells.setdefault(row, {})[col] = _num_text(v)
            elif rid == _BIFF_RK:
                row, col, _ixfe, rk = struct.unpack_from("<HHHI", wb, off)
                cells.setdefault(row, {})[col] = _num_text(_rk_value(rk))
            elif rid == _BIFF_MULRK:
                row, col0 = struct.unpack_from("<HH", wb, off)
                n = (ln - 6) // 6
                for k in range(n):
                    _ixfe, rk = struct.unpack_from("<HI", wb, off + 4 + 6 * k)
                    cells.setdefault(row, {})[col0 + k] = _num_text(
                        _rk_value(rk)
                    )
        rows = [
            "\t".join(cells[r][c] for c in sorted(cells[r]))
            for r in sorted(cells)
        ]
        if rows:
            blocks.append("\n".join(rows))
    return "\n\n".join(blocks)


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
    ".xlsx": _parse_xlsx,
    ".xlsm": _parse_xlsx,
    ".rtf": _parse_rtf,
    ".enex": _parse_enex,
    ".pdf": _parse_pdf,
    ".msg": _parse_msg,
    ".xls": _parse_xls,
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
