"""Pure-stdlib binary document decoders (P2/P3, SURVEY.md §2.2).

The container has no pypdf/python-docx/python-pptx, but the formats
themselves are open and simple enough to decode with the standard library:

- ``.docx`` / ``.pptx`` are OPC packages (ECMA-376): a zip archive of XML
  parts — ``zipfile`` + ``xml.etree`` cover them completely.
- ``.pdf`` text extraction covers the dominant real-world shape: objects
  located by scanning ``N 0 obj .. endobj``, the page tree walked from the
  trailer's ``/Root``, content streams inflated with ``zlib`` (FlateDecode,
  PDF 32000-1 §7.4.4) or taken raw, and text pulled from the ``Tj``/``TJ``/
  ``'``/``"`` operators (§9.4.3). CID/Type0 fonts decode through their
  ``/ToUnicode`` CMap (§9.10.3) when one is present — EXCEEDING the
  reference, which warns on such pages (PdfParser.cs:73,86); image-only
  pages (and CID fonts without a ToUnicode stream) still degrade to a
  per-page warning like the reference.

Output shape mirrors the reference parsers exactly:

- PDF: ``--- Page N ---`` markers, blank line between pages, doc-info
  metadata Title/Author/Subject/Creator/CreationDate (PdfParser.cs:34-80),
  "no extractable text" warnings (PdfParser.cs:73,86).
- docx: every paragraph's inner text on its own line, then table rows with
  cells joined ``" | "`` (OfficeParser.cs:93-121; note Descendants<Paragraph>
  includes table-cell paragraphs, so table text appears both ways — we
  reproduce that), core-props metadata (OfficeParser.cs:73-81).
- pptx: ``--- Slide N ---`` markers, one ``a:t`` run per line, blank line
  after each slide, SlideCount metadata (OfficeParser.cs:162-196).

Everything here is per-document CPU work with no Spark dependency — the
Spark integration is ``parsers.parse_binary_documents`` (Arrow-batched
``mapInPandas``), which scales by adding executors.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
import xml.etree.ElementTree as ET

NS_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
NS_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
NS_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
NS_DC = "{http://purl.org/dc/elements/1.1/}"
NS_DCTERMS = "{http://purl.org/dc/terms/}"
NS_CP = (
    "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
)
NS_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


# ---------------------------------------------------------------------------
# OPC core properties (shared by docx/pptx)
# ---------------------------------------------------------------------------


def _core_properties(zf: zipfile.ZipFile, metadata: dict[str, str]) -> None:
    """docProps/core.xml → Title/Author/Subject/CreationDate, the subset the
    reference lifts from PackageProperties (OfficeParser.cs:73-81)."""
    try:
        root = ET.fromstring(zf.read("docProps/core.xml"))
    except (KeyError, ET.ParseError):
        return
    for tag, key in (
        (f"{NS_DC}title", "Title"),
        (f"{NS_DC}creator", "Author"),
        (f"{NS_DC}subject", "Subject"),
        (f"{NS_DCTERMS}created", "CreationDate"),
    ):
        el = root.find(tag)
        if el is not None and el.text and el.text.strip():
            metadata[key] = el.text


# ---------------------------------------------------------------------------
# docx
# ---------------------------------------------------------------------------


def decode_docx(blob: bytes) -> tuple[str, dict[str, str], list[str]]:
    """Word document → (content, metadata, warnings) per OfficeParser.cs:62-131."""
    warnings: list[str] = []
    metadata: dict[str, str] = {"FileType": "Word Document"}
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        _core_properties(zf, metadata)
        try:
            doc = ET.fromstring(zf.read("word/document.xml"))
        except KeyError:
            warnings.append("Document body is empty or inaccessible")
            return "", metadata, warnings
        body = doc.find(f"{NS_W}body")
        if body is None:
            warnings.append("Document body is empty or inaccessible")
            return "", metadata, warnings

        lines: list[str] = []
        # all paragraphs in document order — including those nested in table
        # cells, matching Descendants<Paragraph>() (OfficeParser.cs:93)
        for p in body.iter(f"{NS_W}p"):
            text = "".join(t.text or "" for t in p.iter(f"{NS_W}t"))
            if text.strip():
                lines.append(text)
        # then tables: rows with non-blank cells joined " | "
        # (OfficeParser.cs:105-121)
        for tbl in body.iter(f"{NS_W}tbl"):
            for row in tbl.iter(f"{NS_W}tr"):
                cells = []
                for tc in row.iter(f"{NS_W}tc"):
                    cell = "".join(t.text or "" for t in tc.iter(f"{NS_W}t")).strip()
                    if cell:
                        cells.append(cell)
                row_text = " | ".join(cells)
                if row_text.strip():
                    lines.append(row_text)

        content = "".join(line + "\n" for line in lines)
        if not content.strip():
            warnings.append("Document contains no extractable text")
            content = ""
        return content, metadata, warnings


# ---------------------------------------------------------------------------
# pptx
# ---------------------------------------------------------------------------


def decode_pptx(blob: bytes) -> tuple[str, dict[str, str], list[str]]:
    """Presentation → (content, metadata, warnings) per OfficeParser.cs:134-208."""
    warnings: list[str] = []
    metadata: dict[str, str] = {"FileType": "PowerPoint Presentation"}
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        _core_properties(zf, metadata)
        try:
            pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        except KeyError:
            warnings.append("Presentation is empty or inaccessible")
            return "", metadata, warnings
        sld_id_list = pres.find(f"{NS_P}sldIdLst")
        if sld_id_list is None:
            warnings.append("No slides found in presentation")
            return "", metadata, warnings

        # relationship id → slide part path (ppt/_rels/presentation.xml.rels)
        rels: dict[str, str] = {}
        try:
            rel_root = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
            for rel in rel_root.iter(f"{NS_REL}Relationship"):
                target = rel.get("Target", "")
                # targets are relative to ppt/
                rels[rel.get("Id", "")] = "ppt/" + target.lstrip("./")
        except (KeyError, ET.ParseError):
            pass

        slide_ids = list(sld_id_list.iter(f"{NS_P}sldId"))
        metadata["SlideCount"] = str(len(slide_ids))

        lines: list[str] = []
        slide_number = 1
        for sld in slide_ids:
            part = rels.get(sld.get(f"{NS_R}id", ""), "")
            try:
                slide = ET.fromstring(zf.read(part))
            except (KeyError, ET.ParseError):
                continue  # unresolvable slide: skipped, number not consumed
            lines.append(f"--- Slide {slide_number} ---")
            for t in slide.iter(f"{NS_A}t"):
                if t.text and t.text.strip():
                    lines.append(t.text)
            lines.append("")
            slide_number += 1

        content = "".join(line + "\n" for line in lines)
        if not content.strip():
            warnings.append("Presentation contains no extractable text")
            content = ""
        return content, metadata, warnings


# ---------------------------------------------------------------------------
# pdf
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _pdf_objects(blob: bytes) -> dict[int, bytes]:
    """All indirect objects, including ones compressed inside object
    streams (/Type /ObjStm, PDF 32000-1 §7.5.7) — the storage modern
    writers (PDF 1.5+ with cross-reference streams) use for every
    non-stream object. The ObjStm payload starts with N (objnum, offset)
    integer pairs; bodies begin at /First + offset. Direct definitions
    win on the (spec-invalid) off chance of a collision."""
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(blob)}
    for body in list(objs.values()):
        if not re.search(rb"/Type\s*/ObjStm\b", body):
            continue
        try:
            data = _stream_data(body)
            n = _dict_value_int(body, b"/N")
            first = _dict_value_int(body, b"/First")
            if data is None or n is None or first is None:
                continue
            header = data[:first].split()
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
            ]
            for i, (num, off) in enumerate(pairs):
                end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
                objs.setdefault(num, data[first + off : first + end])
        except Exception:  # noqa: BLE001 — a bad ObjStm loses only its objects
            continue
    return objs


def _dict_value_int(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)", body)
    return int(m.group(1)) if m else None


def _dict_value_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s*(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _dict_value_refs(body: bytes, key: bytes) -> list[int]:
    """Resolve /Key as a single ref or an array of refs."""
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", body, re.DOTALL)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    one = _dict_value_ref(body, key)
    return [one] if one is not None else []


def _pdf_unescape(raw: bytes) -> bytes:
    """Unescape a PDF literal string body to raw bytes (PDF 32000-1
    §7.3.4.2) — decoding to text is a separate step because CID-keyed
    strings must stay byte pairs until the font's CMap maps them."""
    out = bytearray()
    i = 0
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12,
        ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            n = raw[i + 1]
            if n in esc:
                out.append(esc[n])
                i += 2
            elif 0x30 <= n <= 0x37:  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = b""
                while j < len(raw) and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits += bytes([raw[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif n in (10, 13):  # line continuation
                i += 2
                if n == 13 and i < len(raw) and raw[i] == 10:
                    i += 1
            else:
                out.append(n)
                i += 2
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _default_show_decode(raw: bytes) -> str:
    """Simple-font string bytes → text: PDFDocEncoding is latin-1-
    compatible for the printable range; UTF-16BE strings carry a BOM
    (§7.9.2.2)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


def _pdf_literal_string(raw: bytes) -> str:
    """Unescape + decode a PDF literal string body (metadata strings)."""
    return _default_show_decode(_pdf_unescape(raw))


def _find_literal_strings(body: bytes, key: bytes) -> str | None:
    """/Key (literal) or /Key <hex> in a dictionary body."""
    m = re.search(re.escape(key) + rb"\s*\(", body)
    if m:
        s, _ = _scan_literal(body, m.end() - 1)
        return _pdf_literal_string(s)
    m = re.search(re.escape(key) + rb"\s*<([0-9a-fA-F\s]*)>", body)
    if m:
        raw = bytes.fromhex(re.sub(rb"\s", b"", m.group(1)).decode("ascii"))
        if raw[:2] == b"\xfe\xff":
            return raw[2:].decode("utf-16-be", errors="replace")
        return raw.decode("latin-1")
    return None


def _scan_literal(data: bytes, open_paren: int) -> tuple[bytes, int]:
    """Scan a balanced-paren PDF literal string starting at ``(``; returns
    (body bytes without outer parens, index just past the closing paren)."""
    depth = 0
    i = open_paren
    start = open_paren + 1
    while i < len(data):
        c = data[i]
        if c == 0x5C:  # backslash escapes next byte
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return data[start:i], i + 1
        i += 1
    return data[start:], len(data)


class _CMap:
    """A /ToUnicode CMap (PDF 32000-1 §9.10.3): charcode → Unicode string.

    Built from ``begincodespacerange`` (code byte widths), ``beginbfchar``
    (single mappings) and ``beginbfrange`` (contiguous or array-listed
    runs). ``decode`` walks a shown string's bytes grouping them by the
    codespace widths — the Identity-H Type0 case is 2-byte codes."""

    def __init__(self) -> None:
        self.map: dict[tuple[int, int], str] = {}  # (width, code) -> text
        self.widths: list[int] = []

    @staticmethod
    def parse(data: bytes) -> "_CMap":
        cm = _CMap()
        widths: set[int] = set()
        for m in re.finditer(
            rb"begincodespacerange(.*?)endcodespacerange", data, re.DOTALL
        ):
            for rm in re.finditer(rb"<([0-9a-fA-F]+)>", m.group(1)):
                widths.add(len(rm.group(1)) // 2)
        cm.widths = sorted(w for w in widths if w > 0) or [2]

        def dst_text(hx: bytes) -> str:
            return bytes.fromhex(hx.decode("ascii")).decode(
                "utf-16-be", errors="replace"
            )

        for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
            for pm in re.finditer(
                rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>", m.group(1)
            ):
                src = pm.group(1)
                cm.map[(len(src) // 2, int(src, 16))] = dst_text(pm.group(2))
        for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
            for pm in re.finditer(
                rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*(\[.*?\]|<[0-9a-fA-F]+>)",
                m.group(1),
                re.DOTALL,
            ):
                lo_h, hi_h, dst = pm.group(1), pm.group(2), pm.group(3)
                w = len(lo_h) // 2
                lo, hi = int(lo_h, 16), int(hi_h, 16)
                if dst.startswith(b"["):
                    dsts = re.findall(rb"<([0-9a-fA-F]+)>", dst)
                    for off, d in enumerate(dsts):
                        if lo + off <= hi:
                            cm.map[(w, lo + off)] = dst_text(d)
                else:
                    base = int(dst[1:-1], 16)
                    nbytes = (len(dst) - 2) // 2
                    for code in range(lo, hi + 1):
                        cm.map[(w, code)] = dst_text(
                            b"%0*x" % (nbytes * 2, base + code - lo)
                        )
        return cm

    def decode(self, raw: bytes) -> str:
        out: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            hit = None
            for w in self.widths:
                if i + w <= n:
                    code = int.from_bytes(raw[i : i + w], "big")
                    if (w, code) in self.map:
                        hit = (w, self.map[(w, code)])
                        break
            if hit is None:
                # unmapped code: consume the narrowest width, emit nothing
                i += self.widths[0]
            else:
                out.append(hit[1])
                i += hit[0]
        return "".join(out)


def _scan_balanced_dict(data: bytes, start: int) -> bytes | None:
    """Return the body of a ``<< .. >>`` dict starting at ``start`` (which
    must point at the opening ``<<``), handling nesting."""
    if data[start : start + 2] != b"<<":
        return None
    depth = 0
    i = start
    while i < len(data) - 1:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            if depth == 0:
                return data[start + 2 : i]
            i += 2
        else:
            i += 1
    return None


def _dict_value_dict(
    body: bytes, key: bytes, objs: dict[int, bytes]
) -> bytes | None:
    """Resolve /Key as an inline ``<< >>`` dict or an indirect reference."""
    m = re.search(re.escape(key) + rb"\s*", body)
    if m is None:
        return None
    at = m.end()
    if body[at : at + 2] == b"<<":
        return _scan_balanced_dict(body, at)
    ref = _dict_value_ref(body, key)
    return objs.get(ref) if ref is not None else None


def _stream_data(body: bytes) -> bytes | None:
    """A stream object's decoded bytes (raw or FlateDecode)."""
    sm = _STREAM_RE.search(body)
    if not sm:
        return None
    data = sm.group(1)
    if re.search(rb"/Filter\s*(\[\s*)?/FlateDecode", body):
        data = zlib.decompress(data)
    elif re.search(rb"/Filter\s*/", body):
        raise ValueError("unsupported stream filter")
    return data


def _page_fonts(objs: dict[int, bytes], page_body: bytes) -> dict[bytes, _CMap]:
    """Font resource name → parsed /ToUnicode CMap for the page. Fonts
    without a ToUnicode stream (plain simple fonts) are omitted — shown
    strings then take the latin-1 default path."""
    fonts: dict[bytes, _CMap] = {}
    res = _dict_value_dict(page_body, b"/Resources", objs)
    if res is None:
        return fonts
    fdict = _dict_value_dict(res, b"/Font", objs)
    if fdict is None:
        return fonts
    for fm in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict):
        fbody = objs.get(int(fm.group(2)))
        if fbody is None:
            continue
        tu_ref = _dict_value_ref(fbody, b"/ToUnicode")
        if tu_ref is None or tu_ref not in objs:
            continue
        try:
            data = _stream_data(objs[tu_ref])
            if data:
                fonts[fm.group(1)] = _CMap.parse(data)
        except Exception:  # noqa: BLE001 — a bad CMap falls back to latin-1
            continue
    return fonts


_NAME_RE = re.compile(rb"/([^\s/<>\[\]()]*)")


def _page_text(content: bytes, fonts: dict[bytes, _CMap] | None = None) -> str:
    """Concatenate the string operands of text-showing operators, in stream
    order — the same glyph-order concatenation PdfPig's ``page.Text`` gives.
    Kerning numbers inside TJ arrays are skipped. When the active font
    (tracked through ``Tf``) has a /ToUnicode CMap, shown strings decode
    through it — CID/Type0 (Identity-H) pages yield text instead of
    degrading to warnings."""
    parts: list[str] = []
    i = 0
    n = len(content)
    pending: list[bytes] = []  # raw string bytes seen since the last operator
    cur_cmap: _CMap | None = None
    last_name: bytes = b""
    fonts = fonts or {}

    def flush() -> None:
        decode = cur_cmap.decode if cur_cmap is not None else _default_show_decode
        parts.extend(decode(raw) for raw in pending)
        pending.clear()

    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            raw, i = _scan_literal(content, i)
            pending.append(_pdf_unescape(raw))
        elif c == 0x3C and i + 1 < n and content[i + 1] != 0x3C:  # <hex>
            end = content.find(b">", i)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = end + 1
        elif c == 0x2F:  # /Name token (font selections ride these)
            m = _NAME_RE.match(content, i)
            last_name = m.group(1) if m else b""
            i = m.end() if m else i + 1
        elif c in (0x54, 0x27, 0x22):  # T / ' / "
            if c == 0x54 and i + 1 < n and content[i + 1] in (0x6A, 0x4A):  # Tj TJ
                flush()
                i += 2
            elif c == 0x54 and i + 1 < n and content[i + 1] == 0x66:  # Tf
                cur_cmap = fonts.get(last_name)
                pending.clear()
                i += 2
            elif c in (0x27, 0x22):  # ' and " also show text
                flush()
                i += 1
            else:
                pending.clear()  # other T* operator: positioning, drop operands
                i += 1
        elif c in (0x5B, 0x5D):  # TJ array brackets: strings accumulate
            i += 1
        elif content[i : i + 2] in (b"BT", b"ET"):
            pending.clear()
            i += 2
        else:
            i += 1
    return "".join(parts)


def _walk_page_tree(objs: dict[int, bytes], node: int, acc: list[int], depth: int = 0) -> None:
    if depth > 64 or node not in objs:
        return
    body = objs[node]
    if re.search(rb"/Type\s*/Pages\b", body):
        for kid in _dict_value_refs(body, b"/Kids"):
            _walk_page_tree(objs, kid, acc, depth + 1)
    elif re.search(rb"/Type\s*/Page\b", body):
        acc.append(node)


def decode_pdf(blob: bytes) -> tuple[str, dict[str, str], list[str]]:
    """PDF → (content, metadata, warnings) per PdfParser.cs:27-102."""
    warnings: list[str] = []
    metadata: dict[str, str] = {"FileType": "PDF"}
    try:
        objs = _pdf_objects(blob)
        if not objs or b"%PDF" not in blob[:1024]:
            raise ValueError("not a PDF (no header or no objects)")

        # trailer: /Info metadata + /Root for the page tree
        trailer_at = blob.rfind(b"trailer")
        if trailer_at != -1:
            trailer = blob[trailer_at:]
        else:
            # PDF 1.5+ cross-reference streams: no `trailer` keyword —
            # /Root and /Info live in the /Type /XRef stream's dict
            xref = next(
                (b for b in objs.values() if re.search(rb"/Type\s*/XRef\b", b)),
                None,
            )
            trailer = xref if xref is not None else blob
        info_ref = _dict_value_ref(trailer, b"/Info")
        if info_ref is not None and info_ref in objs:
            info = objs[info_ref]
            for key, name in (
                (b"/Title", "Title"), (b"/Author", "Author"),
                (b"/Subject", "Subject"), (b"/Creator", "Creator"),
                (b"/CreationDate", "CreationDate"),
            ):
                val = _find_literal_strings(info, key)
                if val and val.strip():
                    metadata[name] = val

        pages: list[int] = []
        root_ref = _dict_value_ref(trailer, b"/Root")
        if root_ref is not None and root_ref in objs:
            pages_ref = _dict_value_ref(objs[root_ref], b"/Pages")
            if pages_ref is not None:
                _walk_page_tree(objs, pages_ref, pages)
        if not pages:  # damaged tree: fall back to object-number order
            pages = sorted(
                n for n, b in objs.items()
                if re.search(rb"/Type\s*/Page\b", b) and not re.search(rb"/Type\s*/Pages\b", b)
            )
        metadata["PageCount"] = str(len(pages))

        chunks: list[str] = []
        for i, page_obj in enumerate(pages, start=1):
            try:
                text_parts = []
                fonts = _page_fonts(objs, objs[page_obj])
                for cref in _dict_value_refs(objs[page_obj], b"/Contents"):
                    if cref not in objs:
                        continue
                    data = _stream_data(objs[cref])
                    if data is None:
                        continue
                    text_parts.append(_page_text(data, fonts))
                page_text = "".join(text_parts)
                if page_text.strip():
                    chunks.append(f"--- Page {i} ---\n{page_text}\n\n")
                else:
                    warnings.append(
                        f"Page {i} contains no extractable text (may be scanned image)"
                    )
            except Exception as ex:  # noqa: BLE001 — per-page isolation (PdfParser.cs:76-79)
                warnings.append(f"Error extracting text from page {i}: {ex}")

        content = "".join(chunks)
        if not content.strip():
            warnings.append(
                "PDF contains no extractable text. Consider using OCR for scanned documents."
            )
            content = ""
        return content, metadata, warnings
    except Exception as ex:  # noqa: BLE001 — whole-file isolation (PdfParser.cs:98-102)
        warnings.append(f"Error parsing PDF: {ex}")
        return "", metadata, warnings


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_DC_NS = "{http://purl.org/dc/elements/1.1/}"


def decode_epub(blob: bytes) -> tuple[str, dict[str, str], list[str]]:
    """EPUB (OCF/OPF, ISO/IEC 23736) → (content, metadata, warnings) —
    r7 format-family extension beyond the reference's parser set
    (Parsers/*.cs has txt/pdf/office only). An EPUB is a zip: META-INF/
    container.xml names the OPF package document; the OPF's <spine>
    orders the XHTML chapters; each chapter's prose extracts through the
    SAME html extractor as the web path (one extraction policy for both
    seams). Output shape mirrors the pdf/pptx convention:
    ``--- Chapter N ---`` markers, blank line between chapters,
    dc:title/dc:creator metadata, ChapterCount."""
    import posixpath

    from connapse_spark.operators.htmltext import extract_html

    warnings: list[str] = []
    metadata: dict[str, str] = {"FileType": "EPUB Book"}
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        try:
            container = ET.fromstring(zf.read("META-INF/container.xml"))
            rootfile = container.find(
                f".//{_CONTAINER_NS}rootfile"
            ).get("full-path")
            opf = ET.fromstring(zf.read(rootfile))
        except (KeyError, AttributeError, ET.ParseError) as ex:
            warnings.append(f"EPUB package structure unreadable: {ex}")
            return "", metadata, warnings
        title = opf.findtext(f".//{_DC_NS}title")
        creator = opf.findtext(f".//{_DC_NS}creator")
        if title:
            metadata["Title"] = title
        if creator:
            metadata["Author"] = creator
        hrefs = {
            item.get("id"): item.get("href")
            for item in opf.iter(f"{_OPF_NS}item")
        }
        opf_dir = posixpath.dirname(rootfile)
        lines: list[str] = []
        n_chapters = 0
        for itemref in opf.iter(f"{_OPF_NS}itemref"):
            href = hrefs.get(itemref.get("idref"))
            if not href:
                continue
            part = posixpath.normpath(posixpath.join(opf_dir, href))
            n_chapters += 1
            try:
                html = zf.read(part).decode("utf-8", errors="replace")
            except KeyError:
                warnings.append(f"spine item missing from archive: {part}")
                continue
            _, text = extract_html(html, boilerplate=False)
            lines.append(f"--- Chapter {n_chapters} ---")
            if text.strip():
                lines.append(text)
            else:
                warnings.append(f"Chapter {n_chapters} contains no extractable text")
            lines.append("")
        metadata["ChapterCount"] = str(n_chapters)
        content = "\n".join(lines)
        if not content.strip():
            warnings.append("Document contains no extractable text")
            content = ""
        return content, metadata, warnings


_DECODERS = {
    "pdf": decode_pdf, "docx": decode_docx, "pptx": decode_pptx,
    "epub": decode_epub,
}


def decode_binary(
    path: str, blob: bytes
) -> tuple[str, int, dict[str, str], list[str], str | None]:
    """(content, n_pages, metadata, warnings, parse_error) for one file.

    ``n_pages`` is PageCount for PDFs, SlideCount for pptx, 1 for docx (Word
    content is a single flow; the reference exposes no page count for it)."""
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    decoder = _DECODERS.get(ext)
    if decoder is None:
        return "", 0, {}, [f"unsupported binary format: .{ext}"], "UnsupportedFormat"
    try:
        content, metadata, warnings = decoder(bytes(blob or b""))
    except Exception as ex:  # noqa: BLE001 — corrupt container (bad zip etc.)
        return (
            "", 0, {"FileType": ext},
            [f"Error parsing {ext} document: {ex}"],
            type(ex).__name__,
        )
    n_pages = int(
        metadata.get("PageCount") or metadata.get("SlideCount")
        or metadata.get("ChapterCount") or 1
    )
    return content, n_pages, metadata, warnings, None
