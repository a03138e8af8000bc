"""Deterministic minimal OOXML / PDF builders.

Test-and-oracle fixtures for the binary decoders: every builder produces
byte-identical output for the same inputs (fixed zip timestamps, no
compression-level variance), so a parse query over these blobs is a pure
function and can be hash-checked against a literal oracle.

The documents are minimal but *valid*: a real Word/PowerPoint/PDF reader
opens them. Only public format knowledge is used (ECMA-376 OPC/OOXML,
PDF 32000-1).
"""

from __future__ import annotations

import io
import zipfile
import zlib
from xml.sax.saxutils import escape

_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def _zip_bytes(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, content)
    return buf.getvalue()


def _core_xml(title: str | None, author: str | None, subject: str | None) -> str:
    fields = []
    if title:
        fields.append(f"<dc:title>{escape(title)}</dc:title>")
    if author:
        fields.append(f"<dc:creator>{escape(author)}</dc:creator>")
    if subject:
        fields.append(f"<dc:subject>{escape(subject)}</dc:subject>")
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties'
        ' xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"'
        ' xmlns:dc="http://purl.org/dc/elements/1.1/"'
        ' xmlns:dcterms="http://purl.org/dc/terms/">'
        + "".join(fields)
        + "</cp:coreProperties>"
    )


def make_docx(
    paragraphs: list[str],
    tables: list[list[list[str]]] | None = None,
    title: str | None = None,
    author: str | None = None,
    subject: str | None = None,
) -> bytes:
    """Minimal WordprocessingML package: paragraphs then simple tables."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    for table in tables or []:
        rows = "".join(
            "<w:tr>"
            + "".join(
                f"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">{escape(c)}</w:t></w:r></w:p></w:tc>"
                for c in row
            )
            + "</w:tr>"
            for row in table
        )
        body += f"<w:tbl>{rows}</w:tbl>"
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{w}"><w:body>{body}</w:body></w:document>'
    )
    return _zip_bytes(
        {
            "[Content_Types].xml": (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
                '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
                '<Default Extension="xml" ContentType="application/xml"/>'
                '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
                '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
                "</Types>"
            ),
            "_rels/.rels": (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
                '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
                "</Relationships>"
            ),
            "docProps/core.xml": _core_xml(title, author, subject),
            "word/document.xml": document,
        }
    )


def make_pptx(
    slides: list[list[str]],
    title: str | None = None,
    author: str | None = None,
) -> bytes:
    """Minimal PresentationML package: one text shape per slide."""
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    parts: dict[str, str] = {}
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>' for i in range(len(slides))
    )
    parts["ppt/presentation.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{p}" xmlns:r="{r}">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" Target="slides/slide{i + 1}.xml"/>'
        for i in range(len(slides))
    )
    parts["ppt/_rels/presentation.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + rels
        + "</Relationships>"
    )
    for i, texts in enumerate(slides):
        runs = "".join(
            f'<a:p><a:r><a:t>{escape(t)}</a:t></a:r></a:p>' for t in texts
        )
        parts[f"ppt/slides/slide{i + 1}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{p}" xmlns:a="{a}"><p:cSld><p:spTree>'
            f"<p:sp><p:txBody>{runs}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )
    overrides = "".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        for i in range(len(slides))
    )
    parts["[Content_Types].xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
        '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
        + overrides
        + "</Types>"
    )
    parts["_rels/.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
        "</Relationships>"
    )
    parts["docProps/core.xml"] = _core_xml(title, author, None)
    return _zip_bytes(parts)


def _pdf_escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(
    pages: list[str],
    title: str | None = None,
    author: str | None = None,
    compress: bool = True,
) -> bytes:
    """Minimal valid PDF: page tree, one FlateDecode (or raw) content stream
    per page showing each line with a Tj, a Type1 font, an /Info dict, and a
    correct xref table."""
    objects: list[bytes] = []  # object N is objects[N-1]

    n_pages = len(pages)
    font_obj = 3 + 2 * n_pages
    info_obj = font_obj + 1
    page_objs = [3 + 2 * i for i in range(n_pages)]
    content_objs = [4 + 2 * i for i in range(n_pages)]

    kids = " ".join(f"{n} 0 R" for n in page_objs)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, text in enumerate(pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
                f"/Contents {content_objs[i]} 0 R >>"
            ).encode()
        )
        lines = text.split("\n")
        ops = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append("T*")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        if compress:
            data = zlib.compress(stream, 9)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = stream
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    info = []
    if title:
        info.append(f"/Title ({_pdf_escape(title)})")
    if author:
        info.append(f"/Author ({_pdf_escape(author)})")
    objects.append(("<< " + " ".join(info) + " >>").encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R /Info {info_obj} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_pdf_modern(
    pages: list[str], title: str | None = None, compress: bool = True
) -> bytes:
    """PDF 1.5-style fixture: every non-stream object (catalog, page tree,
    pages, font, info) lives compressed inside a /Type /ObjStm object
    stream, the file has NO `trailer` keyword, and /Root + /Info ride the
    /Type /XRef cross-reference stream's dict — the layout modern writers
    (pdflatex, Chromium print-to-PDF, word processors) emit. Content
    streams stay direct objects (streams may not live in an ObjStm)."""
    n = len(pages)
    content_objs = list(range(1, n + 1))
    objstm_obj = n + 1
    catalog, pagesroot = n + 2, n + 3
    page_objs = [n + 4 + i for i in range(n)]
    font_obj = n + 4 + n
    info_obj = font_obj + 1
    xref_obj = info_obj + 1

    out = bytearray(b"%PDF-1.5\n")
    for i, text in enumerate(pages):
        ops = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
        for j, line in enumerate(text.split("\n")):
            if j > 0:
                ops.append("T*")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        if compress:
            data = zlib.compress(stream, 9)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = stream
            head = f"<< /Length {len(data)} >>".encode()
        out += (
            f"{content_objs[i]} 0 obj\n".encode()
            + head + b"\nstream\n" + data + b"\nendstream\nendobj\n"
        )

    kids = " ".join(f"{p} 0 R" for p in page_objs)
    inner: list[tuple[int, bytes]] = [
        (catalog, f"<< /Type /Catalog /Pages {pagesroot} 0 R >>".encode()),
        (pagesroot, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ]
    for i in range(n):
        inner.append((
            page_objs[i],
            (
                f"<< /Type /Page /Parent {pagesroot} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
                f"/Contents {content_objs[i]} 0 R >>"
            ).encode(),
        ))
    inner.append(
        (font_obj, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    inner.append((
        info_obj,
        (f"<< /Title ({_pdf_escape(title)}) >>" if title else "<< >>").encode(),
    ))
    bodies, offsets, pos = [], [], 0
    for _num, body in inner:
        offsets.append(pos)
        bodies.append(body)
        pos += len(body) + 1  # newline separator
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(inner, offsets)
    ).encode() + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    stm = zlib.compress(payload, 9)
    out += (
        f"{objstm_obj} 0 obj\n<< /Type /ObjStm /N {len(inner)} "
        f"/First {len(header)} /Length {len(stm)} /Filter /FlateDecode >>\n"
        .encode()
        + b"stream\n" + stm + b"\nendstream\nendobj\n"
    )
    xref_at = len(out)
    xstm = zlib.compress(b"\x00", 9)  # entries unused by the scanner
    out += (
        f"{xref_obj} 0 obj\n<< /Type /XRef /Size {xref_obj + 1} "
        f"/Root {catalog} 0 R /Info {info_obj} 0 R /W [1 2 1] "
        f"/Length {len(xstm)} /Filter /FlateDecode >>\n".encode()
        + b"stream\n" + xstm + b"\nendstream\nendobj\n"
        + f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


def make_epub(
    chapters: list[tuple[str, list[str]]],
    title: str | None = None,
    author: str | None = None,
) -> bytes:
    """Deterministic EPUB (OCF zip + OPF package): one XHTML file per
    (chapter_title, paragraphs) entry, spine in list order. Dates pinned
    to the zip epoch so fixture bytes are hash-stable."""
    parts: dict[str, str] = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml": (
            '<?xml version="1.0"?>'
            '<container version="1.0" '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>"
        ),
    }
    manifest, spine = [], []
    for i, (ch_title, paras) in enumerate(chapters, start=1):
        body = "".join(f"<p>{escape(p)}</p>" for p in paras)
        parts[f"OEBPS/ch{i}.xhtml"] = (
            '<?xml version="1.0" encoding="utf-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title>{escape(ch_title)}</title></head>"
            f"<body><h1>{escape(ch_title)}</h1>{body}</body></html>"
        )
        manifest.append(
            f'<item id="ch{i}" href="ch{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="ch{i}"/>')
    meta = []
    if title:
        meta.append(f"<dc:title>{escape(title)}</dc:title>")
    if author:
        meta.append(f"<dc:creator>{escape(author)}</dc:creator>")
    parts["OEBPS/content.opf"] = (
        '<?xml version="1.0" encoding="utf-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        + "".join(meta)
        + "</metadata>"
        f"<manifest>{''.join(manifest)}</manifest>"
        f"<spine>{''.join(spine)}</spine>"
        "</package>"
    )
    return _zip_bytes(parts)


def fixture_corpus() -> list[tuple[str, bytes]]:
    """The fixed binary-parse fixture set shared by unit tests and the
    oracle-checked ``parse_binary`` query: covers compressed + raw PDF,
    an image-only-shaped (textless) PDF, a PDF 1.5 object-stream/xref-
    stream layout, docx with a table, a multi-slide pptx, an EPUB (r7),
    a corrupt container, and an unsupported extension."""
    return [
        ("/fx/book.epub", make_epub(
            [("Opening", ["It began quietly.", "Nothing moved."]),
             ("The Middle", ["Things happened — fast & loud."]),
             ("Coda", [])],
            title="A Tiny Book", author="dana")),
        ("/fx/cid.pdf", make_pdf_cid(
            ["CID page one: Identity-H", "CID page two"])),
        ("/fx/modern.pdf", make_pdf_modern(
            ["ObjStm page one", "ObjStm page two\ncompressed catalog"],
            title="Modern")),
        ("/fx/deck.pptx", make_pptx(
            [["Intro", "agenda"], ["Deep dive"], []], title="Deck", author="carol")),
        ("/fx/empty.pdf", make_pdf([""])),
        ("/fx/notes.docx", make_docx(
            ["First paragraph", "Second paragraph"],
            tables=[[["h1", "h2"], ["v1", "v2"]]], title="Notes", author="alice")),
        ("/fx/raw.pdf", make_pdf(["Uncompressed page"], compress=False)),
        ("/fx/report.pdf", make_pdf(
            ["Quarterly results\nrevenue up 12%", "Risks (supply) & outlook"],
            title="Q3 Report", author="finance")),
        ("/fx/ruined.docx", b"not a zip at all"),
        ("/fx/unknown.bin", b"\x00\x01"),
    ]


def make_pdf_cid(pages: list[str], compress: bool = True) -> bytes:
    """Type0 (CID-keyed, Identity-H) PDF: text is shown as 2-byte hex
    charcodes assigned subset-font style (sequential, NOT the unicode
    values), with a /ToUnicode CMap stream mapping them back — the shape
    real-world subset-embedded fonts produce. Exercises both bfchar and
    bfrange CMap sections (consecutive-codepoint runs become ranges)."""
    charset = sorted({ch for p in pages for ch in p})
    code = {ch: i + 1 for i, ch in enumerate(charset)}

    # group charset into runs of consecutive unicode codepoints — these
    # become bfrange rows; singletons become bfchar rows
    runs: list[tuple[int, int]] = []  # (start_idx, end_idx) into charset
    for i, ch in enumerate(charset):
        if runs and ord(charset[runs[-1][1]]) + 1 == ord(ch):
            runs[-1] = (runs[-1][0], i)
        else:
            runs.append((i, i))
    bfchars = [(code[charset[a]], ord(charset[a])) for a, b in runs if a == b]
    bfranges = [
        (code[charset[a]], code[charset[b]], ord(charset[a]))
        for a, b in runs
        if a < b
    ]
    cmap_lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
    ]
    if bfchars:
        cmap_lines.append(f"{len(bfchars)} beginbfchar")
        cmap_lines += [f"<{c:04x}> <{u:04x}>" for c, u in bfchars]
        cmap_lines.append("endbfchar")
    if bfranges:
        cmap_lines.append(f"{len(bfranges)} beginbfrange")
        cmap_lines += [f"<{lo:04x}> <{hi:04x}> <{u:04x}>" for lo, hi, u in bfranges]
        cmap_lines.append("endbfrange")
    cmap_lines += ["endcmap", "end", "end"]
    cmap = "\n".join(cmap_lines).encode("ascii")

    n_pages = len(pages)
    font_obj = 3 + 2 * n_pages
    tounicode_obj = font_obj + 1
    page_objs = [3 + 2 * i for i in range(n_pages)]
    content_objs = [4 + 2 * i for i in range(n_pages)]

    objects: list[bytes] = []
    kids = " ".join(f"{n} 0 R" for n in page_objs)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, text in enumerate(pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
                f"/Contents {content_objs[i]} 0 R >>"
            ).encode()
        )
        hexcodes = "".join(f"{code[ch]:04x}" for ch in text)
        stream = f"BT\n/F1 12 Tf\n72 720 Td\n<{hexcodes}> Tj\nET".encode("ascii")
        if compress:
            data = zlib.compress(stream, 9)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = stream
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(
        (
            "<< /Type /Font /Subtype /Type0 /BaseFont /Subset-Fake "
            f"/Encoding /Identity-H /ToUnicode {tounicode_obj} 0 R >>"
        ).encode()
    )
    objects.append(
        f"<< /Length {len(cmap)} >>".encode() + b"\nstream\n" + cmap + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
