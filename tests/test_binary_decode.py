"""Pure-Python decoder units (no Spark): the P2/P3 kernels in
``sources/binary_decode.py`` against fixtures from ``sources/docgen.py``,
plus the oracle-constant regeneration check for the ``parse_binary`` query."""

from __future__ import annotations

import hashlib

from connapse_spark.sources import binary_decode as bd
from connapse_spark.sources import docgen


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------


def test_pdf_pages_markers_and_metadata():
    blob = docgen.make_pdf(
        ["Alpha line\nBeta line", "Gamma"], title="T", author="A"
    )
    content, meta, warnings = bd.decode_pdf(blob)
    # page markers + blank line between pages (PdfParser.cs:67-69)
    assert content == "--- Page 1 ---\nAlpha lineBeta line\n\n--- Page 2 ---\nGamma\n\n"
    assert meta["Title"] == "T" and meta["Author"] == "A"
    assert meta["PageCount"] == "2" and meta["FileType"] == "PDF"
    assert warnings == []


def test_pdf_uncompressed_and_escapes():
    blob = docgen.make_pdf(["paren (x) and \\ backslash"], compress=False)
    content, _, warnings = bd.decode_pdf(blob)
    assert "paren (x) and \\ backslash" in content
    assert warnings == []


def test_pdf_textless_page_warns():
    content, meta, warnings = bd.decode_pdf(docgen.make_pdf([""]))
    assert content == ""
    assert meta["PageCount"] == "1"
    # both per-page and whole-doc warnings, phrased as the reference does
    assert any("may be scanned image" in w for w in warnings)
    assert any("Consider using OCR" in w for w in warnings)


def test_pdf_garbage_degrades_to_warning():
    content, _, warnings = bd.decode_pdf(b"%PDF" * 600)
    assert content == ""
    assert any(w.startswith("Error parsing PDF") for w in warnings)


def test_pdf_hex_string_and_octal():
    # hand-built single page with a hex string and an octal escape
    page = "ignored"
    blob = docgen.make_pdf([page], compress=False)
    # splice a hex-string Tj into the content stream
    blob = blob.replace(b"(ignored) Tj", b"<48 65 78> Tj (\\101\\102) Tj")
    content, _, _ = bd.decode_pdf(blob)
    assert "Hex" in content and "AB" in content


# ---------------------------------------------------------------------------
# docx / pptx
# ---------------------------------------------------------------------------


def test_pdf_modern_objstm_xref_stream_layout():
    """PDF 1.5 layout: catalog/page-tree/font/info compressed inside a
    /Type /ObjStm, no `trailer` keyword, /Root + /Title via the /Type
    /XRef stream dict — the modern-writer shape. All pages must decode
    and metadata must resolve through the xref stream."""
    blob = docgen.make_pdf_modern(
        ["ObjStm alpha", "ObjStm beta\nsecond line"], title="Modern Doc"
    )
    assert b"trailer" not in blob and b"/ObjStm" in blob
    content, meta, warnings = bd.decode_pdf(blob)
    assert "--- Page 1 ---" in content and "ObjStm alpha" in content
    assert "--- Page 2 ---" in content and "second line" in content
    assert meta["Title"] == "Modern Doc" and meta["PageCount"] == "2"
    assert warnings == []


def test_pdf_modern_uncompressed_contents():
    content, _, warnings = bd.decode_pdf(
        docgen.make_pdf_modern(["raw body"], compress=False)
    )
    assert "raw body" in content and warnings == []


def test_pdf_corrupt_objstm_loses_only_its_objects():
    """A damaged ObjStm payload must not take down the whole parse —
    direct objects still decode (whole-file isolation stays page-level)."""
    blob = docgen.make_pdf(["direct page survives"])
    # graft a broken ObjStm object in front of the xref table
    broken = (
        b"90 0 obj\n<< /Type /ObjStm /N 2 /First 8 /Length 4 >>\n"
        b"stream\n\xde\xad\xbe\xef\nendstream\nendobj\n"
    )
    patched = blob.replace(b"xref\n", broken + b"xref\n", 1)
    content, _, warnings = bd.decode_pdf(patched)
    assert "direct page survives" in content


def test_docx_paragraphs_then_tables_with_cell_duplication():
    blob = docgen.make_docx(
        ["P one", "P two"], tables=[[["a", "b"], ["c", "d"]]]
    )
    content, meta, warnings = bd.decode_docx(blob)
    # Descendants<Paragraph> includes table-cell paragraphs, then rows join
    # " | " (OfficeParser.cs:93-121) — cell text appears both ways
    assert content == "P one\nP two\na\nb\nc\nd\na | b\nc | d\n"
    assert meta["FileType"] == "Word Document"
    assert warnings == []


def test_docx_empty_body_warns():
    content, _, warnings = bd.decode_docx(docgen.make_docx([]))
    assert content == "" and any("no extractable text" in w for w in warnings)


def test_pptx_slide_markers_and_count():
    blob = docgen.make_pptx([["One", "two"], [], ["Three"]], title="D")
    content, meta, warnings = bd.decode_pptx(blob)
    assert content == (
        "--- Slide 1 ---\nOne\ntwo\n\n--- Slide 2 ---\n\n--- Slide 3 ---\nThree\n\n"
    )
    assert meta["SlideCount"] == "3" and meta["Title"] == "D"
    assert warnings == []


def test_dispatch_unsupported_and_corrupt():
    _, _, _, _, err = bd.decode_binary("/x/a.exe", b"MZ")
    assert err == "UnsupportedFormat"
    _, _, _, warns, err = bd.decode_binary("/x/a.docx", b"junk")
    assert err == "BadZipFile" and warns


# ---------------------------------------------------------------------------
# oracle constants for the parse_binary query
# ---------------------------------------------------------------------------


def test_parse_binary_oracle_constants():
    """Regenerates the literal expectations pinned in
    ``__spark_entry__._sql_parse_binary`` — if a decoder or fixture changes,
    this fails with the new constants to paste."""
    import __spark_entry__ as entry

    expected = []
    for path, blob in docgen.fixture_corpus():
        content, n_pages, meta, warnings, err = bd.decode_binary(path, blob)
        expected.append(
            (
                path,
                meta.get("Title"),
                n_pages,
                hashlib.sha256(content.encode()).hexdigest(),
                len(warnings),
                err,
            )
        )
    sql = entry._sql_parse_binary()
    for path, title, n_pages, sha, n_warn, err in expected:
        for token in (path, sha):
            assert token in sql, f"oracle constant drift: {token} for {path}"
        if title:
            assert f"'{title}'" in sql
        if err:
            assert f"'{err}'" in sql


# ---------------------------------------------------------------------------
# CID / Type0 with ToUnicode CMap
# ---------------------------------------------------------------------------


def test_pdf_cid_tounicode_pages_decode():
    """Type0/Identity-H text with subset-style (non-unicode) charcodes must
    decode through the /ToUnicode CMap — the reference warns on these
    pages; we extract them."""
    blob = docgen.make_pdf_cid(["Hello CID world!", "second page"])
    content, meta, warnings = bd.decode_pdf(blob)
    assert content == (
        "--- Page 1 ---\nHello CID world!\n\n--- Page 2 ---\nsecond page\n\n"
    )
    assert meta["PageCount"] == "2"
    assert warnings == []


def test_pdf_cid_uncompressed_and_bfrange():
    """Raw (non-Flate) CID stream; a text with a long consecutive run
    forces the bfrange path in the CMap parser."""
    blob = docgen.make_pdf_cid(["abcdefghij 0123456789"], compress=False)
    content, _, warnings = bd.decode_pdf(blob)
    assert "abcdefghij 0123456789" in content
    assert warnings == []


def test_pdf_cid_without_tounicode_still_warns():
    """A Type0 font with NO ToUnicode stream keeps the reference's
    degrade-to-warning behavior (codes are meaningless without a map...
    the latin-1 fallback yields control bytes that strip to nothing)."""
    import re as _re

    blob = docgen.make_pdf_cid(["abc"], compress=False)
    blob = _re.sub(rb"/ToUnicode \d+ 0 R", b"", blob)
    content, _, warnings = bd.decode_pdf(blob)
    assert content == "" or "abc" not in content


def test_pdf_mixed_simple_and_cid_fonts_switch_on_tf():
    """Two fonts on one page: /F1 simple (latin-1), /F2 CID — the scanner
    must switch decode mode at each Tf."""
    cid = docgen.make_pdf_cid(["XY"], compress=False)
    # splice a simple-font Tj before the CID text reusing F1's stream:
    # find the content stream and prepend a latin-1 segment under a
    # nonexistent font name (no CMap -> default decode)
    patched = cid.replace(
        b"BT\n/F1 12 Tf\n72 720 Td\n",
        b"BT\n/F9 12 Tf\n(plain!) Tj\n/F1 12 Tf\n72 720 Td\n",
    )
    content, _, _ = bd.decode_pdf(patched)
    assert "plain!" in content and "XY" in content


# ---------------------------------------------------------------------------
# EPUB (r7)
# ---------------------------------------------------------------------------


def test_epub_decodes_spine_in_order():
    blob = docgen.make_epub(
        [("One", ["alpha", "beta"]), ("Two", ["gamma & <delta>"])],
        title="T", author="a",
    )
    content, meta, warnings = bd.decode_epub(blob)
    assert content.split("\n") == [
        "--- Chapter 1 ---", "One", "alpha", "beta", "",
        "--- Chapter 2 ---", "Two", "gamma & <delta>", "",
    ]
    assert meta["Title"] == "T" and meta["Author"] == "a"
    assert meta["ChapterCount"] == "2" and warnings == []


def test_epub_missing_spine_item_warns_but_survives():
    import io as _io
    import zipfile as _zf

    blob = docgen.make_epub([("One", ["x"]), ("Two", ["y"])])
    buf_in = _io.BytesIO(blob)
    buf_out = _io.BytesIO()
    with _zf.ZipFile(buf_in) as src, _zf.ZipFile(buf_out, "w") as dst:
        for item in src.infolist():
            if item.filename != "OEBPS/ch2.xhtml":
                dst.writestr(item, src.read(item.filename))
    content, meta, warnings = bd.decode_epub(buf_out.getvalue())
    assert "--- Chapter 1 ---" in content and "x" in content
    assert any("missing" in w for w in warnings)
    assert meta["ChapterCount"] == "2"


def test_epub_corrupt_container_is_error_row_not_crash():
    content, n, meta, warnings, err = bd.decode_binary("/x/b.epub", b"PK\x03\x04junk")
    assert err is not None and content == ""
    # a zip missing container.xml degrades with a warning, no exception
    blob = docgen._zip_bytes({"mimetype": "application/epub+zip"})
    content, meta, warnings = bd.decode_epub(blob)
    assert content == "" and any("unreadable" in w for w in warnings)
