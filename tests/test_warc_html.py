"""WARC reader/writer + HTML extraction (sources/warc.py, operators/htmltext.py)."""

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connapse_spark.operators.htmltext import extract_html, extract_html_text
from connapse_spark.sources import warc


# ---------------------------------------------------------------------------
# pure-function layer
# ---------------------------------------------------------------------------


def test_record_roundtrip_plain_and_gz():
    recs = [
        warc.make_warc_record(
            "response",
            warc.make_http_response(200, b"<html><p>hi</p></html>"),
            target_uri="https://x.example/",
        ),
        warc.make_warc_record("warcinfo", b"k: v\r\n", content_type="application/warc-fields"),
    ]
    for gz in (False, True):
        blob = warc.make_warc(recs, gzip_members=gz)
        parsed = list(warc.iter_warc_records(blob))
        assert [h.get("warc-type") for h, _, _ in parsed] == ["response", "warcinfo"]
        assert all(w is None for _, _, w in parsed)
        status, hdrs, body = warc.split_http_response(parsed[0][1])
        assert status == 200
        assert hdrs["content-type"] == "text/html; charset=utf-8"
        assert body == b"<html><p>hi</p></html>"


def test_gzip_members_are_independent():
    # the CC layout property: each record decompresses on its own
    recs = [
        warc.make_warc_record("response", warc.make_http_response(200, bytes([i]) * 10),
                              target_uri=f"https://x/{i}")
        for i in range(3)
    ]
    blob = warc.make_warc(recs, gzip_members=True)
    # find the second member boundary by decompressing member-by-member
    first = gzip.decompress(blob)  # multi-member concat
    assert first == b"".join(recs)


def test_bad_content_length_skips_to_next_record():
    good = warc.make_warc_record("response", warc.make_http_response(200, b"ok"),
                                 target_uri="https://g/")
    bad = good.replace(b"Content-Length: ", b"Content-Length: NaN-", 1)
    blob = warc.make_warc([bad, good], gzip_members=False)
    parsed = list(warc.iter_warc_records(blob))
    assert len(parsed) == 1
    hdrs, payload, warning = parsed[0]
    assert hdrs["warc-target-uri"] == "https://g/"
    assert warning is not None and "Content-Length" in warning


def test_truncated_payload_yields_warning_and_stops():
    good = warc.make_warc_record("response", warc.make_http_response(200, b"0123456789"),
                                 target_uri="https://g/")
    parsed = list(warc.iter_warc_records(good[:-14]))
    assert len(parsed) == 1
    assert parsed[0][2] is not None and "truncated" in parsed[0][2]


def test_truncated_gzip_member_keeps_good_prefix():
    recs = [
        warc.make_warc_record("response", warc.make_http_response(200, b"a" * 100),
                              target_uri="https://a/"),
        warc.make_warc_record("response", warc.make_http_response(200, b"b" * 100),
                              target_uri="https://b/"),
    ]
    blob = warc.make_warc(recs, gzip_members=True)
    parsed = list(warc.iter_warc_records(blob[:-30]))  # cut inside member 2
    assert [h.get("warc-target-uri") for h, _, _ in parsed if h] >= ["https://a/"]


def test_charset_decode():
    assert warc.decode_text_payload("olé".encode("latin-1"),
                                    "text/html; charset=iso-8859-1") == "olé"
    assert warc.decode_text_payload("olé".encode(), "text/html") == "olé"
    assert warc.decode_text_payload(b"\xfa\xfb", "text/plain") == "úû"  # latin-1 fallback
    # \xff\xfe is a UTF-16 BOM, not latin-1 noise — BOM outranks everything
    assert warc.decode_text_payload(b"\xff\xfe", "text/plain") == ""
    assert warc.decode_text_payload(b"%PDF", "application/pdf") is None


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(min_size=0, max_size=80),
                  st.binary(min_size=0, max_size=200)),
        min_size=0, max_size=5,
    ),
    st.booleans(),
)
def test_property_writer_parser_roundtrip(pairs, gz):
    recs = [
        warc.make_warc_record("response", warc.make_http_response(200, body),
                              target_uri="https://e/" + uri.replace("\r", "").replace("\n", ""))
        for uri, body in pairs
    ]
    parsed = list(warc.iter_warc_records(warc.make_warc(recs, gzip_members=gz)))
    assert len(parsed) == len(recs)
    for (_, body_in), (hdrs, payload, warning) in zip(pairs, parsed):
        assert warning is None
        assert warc.split_http_response(payload)[2] == body_in


@given(
    st.binary(min_size=0, max_size=400),
    st.lists(st.integers(min_value=1, max_value=64), min_size=0, max_size=8),
    st.sampled_from([None, "gzip", "deflate"]),
    st.booleans(),
)
@settings(max_examples=120)
def test_property_http_encoding_roundtrip(body, chunk_sizes, ce, chunked):
    """Random bodies through random chunk boundaries and content codings
    must round-trip byte-exactly through split_http_response +
    decode_http_body, with no warning."""
    msg = warc.make_http_response(
        200, body, content_encoding=ce,
        chunk_sizes=chunk_sizes if chunked else None,
    )
    status, hdrs, wire = warc.split_http_response(msg)
    assert status == 200
    out, warn = warc.decode_http_body(hdrs, wire)
    assert warn is None
    assert out == body


def test_decode_http_body_edge_cases():
    # truncated chunked body keeps the good prefix + warns
    out, warn = warc._dechunk(b"5\r\nhello\r\n10\r\nshort")
    assert out == b"hello" + b"short" and "truncated" in warn
    # bad hex size line
    out, warn = warc._dechunk(b"zz\r\nx")
    assert out == b"" and "bad chunk size" in warn
    # chunk extension tokens are ignored
    out, warn = warc._dechunk(b"5;ext=1\r\nhello\r\n0\r\n\r\n")
    assert out == b"hello" and warn is None
    # bare-LF framing
    out, warn = warc._dechunk(b"3\nabc\n0\n\n")
    assert out == b"abc" and warn is None
    # raw-deflate (non-RFC but common) still inflates
    import zlib as _z
    comp = _z.compressobj(wbits=-15)
    raw = comp.compress(b"payload") + comp.flush()
    out, warn = warc._inflate(raw, "deflate")
    assert out == b"payload" and warn is None
    # garbage gzip degrades with a warning, bytes preserved
    out, warn = warc.decode_http_body({"content-encoding": "gzip"}, b"not gzip")
    assert out == b"not gzip" and "undecodable" in warn
    # truncated gzip keeps good prefix
    import gzip as _g, io as _io
    buf = _io.BytesIO()
    with _g.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(b"A" * 5000)
    out, warn = warc.decode_http_body(
        {"content-encoding": "gzip"}, buf.getvalue()[:-8])
    assert out.startswith(b"AAAA") and "truncated" in warn
    # TE list 'gzip, chunked' unwraps chunked first, then gzip
    msg = warc.make_http_response(200, b"te-stack", content_encoding="gzip",
                                  chunk_sizes=[4])
    status, hdrs, wire = warc.split_http_response(msg)
    hdrs = {"transfer-encoding": "gzip, chunked"}
    out, warn = warc.decode_http_body(hdrs, wire)
    assert out == b"te-stack" and warn is None
    # identity is a no-op token
    out, warn = warc.decode_http_body({"content-encoding": "identity"}, b"x")
    assert out == b"x" and warn is None


# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------


def test_extract_html_blocks_and_title():
    title, text = extract_html(
        "<html><head><title>  My   Page </title><style>p{x}</style></head>"
        "<body><nav><ul><li>Home</li></ul></nav>"
        "<article><h1>Head</h1><p>one\n  two</p><p>three</p></article>"
        "<script>var x = '<p>no</p>';</script>"
        "<footer>(c) nope</footer></body></html>"
    )
    assert title == "My Page"
    assert text == "Head\none two\nthree"


def test_extract_html_keeps_chrome_when_asked():
    _, text = extract_html(
        "<body><nav>Menu</nav><p>body</p></body>", boilerplate=False
    )
    assert text == "Menu\nbody"


def test_extract_html_entities_and_malformed():
    title, text = extract_html(
        "<title>a &amp; b</title><p>x &lt;tag&gt; &#233;</p><div>open"
    )
    assert title == "a & b"
    assert text == "x <tag> é\nopen"


def test_extract_html_svg_title_is_not_the_title():
    title, text = extract_html(
        "<svg><title>icon</title><text>glyph</text></svg><p>real</p><title>Page</title>"
    )
    assert title == "Page"
    assert text == "real"


def test_extract_html_empty_and_none():
    assert extract_html("") == (None, "")
    assert extract_html("<head><title></title></head>") == (None, "")


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300))
def test_property_extract_never_raises_and_never_leaks_tags(s):
    _, text = extract_html(s)
    if "<pre" in s.lower():
        return  # pre content is verbatim by contract — no collapse invariants
    # output never contains an unescaped script/style body marker
    assert "\r" not in text
    ascii_ws = " \t\n\r\f\x0b"
    for line in text.split("\n"):
        # the collapse contract is ASCII whitespace (NBSP etc. is content)
        assert line == line.strip(ascii_ws)
        assert "  " not in line


def test_extract_html_pre_is_verbatim():
    _, text = extract_html(
        "<p>before  x</p><pre>a  b\n  indented\tcode</pre><p>after</p>"
    )
    assert text == "before x\na  b\n  indented\tcode\nafter"
    # all-whitespace pre vanishes; nested tags inside pre don't flush
    _, t2 = extract_html("<pre>   \n </pre><pre>x<br>y<code>z</code></pre>")
    assert t2 == "xyz"


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def records_df(spark):
    blobs = spark.createDataFrame(warc.fixture_warc(), "path string, content binary")
    return warc.warc_records(blobs).cache()


def test_warc_records_df(records_df):
    rows = {(r.warc_file, r.record_idx): r for r in records_df.collect()}
    good = [r for (f, _), r in sorted(rows.items()) if f == "/fx/good.warc.gz"]
    assert [r.warc_type for r in good] == ["warcinfo", "request"] + ["response"] * 10
    html_rec = good[2]
    assert html_rec.http_status == 200
    assert "café &amp; more" in html_rec.text
    assert good[3].http_status == 404
    assert good[4].content_type == "application/pdf" and good[4].text is None
    assert good[5].text == "olé"  # declared latin-1 honored
    # no Content-Type header at all → html sniffed from the prolog
    assert good[6].content_type == "text/html" and "sniffed" in good[6].text
    # header lacks charset; the page's <meta charset> governs
    assert good[7].text == '<meta charset="iso-8859-1"><p>señor</p>'
    # chunked / gzip / chunked-gzip / deflate all decode to the plain twin
    for enc_rec in good[8:12]:
        assert enc_rec.text == html_rec.text and enc_rec.warning is None
    # plain layout parses identically
    plain = [r for (f, _), r in sorted(rows.items()) if f == "/fx/good.warc"]
    assert [r.warc_type for r in plain] == [r.warc_type for r in good]
    assert plain[2].text == html_rec.text
    # mixed: bad record skipped, warning lands on the next good record
    mixed = [r for (f, _), r in sorted(rows.items()) if f == "/fx/mixed.warc"]
    assert [r.http_status for r in mixed] == [200, 404]
    assert mixed[1].warning is not None
    # truncated: the one cut record surfaces with a warning
    trunc = [r for (f, _), r in sorted(rows.items()) if f == "/fx/trunc.warc"]
    assert len(trunc) == 1 and "truncated" in trunc[0].warning


def test_web_documents_projection(records_df):
    docs = warc.web_documents(records_df).collect()
    # html 200s only: the a.example page from good.gz/good/mixed, plus the
    # latin-1, sniffed, and meta-charset pages from each good layout
    urls = sorted(d.url for d in docs)
    assert urls == [
        "https://a.example/", "https://a.example/", "https://a.example/",
        "https://b.example/latin", "https://b.example/latin",
        "https://b.example/meta-charset", "https://b.example/meta-charset",
        "https://b.example/sniff", "https://b.example/sniff",
    ] + sorted(
        f"https://c.example/{s}"
        for s in ("chunked", "gzipped", "chunked-gzip", "deflated")
        for _ in range(2)  # both good layouts
    )


def test_extract_html_text_df(spark):
    df = spark.createDataFrame(
        [("d1", "<title>T1</title><nav>chrome</nav><p>alpha  beta</p>"),
         ("d2", "<p>solo</p>")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in extract_html_text(df, "text").collect()}
    assert out["d1"].title == "T1" and out["d1"].text == "alpha beta"
    assert out["d2"].title is None and out["d2"].text == "solo"


def test_warc_to_text_pipeline(spark):
    """End-to-end stage one: archive bytes → web_documents → extract."""
    blobs = spark.createDataFrame(
        [t for t in warc.fixture_warc() if t[0] == "/fx/good.warc.gz"],
        "path string, content binary",
    )
    docs = warc.web_documents(warc.warc_records(blobs))
    out = extract_html_text(docs, "text").orderBy("url").collect()
    assert [(r.url, r.title, r.text) for r in out] == [
        ("https://a.example/", "Tést", "café & more"),
        ("https://b.example/latin", None, "olé"),
        ("https://b.example/meta-charset", None, "señor"),
        ("https://b.example/sniff", None, "sniffed"),
        # the four payload-coded twins of the a.example page
        ("https://c.example/chunked", "Tést", "café & more"),
        ("https://c.example/chunked-gzip", "Tést", "café & more"),
        ("https://c.example/deflated", "Tést", "café & more"),
        ("https://c.example/gzipped", "Tést", "café & more"),
    ]


def test_parse_warc_oracle_constants():
    """The pinned literals in __spark_entry__._sql_parse_warc must equal the
    pure parser's outputs over the fixture bytes (regeneration recipe: print
    the rows this test computes)."""
    import hashlib

    import duckdb

    import __spark_entry__ as entry

    expected = []
    for path, blob in warc.fixture_warc():
        for i, (h, payload, w) in enumerate(warc.iter_warc_records(blob)):
            wtype = h.get("warc-type")
            status, hh, body = (None, {}, payload)
            if wtype in ("response", "revisit"):
                status, hh, body = warc.split_http_response(payload)
                if status is not None:
                    body, enc_warn = warc.decode_http_body(hh, body)
                    if enc_warn:
                        w = f"{w}; {enc_warn}" if w else enc_warn
            ct = hh.get("content-type") or (
                None if wtype in ("response", "revisit") else h.get("content-type")
            )
            if ct is None and wtype == "response" and body:
                ct = warc.sniff_content_type(body)
            text = warc.decode_text_payload(body, ct) if wtype == "response" else None
            expected.append((
                path, i, wtype, h.get("warc-target-uri"), status, ct,
                hashlib.sha256(body).hexdigest()[:16],
                hashlib.sha256(text.encode()).hexdigest()[:16] if text is not None else None,
                w is not None,
            ))
    expected.sort(key=lambda r: (r[0], r[1]))
    got = duckdb.connect().execute(entry._sql_parse_warc()).fetchall()
    assert [tuple(r) for r in got] == expected


def test_parse_documents_auto_routes_all_kinds(spark):
    from connapse_spark.sources import docgen, parsers

    rows = [
        ("/a/page.html", b"<title>T</title><nav>chrome</nav><p>body  text</p>"),
        ("/a/plain.txt", b"plain"),
        ("/a/prog.exe", b"MZ"),
        ("/a/notes.docx", dict(docgen.fixture_corpus())["/fx/notes.docx"]),
        ("/a/bad.html", "olé".encode("latin-1")),  # broken utf-8 → fallback
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r.path: r for r in parsers.parse_documents_auto(df).collect()}
    assert out["/a/page.html"].content == "body text"
    assert dict(out["/a/page.html"].metadata) == {"Title": "T"}
    assert out["/a/plain.txt"].content == "plain"
    assert out["/a/prog.exe"].parse_error == "UnsupportedFormat"
    assert out["/a/notes.docx"].metadata["Title"] == "Notes"
    assert out["/a/bad.html"].content == "olé"
    assert any("latin-1" in w for w in out["/a/bad.html"].warnings)
    # the P4 kind column routes .html distinctly from text
    kinds = df.select(
        "path", parsers.parser_kind_expr(parsers.F.col("path")).alias("k")
    ).collect()
    assert {r.path: r.k for r in kinds}["/a/page.html"] == "html"


def test_parse_html_bom_and_meta_charset(spark):
    """A UTF-8-BOM file must not leak \\ufeff into the text, and a
    latin-1 file with a declared <meta charset> must decode through the
    declaration (the WARC decode path, reused) with no fallback warning."""
    from connapse_spark.sources import parsers

    rows = [
        ("/a/bom.html", b"\xef\xbb\xbf<title>B</title><p>bom body</p>"),
        ("/a/meta.html", '<meta charset="iso-8859-1"><p>señor</p>'.encode("latin-1")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r.path: r for r in parsers.parse_html_documents(df).collect()}
    assert out["/a/bom.html"].content == "bom body"
    assert "﻿" not in out["/a/bom.html"].content
    assert out["/a/meta.html"].content == "señor"
    assert list(out["/a/meta.html"].warnings) == []


def test_export_warc_shards_roundtrip(spark):
    df = spark.createDataFrame(
        [(f"https://e/{i}", f"<p>doc {i} café</p>") for i in range(20)],
        "url string, text string",
    )
    shards = warc.export_warc_shards(df, n_shards=4).collect()
    assert sum(s.n_records for s in shards) == 20
    assert all(bytes(s.content)[:2] == b"\x1f\x8b" for s in shards if s.n_records)
    back = warc.warc_records(
        spark.createDataFrame(
            [(str(s.shard), s.content) for s in shards], "path string, content binary"
        )
    )
    rows = warc.web_documents(back).orderBy("url").collect()
    assert [(r.url, r.text) for r in rows] == sorted(
        (f"https://e/{i}", f"<p>doc {i} café</p>") for i in range(20)
    )


# --- regressions from the round-6 review -----------------------------------


def test_extract_html_unclosed_head_does_not_swallow_body():
    # </head> is optional in HTML5 — flow content implicitly closes head
    title, text = extract_html(
        "<html><head><title>T</title><body><p>hello world</p></body></html>"
    )
    assert title == "T" and text == "hello world"
    # no <body> tag either: the first non-head element closes head
    title, text = extract_html("<head><title>T</title><p>still here</p>")
    assert title == "T" and text == "still here"
    # head-legal elements do NOT close it
    title, text = extract_html(
        '<head><meta charset="utf-8"><title>T</title><style>x{}</style><p>b</p>'
    )
    assert title == "T" and text == "b"


def test_split_http_response_lf_headers_crlf_in_body():
    status, hdrs, body = warc.split_http_response(
        b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<p>a</p>\r\n\r\n<p>b</p>"
    )
    assert status == 200
    assert body == b"<p>a</p>\r\n\r\n<p>b</p>"


def test_split_http_response_truncated_before_blank_line_keeps_bytes():
    raw = b"HTTP/1.1 200 OK\r\nContent-Type: text/ht"
    status, hdrs, body = warc.split_http_response(raw)
    assert status is None and body == raw


def test_web_documents_keeps_intact_record_after_corrupt_neighbor(spark):
    good = warc.make_warc_record(
        "response",
        warc.make_http_response(200, b"<p>fine</p>"),
        target_uri="https://g/after-bad",
    )
    bad = good.replace(b"Content-Length: ", b"Content-Length: NaN-", 1)
    blob = warc.make_warc([bad, good], gzip_members=False)
    df = spark.createDataFrame([("/fx/x.warc", blob)], "path string, content binary")
    recs = warc.warc_records(df).collect()
    assert len(recs) == 1
    assert recs[0].warning.startswith(warc.PRIOR_WARNING_PREFIX)
    kept = warc.web_documents(warc.warc_records(df)).collect()
    assert [r.url for r in kept] == ["https://g/after-bad"]


def test_pagerank_empty_edges_returns_empty(spark):
    from connapse_spark.operators import links

    df = spark.createDataFrame([], "src string, dst string")
    assert links.pagerank(df, n_iter=3).collect() == []


def test_extract_html_nbsp_is_content():
    # NBSP must not be collapsed or stripped (the oracle's RE2 class can't
    # see it, so the extractor must not either)
    _, text = extract_html("<p>a  b</p>")
    assert text == "a  b"


def test_wet_export_roundtrip(spark):
    df = spark.createDataFrame(
        [(f"https://e/{i}", f"text {i}\nwith\nnewlines  kept") for i in range(10)],
        "url string, text string",
    )
    shards = warc.export_warc_shards(df, n_shards=3, conversion=True)
    back = warc.warc_records(
        shards.select(shards.shard.cast("string").alias("path"), "content")
    )
    rows = warc.wet_documents(back).orderBy("url").collect()
    assert [(r.url, r.text) for r in rows] == sorted(
        (f"https://e/{i}", f"text {i}\nwith\nnewlines  kept") for i in range(10)
    )
    # conversion records are invisible to the html projection and vice versa
    assert warc.web_documents(back).count() == 0


def test_extract_html_edge_nbsp_preserved():
    # edge NBSP is content: the ASCII-only strip must keep it, matching
    # the oracle's space-only trim
    _, text = extract_html("<p>\xa0a\xa0</p>")
    assert text == "\xa0a\xa0"
    _, t2 = extract_html("<p>\xa0</p>")
    assert t2 == "\xa0"


def test_extract_html_bare_text_after_title_closes_head():
    title, text = extract_html("<html><head><title>T</title>hello world<p>x</p>")
    assert title == "T"
    assert text == "hello world\nx"
    # whitespace-only data does NOT close head
    title, text = extract_html("<head><title>T</title>  \n <meta x='1'><p>b</p>")
    assert (title, text) == ("T", "b")


def test_record_split_across_gzip_members_parses():
    # members need not align with record boundaries — the buffered parser
    # must reassemble a record whose bytes span two members
    import io

    rec = warc.make_warc_record(
        "response", warc.make_http_response(200, b"x" * 300),
        target_uri="https://span/",
    )
    half = len(rec) // 2
    out = io.BytesIO()
    for part in (rec[:half], rec[half:]):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(part)
        out.write(buf.getvalue())
    parsed = list(warc.iter_warc_records(out.getvalue()))
    assert len(parsed) == 1
    hdrs, payload, warning = parsed[0]
    assert hdrs["warc-target-uri"] == "https://span/" and warning is None
    assert warc.split_http_response(payload)[2] == b"x" * 300


def test_many_member_archive_streams():
    recs = [
        warc.make_warc_record("response", warc.make_http_response(200, bytes([65 + i % 26]) * 50),
                              target_uri=f"https://m/{i}")
        for i in range(200)
    ]
    parsed = list(warc.iter_warc_records(warc.make_warc(recs, gzip_members=True)))
    assert len(parsed) == 200
    assert all(w is None for _, _, w in parsed)


def test_extract_html_full_meta_signals():
    from connapse_spark.operators.htmltext import extract_html_full, meta_noindex

    html = (
        '<head><title>T</title>'
        '<link rel="canonical" href=" https://c.example/x ">'
        '<meta name="robots" content="NOINDEX, nofollow">'
        '<meta name="description" content="a page">'
        '<meta property="og:title" content="OG T">'
        '<link rel="canonical" href="https://second/ignored">'
        '</head><body><p>b</p></body>'
    )
    title, text, meta = extract_html_full(html)
    assert (title, text) == ("T", "b")
    assert meta["canonical"] == "https://c.example/x"  # first wins, trimmed
    assert meta["og:title"] == "OG T"
    assert meta_noindex(meta) is True
    assert meta_noindex({"robots": "index, follow"}) is False
    assert meta_noindex({}) is False
    assert meta_noindex({"robots": "none"}) is True
    # meta inside a dropped subtree is ignored
    _, _, m2 = extract_html_full('<svg><meta name="robots" content="noindex"></svg><p>x</p>')
    assert m2 == {}


def test_extract_html_meta_df(spark):
    from connapse_spark.operators.htmltext import extract_html_meta

    df = spark.createDataFrame(
        [("d1", '<link rel="canonical" href="https://c/1"><meta name="robots" '
                'content="noindex"><p>body</p>'),
         ("d2", "<p>plain</p>")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in extract_html_meta(df, "text").collect()}
    assert out["d1"].canonical == "https://c/1" and out["d1"].noindex is True
    assert out["d2"].canonical is None and out["d2"].noindex is False
    assert out["d2"].text == "plain"


def test_meta_robots_union_and_rel_token_list():
    from connapse_spark.operators.htmltext import extract_html_full, meta_noindex

    # a later noindex still bites (crawlers union directives across tags)
    _, _, m = extract_html_full(
        '<meta name="robots" content="index, follow">'
        '<meta name="robots" content="noindex"><p>b</p>'
    )
    assert meta_noindex(m) is True
    # rel is a token list; whitespace-only href never claims the slot
    _, _, m2 = extract_html_full(
        '<link rel="canonical alternate" href="https://a/"><p>x</p>'
    )
    assert m2["canonical"] == "https://a/"
    _, _, m3 = extract_html_full(
        '<link rel="canonical" href="  ">'
        '<link rel="canonical" href="https://real/"><p>x</p>'
    )
    assert m3["canonical"] == "https://real/"
    # duplicated attributes: HTML keeps the FIRST
    _, _, m4 = extract_html_full(
        '<meta name="robots" content="noindex" content="index"><p>x</p>'
    )
    assert meta_noindex(m4) is True


def test_sniff_content_type():
    assert warc.sniff_content_type(b"%PDF-1.7 ...") == "application/pdf"
    assert warc.sniff_content_type(b"\x89PNG\r\n\x1a\nxxx") == "image/png"
    assert warc.sniff_content_type(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
    assert warc.sniff_content_type(b"  <!DOCTYPE HTML><html>") == "text/html"
    assert warc.sniff_content_type(b"<title>x</title>") == "text/html"
    assert warc.sniff_content_type(b"random bytes \x00\x01") is None
    assert warc.sniff_content_type(b"") is None


def test_meta_charset_prescan():
    body = '<meta charset="iso-8859-1"><p>señor</p>'.encode("latin-1")
    assert warc.decode_text_payload(body, "text/html") == body.decode("latin-1")
    # a declared header charset outranks the meta prescan
    assert warc.decode_text_payload(
        "ü".encode("utf-8"), "text/html; charset=utf-8"
    ) == "ü"
    # meta charset only applies to html content types
    assert warc.decode_text_payload(b"charset=iso-8859-1 \xc3\xbc", "text/plain") \
        == "charset=iso-8859-1 ü"


def test_sniff_bom_and_leading_comment():
    assert warc.sniff_content_type(b"\xef\xbb\xbf<!DOCTYPE html><p>x") == "text/html"
    assert warc.sniff_content_type(b"<!-- banner --><html>") == "text/html"
    assert warc.sniff_content_type(b"<!-- a --><!-- b -->\n<title>t") == "text/html"


def test_decode_bom_outranks_everything():
    body = "﻿café".encode("utf-8")  # utf-8 BOM + utf-8 text
    # even a (wrong) latin-1 header loses to the BOM
    assert warc.decode_text_payload(body, "text/html; charset=iso-8859-1") == "café"
    b16 = "olé".encode("utf-16")  # carries the utf-16 BOM
    assert warc.decode_text_payload(b16, "text/html") == "olé"


def test_meta_prescan_is_attribute_aware():
    # charset mentioned inside a description must NOT govern decoding
    body = (b'<meta name="description" content="how to set charset=iso-8859-1">'
            b"<p>caf\xc3\xa9</p>")
    assert warc.decode_text_payload(body, "text/html") == \
        '<meta name="description" content="how to set charset=iso-8859-1"><p>café</p>'
    # but http-equiv content-type's content DOES
    body2 = (b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
             b"<p>caf\xe9</p>")
    out = warc.decode_text_payload(body2, "text/html")
    assert out.endswith("<p>café</p>")


def test_prescan_wave5_guards():
    # utf-16 prescan declarations remap to utf-8 (the WHATWG guard)
    body = b'<meta charset="utf-16"><p>hello worlds</p>'
    assert warc.decode_text_payload(body, "text/html") == body.decode("utf-8")
    # commented-out metas don't govern decoding
    body2 = b'<!-- <meta charset="iso-8859-1"> --><p>caf\xc3\xa9</p>'
    assert warc.decode_text_payload(body2, "text/html").endswith("<p>café</p>")
    # a dangling header 'charset=' falls through to the prescan
    sj = '<meta charset="shift_jis"><p>こんにちは</p>'.encode("shift_jis")
    assert warc.decode_text_payload(sj, "text/html; charset=") \
        == sj.decode("shift_jis")


def test_warc_records_extra_cols_order(spark):
    blobs = spark.createDataFrame(
        [("/f.warc", warc.make_warc(
            [warc.make_warc_record("response", warc.make_http_response(200, b"x"),
                                   target_uri="https://a/")], gzip_members=False),
          7, "m1")],
        "path string, content binary, length long, tag string",
    )
    # extra order deliberately differs from the file schema order
    rows = warc.warc_records(blobs, extra_cols=["tag", "length"]).collect()
    assert rows[0].tag == "m1" and rows[0].length == 7


def test_html_lang_attribute_captured():
    from connapse_spark.operators.htmltext import extract_html_full

    _, _, m = extract_html_full('<html lang="en-GB"><p>x</p></html>')
    assert m["lang"] == "en-GB"
    _, _, m2 = extract_html_full('<html><p>no lang</p></html>')
    assert "lang" not in m2
    # first html tag wins; blank lang ignored
    _, _, m3 = extract_html_full('<html lang=" "><html lang="fr"><p>x</p>')
    assert m3["lang"] == "fr"


def test_warc_images_oracle_constants():
    """Pinned literals in _sql_warc_images == parse+decode over the fixture."""
    import duckdb

    import __spark_entry__ as entry
    from connapse_spark.operators.multimodal import _average_hash, decode_image_array

    expected = []
    for _, blob in warc.fixture_warc_images():
        for h, payload, _w in warc.iter_warc_records(blob):
            _, _, body = warc.split_http_response(payload)
            arr, err = decode_image_array(bytes(body))
            if arr is not None:
                luma = float(
                    (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                     + 0.114 * arr[:, :, 2]).mean() / 255.0
                )
                expected.append((h["warc-target-uri"], arr.shape[1], arr.shape[0],
                                 round(luma, 9), _average_hash(arr), None))
            else:
                expected.append((h["warc-target-uri"], 0, 0, 0.0, "", err))
    expected.sort()
    got = duckdb.connect().execute(entry._sql_warc_images()).fetchall()
    assert [tuple(r) for r in got] == expected


def test_html_adversarial_constants():
    """The pinned literals in __spark_entry__._sql_html_adversarial must
    equal the pure pipeline's outputs over the adversarial fixture
    (regeneration recipe: print the rows this test computes)."""
    import duckdb

    import __spark_entry__ as entry
    from connapse_spark.operators.htmltext import (
        extract_html_full, fixture_adversarial_pages, meta_noindex,
    )

    expected = []
    for case, raw, ct in fixture_adversarial_pages():
        rec = warc.make_warc_record(
            "response", warc.make_http_response(200, raw, content_type=ct),
            target_uri=f"https://adv.example/{case}",
        )
        (h, payload, w), = warc.iter_warc_records(warc.make_warc([rec]))
        status, hh, body = warc.split_http_response(payload)
        body, enc_warn = warc.decode_http_body(hh, body)
        assert status == 200 and enc_warn is None
        text = warc.decode_text_payload(body, hh.get("content-type"))
        t, x, m = extract_html_full(text)
        expected.append((case, t, x, m.get("canonical"), meta_noindex(m),
                         m.get("description"), m.get("lang")))
    expected.sort()
    got = duckdb.connect().execute(entry._sql_html_adversarial()).fetchall()
    assert [tuple(r) for r in got] == expected


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=150)
def test_property_arbitrary_bytes_never_raise(raw):
    """Byte-level mutations (VERDICT r6 ask #4): ANY byte string through
    decode → extract must produce a string, never an exception — the
    100 TB contract for undamaged task execution on damaged data."""
    from connapse_spark.operators.htmltext import extract_html_full

    text = warc.decode_text_payload(raw, "text/html")
    title, x, meta = extract_html_full(text)
    assert isinstance(x, str)
    assert title is None or isinstance(title, str)


def test_redirect_edges(spark):
    recs = [
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                301, b"", reason="Moved Permanently",
                extra_headers={"Location": "https://new.example/home"},
            ),
            target_uri="https://old.example/",
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                302, b"", reason="Found", extra_headers={"Location": "../up"},
            ),
            target_uri="https://a.example/d/e",
        ),
        # no Location header → no edge
        warc.make_warc_record(
            "response", warc.make_http_response(303, b"", reason="See Other"),
            target_uri="https://c.example/",
        ),
        # mailto Location → dropped (non-http scheme)
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                301, b"", extra_headers={"Location": "mailto:x@y"}),
            target_uri="https://d.example/",
        ),
        warc.make_warc_record(
            "response", warc.make_http_response(200, b"<p>ok</p>"),
            target_uri="https://ok.example/",
        ),
    ]
    blobs = spark.createDataFrame(
        [("/fx/r.warc.gz", warc.make_warc(recs))], "path string, content binary"
    )
    edges = warc.redirect_edges(warc.warc_records(blobs)).orderBy("src").collect()
    assert [(r.src, r.dst, r.http_status) for r in edges] == [
        ("https://a.example/d/e", "https://a.example/up", 302),
        ("https://old.example/", "https://new.example/home", 301),
    ]


def test_inflate_multi_member_gzip_body():
    # server/CDN restreaming concatenates gzip members — all must decode
    import gzip as _g, io as _io

    def gz(b):
        buf = _io.BytesIO()
        with _g.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    out, warn = warc._inflate(gz(b"hello ") + gz(b"world"), "gzip")
    assert out == b"hello world" and warn is None
    # trailing garbage after a good member keeps the good part + warns
    out, warn = warc._inflate(gz(b"good") + b"\x00garbage", "gzip")
    assert out == b"good" and "garbage" in warn


def test_declared_latin1_is_not_a_fallback_warning(spark):
    from connapse_spark.sources import parsers

    rows = [("/a/declared.html",
             '<meta charset="latin-1"><p>olé</p>'.encode("latin-1"))]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = parsers.parse_html_documents(df).collect()[0]
    assert out.content == "olé"
    assert list(out.warnings) == []  # decoded BY DECLARATION, no fallback


def test_resolve_revisits_digest_uri_and_unresolvable(spark):
    head_only = b"HTTP/1.1 200 OK\r\n\r\n"
    recs = [
        warc.make_warc_record(
            "response", warc.make_http_response(200, b"<p>one</p>"),
            target_uri="https://a/1",
            extra_headers={"WARC-Payload-Digest": "sha1:X"},
        ),
        # a SECOND response with the same digest: ties resolve to the
        # deterministic first capture
        warc.make_warc_record(
            "response", warc.make_http_response(200, b"<p>dup</p>"),
            target_uri="https://a/1-dup",
            extra_headers={"WARC-Payload-Digest": "sha1:X"},
        ),
        warc.make_warc_record(
            "revisit", head_only, target_uri="https://a/1-again",
            extra_headers={"WARC-Payload-Digest": "sha1:X"},
        ),
        warc.make_warc_record(
            "revisit", head_only, target_uri="https://a/by-uri",
            extra_headers={"WARC-Refers-To-Target-URI": "https://a/1"},
        ),
        warc.make_warc_record(
            "revisit", head_only, target_uri="https://a/orphan",
            extra_headers={"WARC-Payload-Digest": "sha1:NOPE"},
        ),
    ]
    blobs = spark.createDataFrame(
        [("/fx/v.warc.gz", warc.make_warc(recs))], "path string, content binary"
    )
    rows = {r.url: r for r in warc.resolve_revisits(warc.warc_records(blobs)).collect()}
    assert rows["https://a/1"].was_revisit is False
    assert rows["https://a/1-again"].text == "<p>one</p>"          # digest, first capture
    assert rows["https://a/1-again"].source_url == "https://a/1"
    assert rows["https://a/by-uri"].text == "<p>one</p>"           # uri fallback
    assert rows["https://a/orphan"].text is None                   # kept, not dropped
    assert rows["https://a/orphan"].was_revisit is True


def test_resolve_revisits_parses_archives_once(spark):
    """r8 (VERDICT r7 'what's wrong' #4): the 4×-referenced records plan
    must scan the SOURCE once — resolve_revisits persists a lazy input
    before branching. The source rides through a counting mapInPandas;
    the accumulator must equal the partition count, not 4×."""
    recs = [
        warc.make_warc_record(
            "response", warc.make_http_response(200, b"<p>one</p>"),
            target_uri="https://a/1",
            extra_headers={"WARC-Payload-Digest": "sha1:X"},
        ),
        warc.make_warc_record(
            "revisit", b"HTTP/1.1 200 OK\r\n\r\n", target_uri="https://a/1-again",
            extra_headers={"WARC-Payload-Digest": "sha1:X"},
        ),
    ]
    blobs = spark.createDataFrame(
        [("/fx/once.warc.gz", warc.make_warc(recs))], "path string, content binary"
    ).coalesce(1)
    scans = spark.sparkContext.accumulator(0)

    def _count(batches):
        scans.add(1)
        yield from batches

    counted = blobs.mapInPandas(_count, blobs.schema)
    out = warc.resolve_revisits(warc.warc_records(counted))
    assert out.count() == 2
    assert scans.value == 1, f"source scanned {scans.value}x, want 1"


def test_resolve_revisits_respects_caller_persist(spark):
    """A pre-persisted records frame must NOT be re-persisted (the caller
    owns storage); assume_materialized opts out entirely."""
    recs = [
        warc.make_warc_record(
            "response", warc.make_http_response(200, b"<p>one</p>"),
            target_uri="https://a/1",
            extra_headers={"WARC-Payload-Digest": "sha1:X"},
        ),
    ]
    blobs = spark.createDataFrame(
        [("/fx/p.warc.gz", warc.make_warc(recs))], "path string, content binary"
    )
    records = warc.warc_records(blobs).persist()
    try:
        lvl_before = records.storageLevel
        assert warc.resolve_revisits(records).count() == 1
        assert records.storageLevel == lvl_before
    finally:
        records.unpersist()
    # opt-out leaves a lazy frame lazy (storageLevel lookups resolve via
    # the CacheManager by PLAN equality, so this runs after the unpersist)
    lazy = warc.warc_records(blobs)
    assert warc.resolve_revisits(lazy, assume_materialized=True).count() == 1
    from pyspark.storagelevel import StorageLevel
    assert lazy.storageLevel == StorageLevel.NONE


def test_header_noindex_scoping_and_folding():
    hn = warc.header_noindex
    assert hn("noindex") is True
    assert hn("none", "anybot") is True
    assert hn("nofollow, nosnippet") is False
    # bot-scoped directives bind only the named crawler
    assert hn("googlebot: noindex", "googlebot") is True
    assert hn("googlebot: noindex", "ccbot") is False
    assert hn("googlebot: noindex") is False
    # the scope is sticky across the comma list until a new prefix
    assert hn("googlebot: nofollow, noindex", "googlebot") is True
    assert hn("googlebot: nofollow, noindex", "ccbot") is False
    # value-carrying directives are not bot prefixes
    assert hn("max-snippet: 20, noindex") is True
    assert hn("max-snippet: 20, nofollow") is False
    assert hn("unavailable_after: 2030-01-01, nofollow") is False
    assert hn(None) is False and hn("") is False


def test_split_http_response_folds_repeated_headers():
    msg = (b"HTTP/1.1 200 OK\r\nX-Robots-Tag: nofollow\r\n"
           b"X-Robots-Tag: noindex\r\nContent-Type: text/html\r\n\r\nbody")
    status, hdrs, body = warc.split_http_response(msg)
    # list-typed repeats fold with '\n' so occurrence boundaries survive
    assert hdrs["x-robots-tag"] == "nofollow\nnoindex"
    assert warc.header_noindex(hdrs["x-robots-tag"]) is True


def test_extract_main_text_density_rules():
    from connapse_spark.operators.htmltext import extract_main_text

    nav = '<div><a href="1">Home</a> | <a href="2">News</a></div>'
    prose = "<p>A real paragraph of article prose that stands on its own.</p>"
    related = '<div>More: <a href="3">one</a> <a href="4">two</a></div>'
    title, text = extract_main_text(f"<title>T</title>{nav}{prose}{related}")
    assert title == "T"
    assert text == "A real paragraph of article prose that stands on its own."
    # a LONG link-heavy block survives below the long-block ceiling
    long_mixed = (
        "<p>" + "Substantial sentence with context. " * 4
        + '<a href="x">a supporting citation link here</a></p>'
    )
    _, kept = extract_main_text(long_mixed)
    assert "Substantial sentence" in kept
    # wholly-linked long block (a link list) still drops
    farm = "<p>" + " ".join(f'<a href="{i}">item number {i} in the farm</a>'
                            for i in range(12)) + "</p>"
    _, kept = extract_main_text(farm)
    assert kept == ""
    # chrome tags still strip first (density runs on top)
    _, kept = extract_main_text("<nav>Menu</nav><p>body</p>")
    assert kept == "body"
    assert extract_main_text("") == (None, "")


def test_singleton_headers_keep_last_wins_foldables_fold():
    # duplicated singletons (proxy + origin) must NOT fold — 'gzip, gzip'
    # would break the decoder and a folded Content-Type breaks charset
    msg = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
           b"Content-Encoding: gzip\r\nContent-Type: text/plain\r\n"
           b"Content-Type: text/html; charset=utf-8\r\n\r\nx")
    _, hdrs, _ = warc.split_http_response(msg)
    assert hdrs["content-encoding"] == "gzip"
    assert hdrs["content-type"] == "text/html; charset=utf-8"
    # and the whole decode path survives a double-header gzip capture
    body_msg = warc.make_http_response(200, b"<p>ok</p>", content_encoding="gzip")
    head, body = body_msg.split(b"\r\n\r\n", 1)
    head += b"\r\nContent-Encoding: gzip"  # duplicate of the same value
    _, hdrs, wire = warc.split_http_response(head + b"\r\n\r\n" + body)
    out, warn = warc.decode_http_body(hdrs, wire)
    assert out == b"<p>ok</p>" and warn is None


def test_header_noindex_scope_resets_per_occurrence():
    # 'googlebot: noindex' in one header + a blanket 'noindex' in ANOTHER:
    # the blanket one binds every crawler (scope must not leak across the
    # fold boundary)
    msg = (b"HTTP/1.1 200 OK\r\nX-Robots-Tag: googlebot: noindex\r\n"
           b"X-Robots-Tag: noindex\r\n\r\nx")
    _, hdrs, _ = warc.split_http_response(msg)
    assert warc.header_noindex(hdrs["x-robots-tag"], "ccbot") is True
    # whereas within ONE occurrence the scope stays sticky
    assert warc.header_noindex("googlebot: nofollow, noindex", "ccbot") is False


def test_main_text_survives_unclosed_anchor_soup():
    from connapse_spark.operators.htmltext import extract_main_text

    soup = ('<div><a href="/more">read more</div>'
            "<p>First paragraph of the article, long and prose-like.</p>"
            "<p>Second paragraph continues here.</p>")
    _, text = extract_main_text(soup)
    assert "First paragraph" in text and "Second paragraph" in text
    assert "read more" not in text  # the link block itself still drops


# ---------------------------------------------------------------------------
# CDX capture index (r8)
# ---------------------------------------------------------------------------


def _cdx_fresh_facts():
    """Recompute the raw CDX facts from the fixture bytes with the pure
    located parser — the regeneration source for _CDX_PINNED_ROWS."""
    import hashlib

    rows = []
    for path, blob in warc.fixture_warc_cdx():
        for h, payload, _w, off, ln in warc.iter_warc_records_located(bytes(blob)):
            wtype = h.get("warc-type")
            if wtype not in ("response", "revisit"):
                continue
            status, hh, body = warc.split_http_response(payload)
            if status is not None:
                body, _enc = warc.decode_http_body(hh, body)
            mime = (hh.get("content-type") or "").split(";")[0].strip().lower() or None
            if wtype == "revisit":
                mime = "warc/revisit"
            rows.append((
                path, off, ln, h.get("warc-target-uri"), h.get("warc-date"),
                status, mime, h.get("warc-payload-digest"),
                hashlib.sha256(body).hexdigest()[:16],
            ))
    return rows


def test_cdx_oracle_constants():
    """The pinned raw facts in __spark_entry__._CDX_PINNED_ROWS must equal
    the pure located parser's outputs over the fixture bytes (regeneration
    recipe: print the rows this test computes)."""
    import __spark_entry__ as entry

    def _frag(v):
        return "NULL" if v is None else f"'{v}'"

    fresh = [
        (p, off, ln, u, d, s, _frag(m), _frag(dg), ps)
        for p, off, ln, u, d, s, m, dg, ps in _cdx_fresh_facts()
    ]
    assert fresh == entry._CDX_PINNED_ROWS


def test_cdx_offsets_seek_roundtrip():
    """THE property a CDX index exists for: seeking blob[offset:offset+length]
    out of the archive re-yields exactly the addressed record — the gzip CC
    layout through one member gunzip, plain archives byte-directly."""
    for path, blob in warc.fixture_warc_cdx():
        for h, payload, _w, off, ln in warc.iter_warc_records_located(bytes(blob)):
            if h.get("warc-type") not in ("response", "revisit"):
                continue
            span = blob[off : off + ln]
            raw = gzip.decompress(span) if blob[:2] == b"\x1f\x8b" else span
            recs = list(warc.iter_warc_records(raw))
            assert len(recs) == 1, (path, off)
            h2, p2, _w2 = recs[0]
            assert h2.get("warc-target-uri") == h.get("warc-target-uri")
            if "trunc" not in path:  # the truncated span is the good prefix
                assert p2 == payload, (path, off)


def test_iter_warc_spans_default_path_unchanged():
    """with_spans=False must yield byte-identical triples to the spanned
    walk's first three elements on every fixture, including the corrupt
    and truncated ones (the _emit refactor is behavior-neutral)."""
    for _path, blob in warc.fixture_warc_cdx():
        plain = list(warc.iter_warc_records(blob))
        spanned = list(warc.iter_warc_records(blob, with_spans=True))
        assert [t[:3] for t in spanned] == plain
        for *_t, off, ln in spanned:
            assert off >= 0 and ln >= 0


def test_surt_key_parity(spark):
    """web.surt_key_expr (Spark) == sql_surt_key (DuckDB) == the pinned
    expected keys on the canonicalization corners."""
    import duckdb
    from pyspark.sql import functions as F

    from connapse_spark.operators.web import sql_surt_key, surt_key_expr

    expected = {
        "https://www.Example.COM:8443/A/b?b=2&utm_source=x&a=1":
            "com,example:8443)/a/b?a=1&b=2",
        "http://example.com:80/": "com,example)/",
        "https://www2.News.example/Path/": "example,news)/path/",
        "https://www.com/x": "com,www)/x",
        "https://a.example/": "example,a)/",
        "http://example.com/?utm_source=z": "com,example)/",
        "https://x.example:443/q?Z=1&A=2": "example,x)/q?a=2&z=1",
        "ftp://Files.example.org:21/Pub": "org,example,files)/pub",
    }
    sdf = spark.createDataFrame([(u,) for u in expected], "url string")
    got_spark = {
        r["url"]: r["k"]
        for r in sdf.select("url", surt_key_expr(F.col("url")).alias("k")).collect()
    }
    assert got_spark == expected
    vals = ", ".join(f"('{u}')" for u in expected)
    got_duck = dict(duckdb.sql(
        f"WITH t(url) AS (VALUES {vals}) SELECT url, {sql_surt_key('url')} FROM t"
    ).fetchall())
    assert got_duck == expected


def test_cdx_write_lookup_prunes_files(spark, tmp_path):
    """The serving composition: cdx_index → urlkey-range-clustered snapshot
    commit → point lookup opens only the covering file(s) and returns the
    url's captures in timestamp order."""
    from connapse_spark.sources import snapshots

    blobs = spark.createDataFrame(warc.fixture_warc_cdx(), "path string, content binary")
    idx = warc.cdx_index(blobs, sort=False)  # the clustered write IS the sort
    tdir = str(tmp_path / "cdx")
    v = warc.write_cdx_table(idx, tdir, n_files=4)
    m = snapshots.load_manifest(tdir, v)
    n_total = len(m["files"])
    assert n_total > 1  # pruning needs something to prune
    # the key of this url ('example,a)/') has captures in 4 archives
    got = warc.cdx_lookup(spark, tdir, "https://a.example/?utm_source=x").collect()
    # timestamp order: four 2024-01-01 captures (filename tie-break), then
    # the 2024-02-02 revisit
    assert [r.filename for r in got] == [
        "/fx/good.warc", "/fx/good.warc.gz", "/fx/mixed.warc", "/fx/trunc.warc",
        "/fx/surt.warc.gz",
    ], [r.filename for r in got]
    # revisit row resolves its declared digest; responses carry sha256 prefix
    assert any(r.digest.startswith("sha1:") for r in got)
    # file pruning is real: the covering range is a strict subset of files
    key = got[0].urlkey
    kept = snapshots.prune_files(m, "urlkey", key, key)
    assert 0 < len(kept) < n_total


def test_cdx_index_spark_matches_oracle(spark):
    """Spark cdx_index rows == the DuckDB oracle (the gate check, run
    here so a drift is caught before the driver does)."""
    import duckdb

    import __spark_entry__ as entry

    got = [tuple(r) for r in entry.q_cdx_index(spark, None).collect()]
    want = [tuple(r) for r in duckdb.connect().execute(entry._sql_cdx_index()).fetchall()]
    assert got == want


def test_cdx_lookup_many_batches_keys_one_scan(spark, tmp_path):
    from connapse_spark.sources import snapshots

    blobs = spark.createDataFrame(warc.fixture_warc_cdx(), "path string, content binary")
    tdir = str(tmp_path / "cdx-many")
    warc.write_cdx_table(warc.cdx_index(blobs, sort=False), tdir, n_files=4)
    got = warc.cdx_lookup_many(
        spark, tdir,
        ["https://a.example/", "https://www.example.com:8443/a/b?a=1&b=2",
         "https://never.crawled/x"],
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.urlkey, []).append(r)
    assert set(by_key) == {"example,a)/", "com,example:8443)/a/b?a=1&b=2"}
    assert len(by_key["example,a)/"]) == 5  # 4 archives + the revisit
    # union pruning is a strict file subset
    m = snapshots.load_manifest(tdir)
    keep = set()
    for k in by_key:
        keep.update(e["path"] for e in snapshots.prune_files(m, "urlkey", k, k))
    assert 0 < len(keep) < len(m["files"])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(min_size=0, max_size=40),
                  st.binary(min_size=0, max_size=150)),
        min_size=1, max_size=5,
    ),
    st.booleans(),
)
def test_property_located_spans_always_seekable(pairs, gz):
    """For ANY well-formed archive, every located record's (offset,
    length) span re-parses to exactly that record — the CDX correctness
    property, fuzzed over both layouts."""
    recs = [
        warc.make_warc_record(
            "response", warc.make_http_response(200, body),
            target_uri="https://e/" + uri.replace("\r", "").replace("\n", ""),
        )
        for uri, body in pairs
    ]
    blob = warc.make_warc(recs, gzip_members=gz)
    located = list(warc.iter_warc_records_located(blob))
    assert len(located) == len(recs)
    for hdrs, payload, _w, off, ln in located:
        span = blob[off : off + ln]
        raw = gzip.decompress(span) if gz else span
        (h2, p2, w2), = list(warc.iter_warc_records(raw))
        assert w2 is None
        assert h2.get("warc-target-uri") == hdrs.get("warc-target-uri")
        assert p2 == payload


def test_cdx_append_levels_prune_and_replay_is_noop(spark, tmp_path):
    """r9 incremental CDX: an appended drop keeps manifest-level pruning
    (a key opens a strict file subset spanning at most one file per
    level), prior files carry by reference (zero rewrite), and replaying
    an already-indexed archive appends zero rows."""
    from connapse_spark.sources import snapshots

    fx = warc.fixture_warc_cdx()
    base_files = {"/fx/good.warc.gz", "/fx/good.warc", "/fx/mixed.warc"}
    base = spark.createDataFrame(
        [r for r in fx if r[0] in base_files], "path string, content binary"
    )
    drop = spark.createDataFrame(
        [r for r in fx if r[0] not in base_files], "path string, content binary"
    )
    tdir = str(tmp_path / "cdx-inc")
    v0 = warc.cdx_append(spark, base, tdir, n_files=4)
    m0 = snapshots.load_manifest(tdir, v0)
    v1 = warc.cdx_append(spark, drop, tdir, n_files=2)
    m1 = snapshots.load_manifest(tdir, v1)
    # by-reference carry-over: every v0 file path survives verbatim in v1
    p0 = {e["path"] for e in m0["files"]}
    p1 = {e["path"] for e in m1["files"]}
    assert p0 < p1
    # pruning survives the level: a surt.warc.gz-only url opens only
    # level-1 files; a base-only url opens no level-1 file
    def pruned(url):
        from pyspark.sql import functions as SF

        from connapse_spark.operators.web import surt_key_expr
        k = spark.createDataFrame([(url,)], "url string").select(
            surt_key_expr(SF.col("url")).alias("k")).first()["k"]
        return {e["path"] for e in snapshots.prune_files(m1, "urlkey", k, k)}
    hit = pruned("https://www.com/x")          # only in the appended drop
    assert hit and hit.isdisjoint(p0)
    assert len(hit) < len(p1)
    # a base-only url still opens a strict subset (range stats may admit
    # a level file whose [min,max] covers the key — they are ranges, not
    # bloom filters — but never the whole table)
    base_hit = pruned("https://c.example/chunked")
    assert base_hit & p0 and len(base_hit) < len(p1)
    # lookups answer across levels
    got = warc.cdx_lookup(spark, tdir, "https://a.example/").collect()
    assert len(got) == 5  # 4 archive captures + the drop's revisit
    # replay: appending the same drop again adds zero rows and parses
    # zero archives (anti-join screens on filename before the parse)
    n_before = snapshots.read_snapshot(spark, tdir).count()
    v2 = warc.cdx_append(spark, drop, tdir)
    assert snapshots.read_snapshot(spark, tdir, version=v2).count() == n_before
    # compaction folds levels back into one clustered file set
    v3 = warc.cdx_compact(spark, tdir, n_files=4)
    m3 = snapshots.load_manifest(tdir, v3)
    assert len({e["path"] for e in m3["files"]} & p1) == 0
    rows_inc = sorted(
        tuple(r) for r in snapshots.read_snapshot(spark, tdir, version=v3).collect()
    )
    blobs = spark.createDataFrame(fx, "path string, content binary")
    rows_full = sorted(tuple(r) for r in warc.cdx_index(blobs).collect())
    assert rows_inc == rows_full


def test_wat_export_edge_cases(spark):
    """WAT metadata: titled page with mixed links, a title-less non-HTML
    payload (empty Links, NULL title), and WARC-Refers-To carrying the
    source record id."""
    from pyspark.sql import functions as SF

    page = (
        b"<html><head><title> My  Page </title></head><body>"
        b'<a href="https://x.example/a#frag">A</a>'
        b'<a href="/b">B</a>'
        b'<a href="mailto:x@y.z">no</a>'
        b"</body></html>"
    )
    recs = [
        warc.make_warc_record(
            "response", warc.make_http_response(200, page),
            target_uri="https://host.example/dir/page",
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(200, b"plain words", content_type="text/plain"),
            target_uri="https://host.example/plain",
        ),
        # non-response records must not produce WAT rows
        warc.make_warc_record("request", b"GET / HTTP/1.1\r\n\r\n",
                              target_uri="https://host.example/dir/page"),
    ]
    blobs = spark.createDataFrame(
        [("/fx/wat.warc.gz", warc.make_warc(recs))], "path string, content binary"
    )
    wat = warc.export_wat_shards(blobs)
    rows = warc.warc_records(
        wat.select(SF.col("shard").cast("string").alias("path"), "content")
    )
    got = {r["url"]: r for r in warc.wat_documents(rows).collect()}
    assert set(got) == {"https://host.example/dir/page", "https://host.example/plain"}
    pg = got["https://host.example/dir/page"]
    assert pg["title"] == "My Page"
    # fragment dropped, relative resolved against the page url, mailto skipped
    assert pg["links"] == "https://x.example/a|https://host.example/b"
    assert pg["n_links"] == 2 and pg["status"] == 200
    pl = got["https://host.example/plain"]
    assert pl["title"] is None and pl["n_links"] == 0 and pl["links"] == ""
    # refers-to: every metadata record points at a real source record id
    meta = rows.filter(SF.col("warc_type") == "metadata").collect()
    assert len(meta) == 2
    src_ids = set()
    for hdrs, _p, _w in warc.iter_warc_records(
        spark.createDataFrame([("x", warc.make_warc(recs))], "path string, content binary")
        .first()["content"]
    ):
        src_ids.add(hdrs.get("warc-record-id"))
    wat_blob = wat.first()["content"]
    refs = [h.get("warc-refers-to") for h, _p, _w in warc.iter_warc_records(bytes(wat_blob))]
    assert all(r in src_ids for r in refs)


def test_cdx_append_screens_zero_capture_archives(spark, tmp_path):
    """r9 review: an archive with NO response/revisit captures yields no
    index rows, so the replay screen must come from the _ingested side
    table — a replayed drop containing such an archive must not re-parse
    it (fresh set empty ⇒ zero appended rows AND zero parsed archives)."""
    from pyspark.sql import functions as SF

    from connapse_spark.sources import snapshots

    req_only = warc.make_warc(
        [warc.make_warc_record("request", b"GET / HTTP/1.1\r\n\r\n",
                               target_uri="https://q.example/")]
    )
    fx = warc.fixture_warc_cdx()[:2]
    tdir = str(tmp_path / "cdx-zc")
    base = spark.createDataFrame(fx, "path string, content binary")
    warc.cdx_append(spark, base, tdir)
    drop = spark.createDataFrame(
        [("/fx/requests-only.warc.gz", req_only)], "path string, content binary"
    )
    v1 = warc.cdx_append(spark, drop, tdir)
    n1 = snapshots.read_snapshot(spark, tdir, version=v1).count()
    # the zero-capture archive is recorded as ingested
    ing = {
        r["path"]
        for r in snapshots.read_snapshot(
            spark, str(tmp_path / "cdx-zc" / "_ingested")
        ).collect()
    }
    assert "/fx/requests-only.warc.gz" in ing
    # replaying the drop: the screen drops it BEFORE the parse — assert
    # via the anti-join surviving set, then via unchanged row count
    seen = snapshots.read_snapshot(
        spark, str(tmp_path / "cdx-zc" / "_ingested")
    ).select("path")
    survivors = drop.join(seen, "path", "left_anti").count()
    assert survivors == 0
    v2 = warc.cdx_append(spark, drop, tdir)
    assert snapshots.read_snapshot(spark, tdir, version=v2).count() == n1
