"""Executable S3 (Azure) path: the stdlib REST connector against a
protocol-faithful mock Blob server — the Azurite role the reference's
integration tests play (tests/Connapse.Integration.Tests/AzuriteFixture.cs).

The mock verifies every request's SharedKey signature with an
INDEPENDENT implementation of the documented algorithm (written out
here, not imported from the connector), so canonicalization bugs cannot
cancel out; it speaks the real List Blobs XML (prefix, maxresults,
NextMarker paging) and Get Blob endpoints."""

from __future__ import annotations

import base64
import hashlib
import hmac
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from connapse_spark.sources import connectors

ACCOUNT = "testacct"
KEY_B64 = base64.b64encode(b"super secret account key 42").decode()


def _expected_signature(method: str, path: str, query: dict, headers) -> str:
    """Independent SharedKey reimplementation straight from the spec
    (learn.microsoft.com/rest/api/storageservices/authorize-with-shared-key)."""
    std = [
        "Content-Encoding", "Content-Language", "Content-Length",
        "Content-MD5", "Content-Type", "Date", "If-Modified-Since",
        "If-Match", "If-None-Match", "If-Unmodified-Since", "Range",
    ]
    parts = [method.upper()]
    for h in std:
        v = headers.get(h, "") or ""
        if h == "Content-Length" and v == "0":
            v = ""
        parts.append(v)
    xms = sorted(
        (k.lower(), v) for k, v in headers.items() if k.lower().startswith("x-ms-")
    )
    canon_headers = "".join(f"{k}:{v}\n" for k, v in xms)
    canon_res = f"/{ACCOUNT}{path}"
    for name in sorted(query):
        canon_res += f"\n{name.lower()}:{query[name]}"
    sts = "\n".join(parts) + "\n" + canon_headers + canon_res
    sig = hmac.new(
        base64.b64decode(KEY_B64), sts.encode(), hashlib.sha256
    ).digest()
    return f"SharedKey {ACCOUNT}:{base64.b64encode(sig).decode()}"


class _BlobStore:
    def __init__(self):
        self.blobs: dict[tuple[str, str], bytes] = {}  # (container, name)
        self.auth_failures = 0


def _make_server(store: _BlobStore, page_size: int = 2):
    class Handler(BaseHTTPRequestHandler):
        def _fail(self, code, msg=b""):
            self.send_response(code)
            self.send_header("Content-Length", str(len(msg)))
            self.end_headers()
            self.wfile.write(msg)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            query = dict(urllib.parse.parse_qsl(parsed.query))
            want = _expected_signature("GET", parsed.path, query, self.headers)
            if self.headers.get("Authorization") != want:
                store.auth_failures += 1
                return self._fail(403, b"signature mismatch")
            # store lookup uses the DECODED name (a real service decodes the
            # URI path); the signature check above used the wire path
            segs = urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)
            if query.get("comp") == "list":
                return self._list(segs[0], query)
            if len(segs) == 2 and (segs[0], segs[1]) in store.blobs:
                body = store.blobs[(segs[0], segs[1])]
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Last-Modified", "Thu, 01 Jan 2026 00:00:00 GMT")
                self.end_headers()
                self.wfile.write(body)
                return
            self._fail(404)

        def _list(self, container: str, query: dict):
            prefix = query.get("prefix", "")
            names = sorted(
                n for (c, n) in store.blobs if c == container and n.startswith(prefix)
            )
            start = 0
            if query.get("marker"):
                start = names.index(query["marker"])
            cap = min(int(query.get("maxresults", "5000")), page_size)
            page = names[start : start + cap]
            nxt = names[start + cap] if start + cap < len(names) else ""
            items = "".join(
                f"<Blob><Name>{n}</Name><Properties>"
                f"<Content-Length>{len(store.blobs[(container, n)])}</Content-Length>"
                f"<Last-Modified>Thu, 01 Jan 2026 00:00:00 GMT</Last-Modified>"
                f"</Properties></Blob>"
                for n in page
            )
            body = (
                "<?xml version='1.0' encoding='utf-8'?>"
                f"<EnumerationResults><Blobs>{items}</Blobs>"
                f"<NextMarker>{nxt}</NextMarker></EnumerationResults>"
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _verify(self, method):
            parsed = urllib.parse.urlparse(self.path)
            query = dict(urllib.parse.parse_qsl(parsed.query))
            want = _expected_signature(method, parsed.path, query, self.headers)
            if self.headers.get("Authorization") != want:
                store.auth_failures += 1
                self._fail(403, b"signature mismatch")
                return None
            return urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)

        def do_PUT(self):
            segs = self._verify("PUT")
            if segs is None:
                return
            if self.headers.get("x-ms-blob-type") != "BlockBlob":
                return self._fail(400, b"missing x-ms-blob-type")
            body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
            store.blobs[(segs[0], segs[1])] = body
            self.send_response(201)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_DELETE(self):
            segs = self._verify("DELETE")
            if segs is None:
                return
            if (segs[0], segs[1]) not in store.blobs:
                return self._fail(404)
            del store.blobs[(segs[0], segs[1])]
            self.send_response(202)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_HEAD(self):
            segs = self._verify("HEAD")
            if segs is None:
                return
            if (segs[0], segs[1]) in store.blobs:
                self.send_response(200)
                self.send_header(
                    "Content-Length", str(len(store.blobs[(segs[0], segs[1])]))
                )
                self.end_headers()
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture(scope="module")
def azure_env():
    store = _BlobStore()
    for i in range(5):
        store.blobs[("corpus", f"docs/doc{i}.txt")] = (
            f"azure blob document {i} body".encode()
        )
    store.blobs[("corpus", "other/skip.txt")] = b"outside prefix"
    srv, ep = _make_server(store, page_size=2)
    yield store, ep
    srv.shutdown()


def test_azure_list_paginates_and_prunes_prefix(spark, azure_env):
    store, ep = azure_env
    rows = connectors.azure_list_blobs(
        spark, ACCOUNT, "corpus", KEY_B64, prefix="docs/", endpoint_url=ep
    ).collect()
    # page_size=2 forces 3 NextMarker round trips for 5 blobs
    assert len(rows) == 5
    assert all(
        r["path"].startswith(f"abfss://corpus@{ACCOUNT}.dfs.core.windows.net/docs/")
        for r in rows
    )
    sizes = {r["path"].rsplit("/", 1)[-1]: r["size_bytes"] for r in rows}
    assert sizes["doc0.txt"] == len(store.blobs[("corpus", "docs/doc0.txt")])
    assert store.auth_failures == 0


def test_azure_read_blobs_distributed_roundtrip(spark, azure_env):
    store, ep = azure_env
    listing = connectors.azure_list_blobs(
        spark, ACCOUNT, "corpus", KEY_B64, prefix="docs/", endpoint_url=ep
    )
    fetched = connectors.azure_read_blobs(
        listing.repartition(3), ACCOUNT, KEY_B64, endpoint_url=ep
    )
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in fetched.collect()}
    assert got == {
        n.rsplit("/", 1)[-1]: b
        for (c, n), b in store.blobs.items()
        if n.startswith("docs/")
    }


def test_azure_encoded_blob_name_signs_and_fetches(spark, azure_env):
    """A blob name that needs percent-encoding (space, unicode): the
    connector must sign the ENCODED wire path — signing the raw path
    403s on exactly these names (r5 ADVICE connectors.py:426)."""
    store, ep = azure_env
    store.blobs[("corpus", "docs/with space é.txt")] = b"encoded name body"
    try:
        listing = connectors.azure_list_blobs(
            spark, ACCOUNT, "corpus", KEY_B64, prefix="docs/with", endpoint_url=ep
        )
        fetched = connectors.azure_read_blobs(
            listing, ACCOUNT, KEY_B64, endpoint_url=ep
        ).collect()
        assert len(fetched) == 1
        assert bytes(fetched[0]["content"]) == b"encoded name body"
        assert store.auth_failures == 0
    finally:
        del store.blobs[("corpus", "docs/with space é.txt")]


def test_azure_bad_key_is_rejected_by_signature_check(spark, azure_env):
    import urllib.error

    store, ep = azure_env
    bad = base64.b64encode(b"wrong key").decode()
    with pytest.raises(urllib.error.HTTPError):
        connectors.azure_list_blobs(
            spark, ACCOUNT, "corpus", bad, endpoint_url=ep
        )
    assert store.auth_failures >= 1


def test_azure_list_guard_raises_over_cap(spark, azure_env):
    _, ep = azure_env
    with pytest.raises(ValueError, match="max_results"):
        connectors.azure_list_blobs(
            spark, ACCOUNT, "corpus", KEY_B64, prefix="docs/",
            endpoint_url=ep, max_results=3,
        )


def test_azure_to_parse_pipeline(spark, azure_env):
    """Azure → decode → text-parse: identical downstream plumbing to the
    S3 path (same output schema from both connectors)."""
    from connapse_spark.sources import parsers

    _, ep = azure_env
    listing = connectors.azure_list_blobs(
        spark, ACCOUNT, "corpus", KEY_B64, prefix="docs/", endpoint_url=ep
    )
    raw = connectors.azure_read_blobs(listing, ACCOUNT, KEY_B64, endpoint_url=ep)
    texts = raw.select(F.col("path"), F.decode(F.col("content"), "UTF-8").alias("text"))
    rows = parsers.parse_text_documents(texts).collect()
    assert len(rows) == 5
    assert all("azure blob document" in r["text"] for r in rows)


def test_azure_put_exists_delete_single(azure_env):
    """The Azure WRITE surface (AzureBlobConnector.cs Write/Delete/Exists):
    Put Blob lands and overwrites; HEAD answers existence; Delete is
    DeleteIfExists (missing blob is success)."""
    store, ep = azure_env
    fail0 = store.auth_failures
    r = connectors.azure_put_blob(
        ACCOUNT, "corpus", "w/new.txt", b"azure write body", KEY_B64,
        content_type="text/plain", endpoint_url=ep,
    )
    assert r["size_bytes"] == 16 and r["path"].startswith("abfss://corpus@")
    assert store.blobs[("corpus", "w/new.txt")] == b"azure write body"
    assert connectors.azure_blob_exists(ACCOUNT, "corpus", "w/new.txt", KEY_B64, endpoint_url=ep)
    # overwrite semantics (UploadAsync default)
    connectors.azure_put_blob(ACCOUNT, "corpus", "w/new.txt", b"v2", KEY_B64, endpoint_url=ep)
    assert store.blobs[("corpus", "w/new.txt")] == b"v2"
    connectors.azure_delete_blob(ACCOUNT, "corpus", "w/new.txt", KEY_B64, endpoint_url=ep)
    assert not connectors.azure_blob_exists(ACCOUNT, "corpus", "w/new.txt", KEY_B64, endpoint_url=ep)
    # already-deleted is success
    connectors.azure_delete_blob(ACCOUNT, "corpus", "w/new.txt", KEY_B64, endpoint_url=ep)
    assert store.auth_failures == fail0


def test_azure_write_blobs_distributed_roundtrip(spark, azure_env):
    store, ep = azure_env
    fail0 = store.auth_failures
    files = spark.createDataFrame(
        [(f"wb/blob{i}.txt", f"distributed azure write {i}".encode()) for i in range(6)],
        "name string, content binary",
    ).repartition(3)  # >1 partition: PUTs run on executor workers
    receipts = connectors.azure_write_blobs(
        files, ACCOUNT, "corpus", KEY_B64, endpoint_url=ep
    ).collect()
    assert len(receipts) == 6
    try:
        listing = connectors.azure_list_blobs(
            spark, ACCOUNT, "corpus", KEY_B64, prefix="wb/", endpoint_url=ep
        )
        back = connectors.azure_read_blobs(listing, ACCOUNT, KEY_B64, endpoint_url=ep)
        got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in back.collect()}
        assert got["blob4.txt"] == b"distributed azure write 4"
        assert len(got) == 6
        assert store.auth_failures == fail0
    finally:
        for i in range(6):
            store.blobs.pop(("corpus", f"wb/blob{i}.txt"), None)
