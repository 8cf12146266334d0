"""HTTP transports against real localhost servers: REST paging protocol,
retry-on-500, the full read_paginated fan-out, and the binary-sink
HttpFetcher driving download_documents (sniffing + manifest rows)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from pyspark.sql import types as T

from ipes_data_pipeline_spark.sources.rest import HttpTransport, read_paginated

RECORDS = [{"rid": i, "name": f"rec-{i}"} for i in range(23)]
SCHEMA = T.StructType(
    [T.StructField("rid", T.LongType()), T.StructField("name", T.StringType())]
)


class _PagedHandler(BaseHTTPRequestHandler):
    fail_first: set = set()
    seen: list = []

    def do_GET(self):  # noqa: N802 (http.server API)
        q = parse_qs(urlparse(self.path).query)
        limit = int(q["limit"][0])
        offset = int(q["offset"][0])
        type(self).seen.append(offset)
        if offset in type(self).fail_first:
            type(self).fail_first.discard(offset)
            self.send_response(500)
            self.end_headers()
            return
        body = json.dumps(
            {"total": len(RECORDS), "records": RECORDS[offset : offset + limit]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    server = HTTPServer(("127.0.0.1", 0), _PagedHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/api"
    server.shutdown()


def test_http_transport_pages_and_retries(http_server):
    _PagedHandler.fail_first = {0}  # first probe attempt 500s, retry succeeds
    t = HttpTransport(http_server, backoff_s=0.01)
    records, total = t("anything", 10, 0)
    assert total == 23
    assert [r["rid"] for r in records] == list(range(10))
    # the 500 consumed one attempt; the retry hit the same offset again
    assert _PagedHandler.seen.count(0) == 2


def test_read_paginated_over_http(spark, http_server):
    _PagedHandler.fail_first = set()
    t = HttpTransport(http_server, backoff_s=0.01)
    df = read_paginated(spark, t, "q", SCHEMA, page_size=10)
    rows = sorted(r["rid"] for r in df.collect())
    assert rows == list(range(23))

    capped = read_paginated(spark, t, "q", SCHEMA, page_size=10, max_records=15)
    assert capped.count() == 15


DOCS = {
    "/docs/a": b"%PDF-1.7 " + b"x" * 2000,
    "/docs/b": b"PK\x03\x04" + b"y" * 2000,
    "/docs/c": b"tiny",  # < MIN_VALID_BYTES -> ok=false
}


class _DocHandler(BaseHTTPRequestHandler):
    fail_first: set = set()

    def do_GET(self):  # noqa: N802 (http.server API)
        path = urlparse(self.path).path
        if path in type(self).fail_first:
            type(self).fail_first.discard(path)
            self.send_response(503)
            self.end_headers()
            return
        body = DOCS.get(path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def doc_server():
    server = HTTPServer(("127.0.0.1", 0), _DocHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_http_fetcher_download_documents(spark, doc_server, tmp_path):
    from ipes_data_pipeline_spark.sources.binary_sink import (
        HttpFetcher,
        download_documents,
    )

    _DocHandler.fail_first = {"/docs/a"}  # first attempt 503s, retry succeeds
    queue = spark.createDataFrame(
        [
            (f"{doc_server}/docs/a", "doc_a"),
            (f"{doc_server}/docs/b", "doc_b"),
            (f"{doc_server}/docs/c", "doc_c"),
            (f"{doc_server}/docs/missing", "doc_d"),
        ],
        "url string, file_stem string",
    )
    out = download_documents(
        queue, str(tmp_path), HttpFetcher(backoff_s=0.01), n_partitions=2
    )
    rows = {r["url"].rsplit("/", 1)[-1]: r.asDict() for r in out.collect()}
    assert rows["a"]["ok"] and rows["a"]["content_type"] == "pdf"
    assert rows["b"]["ok"] and rows["b"]["content_type"] == "docx"
    assert not rows["c"]["ok"] and rows["c"]["content_type"] == "bin"
    assert not rows["missing"]["ok"]
    assert rows["missing"]["content_type"].startswith("error:")
    assert (tmp_path / "doc_a.pdf").read_bytes().startswith(b"%PDF")
    assert (tmp_path / "doc_b.docx").exists()
