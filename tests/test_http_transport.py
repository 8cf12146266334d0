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


class _BotBlockedHandler(BaseHTTPRequestHandler):
    """Serves documents ONLY to requests carrying the session cookie a
    landing-page visit sets — the bot-blocking host shape the
    reference's browser-fetch fallback exists for."""

    direct_denials: int = 0

    def do_GET(self):  # noqa: N802 (http.server API)
        path = urlparse(self.path).path
        if path == "/landing":
            self.send_response(200)
            self.send_header("Set-Cookie", "session=tok42; Path=/")
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html>ok</html>")
            return
        if "session=tok42" not in (self.headers.get("Cookie") or ""):
            type(self).direct_denials += 1
            self.send_response(403)
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
def blocked_server():
    server = HTTPServer(("127.0.0.1", 0), _BotBlockedHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_session_fallback_defeats_bot_block(spark, blocked_server, tmp_path):
    """A8 second strategy: direct GET 403s on a cookie-gated host; the
    FallbackFetcher retries through the session-carrying transport
    (landing-page visit collects the cookie), and the rest of the sink
    contract — sniffing, manifest rows, atomic writes — is unchanged."""
    from ipes_data_pipeline_spark.sources.binary_sink import (
        FallbackFetcher,
        HttpFetcher,
        SessionFetcher,
        download_documents,
    )

    _BotBlockedHandler.direct_denials = 0
    fetch = FallbackFetcher(
        primary=HttpFetcher(max_retries=1, backoff_s=0.01),
        fallback=SessionFetcher(
            session_url=f"{blocked_server}/landing", backoff_s=0.01
        ),
    )
    queue = spark.createDataFrame(
        [
            (f"{blocked_server}/docs/a", "doc_a"),
            (f"{blocked_server}/docs/b", "doc_b"),
            (f"{blocked_server}/docs/missing", "doc_d"),
        ],
        "url string, file_stem string",
    )
    out = download_documents(queue, str(tmp_path), fetch, n_partitions=1)
    rows = {r["url"].rsplit("/", 1)[-1]: r.asDict() for r in out.collect()}
    assert rows["a"]["ok"] and rows["a"]["content_type"] == "pdf"
    assert rows["b"]["ok"] and rows["b"]["content_type"] == "docx"
    assert not rows["missing"]["ok"]  # 404 even with the session
    assert (tmp_path / "doc_a.pdf").read_bytes().startswith(b"%PDF")
    # every direct attempt was denied -> the documents arrived via the
    # session path, and the fallback was exercised for each url
    assert _BotBlockedHandler.direct_denials >= 3


def test_session_fetcher_establishes_once_and_pickles(blocked_server):
    from ipes_data_pipeline_spark.sources.binary_sink import SessionFetcher

    f = SessionFetcher(session_url=f"{blocked_server}/landing", backoff_s=0.01)
    assert f(f"{blocked_server}/docs/a").startswith(b"%PDF")
    assert f(f"{blocked_server}/docs/b").startswith(b"PK")
    # live opener must not cross the pickle boundary
    import pickle

    f2 = pickle.loads(pickle.dumps(f))
    assert getattr(f2, "_op", None) is None
    assert f2(f"{blocked_server}/docs/a").startswith(b"%PDF")


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


def test_rest_datasource_v2_reads_and_prunes(spark, http_server):
    """The Python DataSource V2 form of the REST scan: format-registered,
    page ranges become input partitions, and max_records prunes
    partitions before any task exists (offsets past the cap are never
    requested)."""
    from ipes_data_pipeline_spark.sources.rest_datasource import RestDataSource

    _PagedHandler.fail_first = set()
    _PagedHandler.seen = []
    spark.dataSource.register(RestDataSource)

    df = (
        spark.read.format("ipes_rest")
        .schema(SCHEMA)
        .option("url", http_server)
        .option("page_size", "10")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # 23 records / 10 per page
    assert sorted(r["rid"] for r in df.collect()) == list(range(23))
    # composes like any table: engine-side filter on the scan
    assert df.where("rid >= 20").count() == 3

    _PagedHandler.seen = []
    capped = (
        spark.read.format("ipes_rest")
        .schema(SCHEMA)
        .option("url", http_server)
        .option("page_size", "10")
        .option("max_records", "10")
        .load()
    )
    assert capped.count() == 10
    # pushdown proof: only the probe (offset 0) and the single surviving
    # partition's page were requested — never offsets 10 or 20
    assert set(_PagedHandler.seen) == {0}


def test_rest_datasource_retries_inside_task(spark, http_server):
    """A 500 on an executor-side page is retried by the transport inside
    the task — the scan still returns every record exactly once."""
    from ipes_data_pipeline_spark.sources.rest_datasource import RestDataSource

    _PagedHandler.fail_first = {10}
    _PagedHandler.seen = []
    spark.dataSource.register(RestDataSource)
    df = (
        spark.read.format("ipes_rest")
        .schema(SCHEMA)
        .option("url", http_server)
        .option("page_size", "10")
        .option("backoff_s", "0.01")
        .load()
    )
    assert sorted(r["rid"] for r in df.collect()) == list(range(23))
    assert _PagedHandler.seen.count(10) == 2  # failed once, retried once


def test_rest_datasource_streams_incrementally(spark, http_server, tmp_path):
    """readStream.format("ipes_rest"): the stream offset is the REST
    record offset. Batch 1 drains the endpoint; records appended after
    the checkpoint arrive in batch 2 EXACTLY once (no re-fetch of the
    first 23)."""
    from ipes_data_pipeline_spark.sources.rest_datasource import RestDataSource

    _PagedHandler.fail_first = set()
    spark.dataSource.register(RestDataSource)
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("ipes_rest")
            .schema(SCHEMA)
            .option("url", http_server)
            .option("page_size", "10")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return sorted(r["rid"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(23))
    RECORDS.extend({"rid": i, "name": f"rec-{i}"} for i in range(23, 30))
    try:
        _PagedHandler.seen = []
        assert drain() == list(range(30))  # delta appended exactly once
        # the checkpointed offset means batch 2 never re-reads rows < 23
        assert all(o >= 23 for o in _PagedHandler.seen if o != 0)
    finally:
        del RECORDS[23:]


def test_rest_datasource_empty_endpoint(spark, http_server):
    """An endpoint with zero records (and a cap that prunes every
    partition) returns an EMPTY DataFrame — not a crash. pyspark
    substitutes [None] for an empty partition list, so partitions()
    must emit one empty range instead of []."""
    from ipes_data_pipeline_spark.sources.rest_datasource import RestDataSource

    _PagedHandler.fail_first = set()
    spark.dataSource.register(RestDataSource)

    # cap prunes everything
    capped = (
        spark.read.format("ipes_rest")
        .schema(SCHEMA)
        .option("url", http_server)
        .option("page_size", "10")
        .option("max_records", "0")
        .load()
    )
    assert capped.count() == 0

    # endpoint itself is empty
    saved = RECORDS[:]
    del RECORDS[:]
    try:
        empty = (
            spark.read.format("ipes_rest")
            .schema(SCHEMA)
            .option("url", http_server)
            .option("page_size", "10")
            .load()
        )
        assert empty.count() == 0
    finally:
        RECORDS.extend(saved)


class _OverreportingHandler(_PagedHandler):
    """Reports total = real + 7: the probe-derived batch end overshoots
    what the endpoint can actually serve (endpoint truncated between
    probe and fetch)."""

    def do_GET(self):  # noqa: N802 (http.server API)
        q = parse_qs(urlparse(self.path).query)
        limit = int(q["limit"][0])
        offset = int(q["offset"][0])
        body = json.dumps(
            {
                "total": len(RECORDS) + 7,
                "records": RECORDS[offset : offset + limit],
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


def test_rest_stream_commits_actual_offset_on_short_read():
    """A short read (probe says 30, endpoint serves 23) must commit the
    offset actually REACHED — committing the probe-derived end would
    permanently skip records [23, 30) once they appear."""
    from ipes_data_pipeline_spark.sources.rest_datasource import RestStreamReader

    server = HTTPServer(("127.0.0.1", 0), _OverreportingHandler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/api"
        reader = RestStreamReader(
            SCHEMA, {"url": url, "page_size": "10", "backoff_s": "0.01"}
        )
        rows, end = reader.read({"offset": 0})
        assert len(rows) == 23
        assert end == {"offset": 23}  # NOT the lying probe's 30
    finally:
        server.shutdown()
