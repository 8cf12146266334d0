"""HttpTransport against a real localhost HTTP server: paging protocol,
retry-on-500, and the full read_paginated fan-out over HTTP."""

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
