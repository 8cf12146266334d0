"""ChatHttpBackend against a real localhost fake chat-completions
server (reference enrich_data.py:84-128): success + fence-strip + enum
clamp, malformed-JSON parse failure, 429-with-Retry-After retry,
persistent-5xx raise, and the end-to-end enrich_with_cache path where a
failing name becomes the all-null row the cache layer refuses."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

import urllib.error

from ipes_data_pipeline_spark.operators.enrich import (
    ChatHttpBackend,
    build_research_prompt,
    enrich_with_cache,
    successful_cache_rows,
)

GOOD = {
    "is_active": True,
    "activity_signal": "website active",
    "industry_segment": "UCaaS",
    "product_summary": "Hosted VoIP for SMBs.",
    "market_position": "SMB",
}


def _content_for(name: str) -> tuple[int, str | None]:
    """(status, chat content) keyed by the company name in the prompt
    (case-insensitive: the pipeline sends normalized lower-case names)."""
    key = name.lower()
    if key == "fenced corp":
        return 200, "```json\n" + json.dumps(GOOD) + "\n```"
    if key == "weird enum llc":
        rec = dict(GOOD, industry_segment="Blockchain", market_position="Mega")
        return 200, json.dumps(rec)
    if key == "broken json inc":
        return 200, "{this is not json"
    if key == "missing fields co":
        return 200, json.dumps({"is_active": True})
    return 200, json.dumps(dict(GOOD, product_summary=f"About {name}."))


class _ChatHandler(BaseHTTPRequestHandler):
    calls: list = []  # (name, auth_header)
    rate_limit_once: set = set()
    always_500: set = set()
    empty_choices: set = set()

    def do_POST(self):  # noqa: N802 (http.server API)
        if self.path != "/v1/chat/completions":
            self.send_response(404)
            self.end_headers()
            return
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        user_msg = body["messages"][-1]["content"]
        m = re.search(r"Company Name: (.+)", user_msg)
        name = m.group(1).strip() if m else "?"
        type(self).calls.append((name, self.headers.get("Authorization")))
        if name in type(self).always_500:
            self.send_response(500)
            self.end_headers()
            return
        if name in type(self).rate_limit_once:
            type(self).rate_limit_once.discard(name)
            self.send_response(429)
            self.send_header("Retry-After", "0")
            self.end_headers()
            return
        status, content = _content_for(name)
        if name in type(self).empty_choices:
            body_out = {"choices": []}
        else:
            body_out = {
                "choices": [
                    {"message": {"role": "assistant", "content": content}}
                ]
            }
        payload = json.dumps(body_out).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def chat_server():
    _ChatHandler.calls = []
    _ChatHandler.rate_limit_once = set()
    _ChatHandler.always_500 = set()
    _ChatHandler.empty_choices = set()
    server = HTTPServer(("127.0.0.1", 0), _ChatHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/v1/chat/completions"
    server.shutdown()


def _backend(url, **kw):
    kw.setdefault("backoff_s", 0.01)
    return ChatHttpBackend(url, model="test-model", api_key="sk-test", **kw)


def test_success_fence_strip_and_auth(chat_server):
    rec = _backend(chat_server)("Fenced Corp", ["WC 07-243"])
    assert rec == GOOD  # fenced reply parsed, all fields intact
    name, auth = _ChatHandler.calls[0]
    assert name == "Fenced Corp" and auth == "Bearer sk-test"


def test_enum_clamp_to_unknown(chat_server):
    rec = _backend(chat_server)("Weird Enum LLC", [])
    assert rec["industry_segment"] == "Unknown"
    assert rec["market_position"] == "Unknown"
    assert rec["is_active"] is True


@pytest.mark.parametrize("name", ["Broken JSON Inc", "Missing Fields Co"])
def test_malformed_reply_raises_value_error(chat_server, name):
    with pytest.raises(ValueError, match="unparseable enrichment"):
        _backend(chat_server)(name, [])


def test_429_retries_and_succeeds(chat_server):
    _ChatHandler.rate_limit_once = {"Acme Telecom"}
    rec = _backend(chat_server)("Acme Telecom", ["WC 20-1"])
    assert rec["product_summary"] == "About Acme Telecom."
    assert [c[0] for c in _ChatHandler.calls] == ["Acme Telecom"] * 2


def test_persistent_500_raises_after_max_retries(chat_server):
    _ChatHandler.always_500 = {"Down Co"}
    with pytest.raises(urllib.error.HTTPError):
        _backend(chat_server, max_retries=3)("Down Co", [])
    assert len(_ChatHandler.calls) == 3


def test_bad_request_not_retried(chat_server):
    # 4xx other than 429 must raise immediately (retrying a 401 just
    # burns quota); simulate via a server that 500s — covered above —
    # so here assert the classification directly on a 404 URL.
    b = _backend(chat_server.rsplit("/", 1)[0] + "/nope", max_retries=5)
    with pytest.raises(urllib.error.HTTPError):
        b("Acme", [])
    # the 404 path bails before the handler's counter — no retries
    # means no parsed calls land in the log at all
    assert all(c[0] != "Acme" for c in _ChatHandler.calls)


def test_empty_choices_is_unparseable_not_retried(chat_server):
    """A 200 reply with `choices: []` is a deterministic bad reply: it
    must flow into the ValueError('unparseable') failure path in ONE
    call, not bounce through the connection-retry loop as IndexError."""
    _ChatHandler.empty_choices = {"Void Reply Co"}
    with pytest.raises(ValueError, match="unparseable enrichment"):
        _backend(chat_server, max_retries=3)("Void Reply Co", [])
    assert len(_ChatHandler.calls) == 1


def test_prompt_carries_name_and_dockets():
    p = build_research_prompt("Acme", ["a", "b", "c", "d"])
    assert "Company Name: Acme" in p
    assert "a, b, c" in p and "d" not in p.split("FCC Docket(s):")[1].split("\n")[0]
    assert build_research_prompt("X", []).count("Unknown") >= 2


def test_prompt_verbatim_reference_shape():
    """Reference parity (enrich_data.py:55-80): the Contact/Attorney
    line and the full field descriptions are present; the reference
    driver's contacts=[] default renders 'Not specified'."""
    p = build_research_prompt("Acme", ["WC 07-243"], ["Jane Roe, Esq."])
    assert "Contact/Attorney: Jane Roe, Esq." in p
    d = build_research_prompt("Acme", ["WC 07-243"])
    assert "Contact/Attorney: Not specified" in d
    for frag in (
        "True if the company appears to still be in business, False if "
        "defunct/acquired/closed.",
        'Example: "Website active, recent press releases" or "No web '
        'presence found, domain expired"',
        "If unknown, describe based on the filing type.",
    ):
        assert frag in d


def test_enrich_with_cache_over_live_chat_server(spark, chat_server):
    """End-to-end: the backend pickles into executor tasks, cache hits
    bypass the server, the malformed-reply name yields the all-null
    failure row, and successful_cache_rows keeps it out of the cache."""
    companies = spark.createDataFrame(
        [("acme telecom",), ("fenced corp",), ("broken json inc",)],
        "normalized_name string",
    )
    cache = spark.createDataFrame(
        [("fenced corp", True, "cached", "UCaaS", "from cache", "SMB")],
        "normalized_name string, is_active boolean, activity_signal string,"
        " industry_segment string, product_summary string,"
        " market_position string",
    )
    # the prompt title-cases nothing — the fake server keys on the raw
    # normalized name, so register its behaviors under those names
    out = enrich_with_cache(
        companies, cache, backend=_backend(chat_server), n_partitions=2
    )
    rows = {r["normalized_name"]: r for r in out.enriched.collect()}
    assert rows["fenced corp"]["activity_signal"] == "cached"  # hit: no call
    assert rows["acme telecom"]["product_summary"] == "About acme telecom."
    assert rows["broken json inc"]["is_active"] is None  # failure row
    cacheable = {
        r["normalized_name"]
        for r in successful_cache_rows(out.new_cache_rows).collect()
    }
    assert cacheable == {"acme telecom"}
    assert all(c[0] != "fenced corp" for c in _ChatHandler.calls)


def test_stream_gold_enrichment_over_live_chat_server(spark, chat_server, tmp_path):
    """Stretch path: the STREAMING gold sink (foreachBatch cache-append
    contract) driving the production HTTP backend against the live fake
    server — successful names enter the cache, the parse-failure name
    stays uncached, and a second stream (fresh checkpoint, exploding
    server) is served entirely from the cache."""
    import os

    from ipes_data_pipeline_spark.schemas import ENRICHMENT_CACHE
    from ipes_data_pipeline_spark.streaming.medallion import (
        stream_gold_enrichment,
    )

    companies = spark.createDataFrame(
        [
            (1, "Acme Telecom", "acme telecom", 3),
            (2, "Broken JSON Inc", "broken json inc", 1),
        ],
        "id long, entity_name string, normalized_name string, filing_count long",
    )
    filings = spark.createDataFrame(
        [(1, "WC 20-1"), (1, "WC 07-243"), (2, "WC 99-9")],
        "company_id long, docket_number string",
    )
    silver_dir = str(tmp_path / "companies")
    companies.write.parquet(silver_dir)
    cache_dir, gold_dir = str(tmp_path / "cache"), str(tmp_path / "gold")
    stream = spark.readStream.schema(companies.schema).parquet(silver_dir)

    q = stream_gold_enrichment(
        spark, stream, filings, cache_dir, gold_dir,
        str(tmp_path / "ck1"), backend=_backend(chat_server),
    )
    q.awaitTermination(300)
    gold = {r["entity_name"]: r for r in spark.read.parquet(gold_dir).collect()}
    assert gold["Acme Telecom"]["product_summary"] == "About acme telecom."
    assert gold["Broken JSON Inc"]["is_active"] is None  # failure row
    cache = spark.read.schema(ENRICHMENT_CACHE).parquet(cache_dir)
    assert {r["normalized_name"] for r in cache.collect()} == {"acme telecom"}
    # the server really served the stream (executor-side HTTP happened)
    assert ("acme telecom" in {c[0] for c in _ChatHandler.calls})

    # second stream, fresh checkpoint: the cached name must NOT re-pay
    # the backend; the failure name retries (and fails again)
    _ChatHandler.calls = []
    q = stream_gold_enrichment(
        spark, stream, filings, cache_dir, gold_dir,
        str(tmp_path / "ck2"), backend=_backend(chat_server),
    )
    q.awaitTermination(300)
    called = {c[0] for c in _ChatHandler.calls}
    assert "acme telecom" not in called  # cache hit bypassed the server
    assert "broken json inc" in called  # uncached failure retried
    assert spark.read.schema(ENRICHMENT_CACHE).parquet(cache_dir).count() == 1
