"""Resilient binary document sink (reference ``code/download_pdfs_robust.py``).

Reference behavior re-expressed for a cluster:

- per-run browser/session setup (``establish_session``, :227-241)
  → a per-partition open hook inside ``foreachPartition`` (one session
  per task, not per row, and never on the driver);
- magic-byte content sniffing ``%PDF`` / ``PK`` / OLE2 → .pdf/.docx/.doc
  (:112-121, :203-214) → a pure function applied to fetched bytes;
- URL rewrite ``/document/`` → ``/documents/`` (:150-157) → column op;
- resume = "skip existing ≥1000-byte files" (:268) → a *manifest table*
  anti-join: completed (url, size, sha) rows live in Parquet, the next
  run's work queue is ``queue ⟂ manifest`` — no filesystem listing, no
  driver loop, idempotent across retries;
- politeness delay (:38-39) → per-partition token bucket.

The fetch transport is pluggable; tests use a deterministic in-memory
fake. The sink writes files to a target directory (executor-local or a
shared filesystem in production) and RETURNS the new manifest rows so
the caller appends them to the manifest table — the same
cache-table-append pattern as enrichment.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.enrich import TokenBucket
from ipes_data_pipeline_spark.operators.util import cut

#: transport(url) -> bytes; raise for fetch failure
FetchFn = Callable[[str], bytes]


@dataclass
class HttpFetcher:
    """HTTP byte-fetch transport with bounded retry + backoff (reference
    ``download_with_retry``, download_pdfs_robust.py:169-226, incl. its
    3-attempt loop). Plain-field dataclass so it pickles into executor
    tasks; urllib is stdlib. Per-document failure beyond these attempts
    surfaces as an ``ok=false`` manifest row in ``download_documents``,
    never a task abort."""

    max_retries: int = 3
    backoff_s: float = 0.2
    timeout_s: float = 60.0

    def __call__(self, url: str) -> bytes:
        import urllib.request

        attempts = max(1, self.max_retries)  # 0 would raise None below
        for attempt in range(attempts):
            try:
                with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:
                    return resp.read()
            except Exception:  # noqa: BLE001 — retry any transport error
                if attempt + 1 >= attempts:
                    raise
                # back off only BETWEEN attempts — a sleep after the
                # final failure is dead time every FallbackFetcher doc
                # would pay before the fallback even starts
                time.sleep(self.backoff_s * (2**attempt))
        raise AssertionError("unreachable")

@dataclass
class SessionFetcher:
    """Session-carrying fetch transport — the reference's second
    download strategy (``download_via_browser_fetch`` +
    ``establish_session``, download_pdfs_robust.py:137-241) re-expressed
    without a browser: what defeats the 403/challenge there is the
    established session COOKIES and a browser-identifying User-Agent
    riding every request, so this transport (a) lazily visits
    ``session_url`` once to collect cookies into a jar (one
    establishment per EXECUTOR TASK, since the fetcher is constructed
    per partition — never per row, never on the driver), then (b)
    fetches documents through the same cookie-carrying opener. The
    full headless-browser variant (JS-executing challenge pages) would
    slot in behind the same ``FetchFn`` signature; its driver is out of
    scope in this container.
    """

    session_url: str
    user_agent: str = "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"
    max_retries: int = 3
    backoff_s: float = 0.2
    timeout_s: float = 60.0

    def _opener(self):
        import http.cookiejar
        import urllib.request

        if getattr(self, "_op", None) is None:
            jar = http.cookiejar.CookieJar()
            op = urllib.request.build_opener(
                urllib.request.HTTPCookieProcessor(jar)
            )
            op.addheaders = [("User-Agent", self.user_agent)]
            # establish the session: the landing page sets the cookies
            # the protected document endpoints require
            with op.open(self.session_url, timeout=self.timeout_s):
                pass
            self._op = op
        return self._op

    def __getstate__(self):
        # the live opener (sockets, cookie jar) never crosses the
        # driver->executor pickle boundary; each task re-establishes
        state = dict(self.__dict__)
        state.pop("_op", None)
        return state

    def __call__(self, url: str) -> bytes:
        attempts = max(1, self.max_retries)  # 0 would raise None below
        for attempt in range(attempts):
            try:
                with self._opener().open(url, timeout=self.timeout_s) as resp:
                    return resp.read()
            except Exception:  # noqa: BLE001 — retry any transport error
                if attempt + 1 >= attempts:
                    raise
                # drop the cached opener so the NEXT attempt re-visits
                # the landing page with a fresh jar: a session cookie
                # that expired (or was invalidated after N requests)
                # mid-partition would otherwise 403 every remaining
                # document through every retry (only between attempts —
                # the final failure keeps the opener and raises at once)
                self._op = None
                time.sleep(self.backoff_s * (2**attempt))
        raise AssertionError("unreachable")


@dataclass
class FallbackFetcher:
    """Strategy chain (the reference's overall control flow: direct
    download first, browser-session fetch when the host blocks it —
    download_pdfs_robust.py:100-134 then :137-224): try ``primary``;
    on ANY fetch failure, retry the document through ``fallback``.
    The session in the fallback is only ever established once a direct
    fetch has actually failed, so unblocked hosts pay nothing."""

    primary: FetchFn
    fallback: FetchFn

    def __call__(self, url: str) -> bytes:
        try:
            return self.primary(url)
        except Exception:  # noqa: BLE001 — any direct failure -> fallback
            return self.fallback(url)


MIN_VALID_BYTES = 1000  # reference download_pdfs_robust.py:268

MANIFEST_SCHEMA_DDL = (
    "url string, path string, n_bytes long, content_type string, ok boolean"
)


def sniff_extension(payload: bytes) -> str:
    """Magic-byte type sniff (reference download_pdfs_robust.py:112-121):
    %PDF → pdf, PK zip → docx, OLE2 compound doc → doc, else bin."""
    if payload[:4] == b"%PDF":
        return "pdf"
    if payload[:2] == b"PK":
        return "docx"
    if payload[:4] == b"\xd0\xcf\x11\xe0":
        return "doc"
    return "bin"


def sniff_extension_col(prefix_col) -> Column:
    """Column twin of :func:`sniff_extension` over a latin-1-decoded
    payload prefix (latin-1 maps bytes 1:1 to codepoints, so string
    startswith on the decoded prefix IS the magic-byte test). Lets the
    sniff decision run JVM-side in relational form — q167's manifest
    rollup and any audit over an already-decoded manifest column — while
    the byte form stays the sink's hot path. A pytest pins the two
    implementations to each other over all four magic classes."""
    c = F.col(prefix_col) if isinstance(prefix_col, str) else prefix_col
    return (
        F.when(c.startswith("%PDF"), F.lit("pdf"))
        .when(c.startswith("PK"), F.lit("docx"))
        .when(c.startswith("\u00d0\u00cf\u0011\u00e0"), F.lit("doc"))
        .otherwise(F.lit("bin"))
    )


def rewrite_doc_url(col) -> Column:
    """``/document/`` → ``/documents/`` (reference :150-157)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"/document/", "/documents/")


def pending_work(queue: DataFrame, manifest: DataFrame) -> DataFrame:
    """A9 resume: drop queue rows whose url already has a successful,
    ≥MIN_VALID_BYTES manifest entry (left-anti join — distributed skip,
    no filesystem stat calls)."""
    done = manifest.filter(
        F.col("ok") & (F.col("n_bytes") >= MIN_VALID_BYTES)
    ).select("url")
    return queue.join(done, "url", "left_anti")


def download_documents(
    queue: DataFrame,
    out_dir: str,
    fetch: FetchFn,
    manifest: DataFrame | None = None,
    requests_per_second: float = 0.0,
    n_partitions: int | None = None,
) -> DataFrame:
    """Fetch every queued (url, file_stem) to ``out_dir``; returns new
    manifest rows (url, path, n_bytes, content_type, ok).

    Queue needs columns ``url`` and ``file_stem`` (pre-sanitized name,
    e.g. ``{company}_{doc_id}`` — reference :82-91). Failures produce
    ``ok=false`` rows instead of aborting the job, so one bad document
    can't fail a 100 TB backfill; retries re-enqueue via the manifest.
    """
    work = queue.select(rewrite_doc_url("url").alias("url"), "file_stem")
    if manifest is not None:
        work = pending_work(work, manifest)
    # deterministic keeper: the same url queued under two stems must
    # write the SAME filename every run (dropDuplicates picks whichever
    # row arrives first — run-dependent paths break stem-derived joins)
    work = work.groupBy("url").agg(F.min("file_stem").alias("file_stem"))
    if n_partitions:
        work = work.repartition(n_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # partition-open hook: session/bucket built once per task
        bucket = (
            TokenBucket(requests_per_second) if requests_per_second > 0 else None
        )
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if bucket:
                    bucket.acquire()
                try:
                    payload = fetch(row.url)
                    ext = sniff_extension(payload)
                    path = os.path.join(out_dir, f"{row.file_stem}.{ext}")
                    tmp = f"{path}.tmp-{os.getpid()}-{int(time.time() * 1e6)}"
                    with open(tmp, "wb") as f:
                        f.write(payload)
                    os.replace(tmp, path)  # atomic: no torn files on retry
                    rows.append(
                        {
                            "url": row.url,
                            "path": path,
                            "n_bytes": len(payload),
                            "content_type": ext,
                            "ok": len(payload) >= MIN_VALID_BYTES,
                        }
                    )
                except Exception as e:  # failure row, not job abort
                    rows.append(
                        {
                            "url": row.url,
                            "path": None,
                            "n_bytes": 0,
                            "content_type": f"error:{type(e).__name__}",
                            "ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "path", "n_bytes", "content_type", "ok"]
            )

    # EAGER: fetching is a side effect — a lazy return would re-download
    # every document on every action over the manifest (count + write =
    # two full passes of network egress). The cut runs the downloads
    # exactly once and hands back the materialized manifest.
    return cut(work.mapInPandas(run, schema=MANIFEST_SCHEMA_DDL))


def read_documents(spark, doc_dir: str) -> DataFrame:
    """Read side of the store: Spark's binaryFile source (path, length,
    modificationTime, content) — the scan a downstream multimodal
    pipeline starts from."""
    return spark.read.format("binaryFile").load(doc_dir)
