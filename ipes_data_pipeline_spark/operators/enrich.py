"""LLM enrichment operator (reference ``code/enrich_data.py``):
batched external calls via ``mapInPandas`` + a memoization cache table.

Reference semantics re-expressed for scale:

- cache probe (enrich_data.py:176-180)  → left join against the cache
  table; misses = rows with null enrichment → only those hit the backend;
- per-row ``time.sleep(21)`` (:205)     → token bucket *inside* each
  partition (politeness without idling the driver);
- markdown-fence-stripping JSON parse + required-field/enum validation
  (:113-121) → backend-side parse + enum clamp to 'Unknown';
- periodic cache save (:200-207)        → caller appends ``new_rows`` to
  the cache Parquet after the action (exactly-once via foreachBatch in
  the streaming path).

The backend is pluggable; tests use :class:`DeterministicMockBackend`
(pure function of the name — no network, reproducible).
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.schemas import (
    INDUSTRY_SEGMENTS,
    MARKET_POSITIONS,
)

ENRICH_COLS = [
    "is_active",
    "activity_signal",
    "industry_segment",
    "product_summary",
    "market_position",
]

ENRICH_SCHEMA_DDL = (
    "normalized_name string, is_active boolean, activity_signal string, "
    "industry_segment string, product_summary string, market_position string"
)


def clamp_enums(rec: dict) -> dict:
    """Closed-enum validation (reference enrich_data.py:119-121)."""
    if rec.get("industry_segment") not in INDUSTRY_SEGMENTS:
        rec["industry_segment"] = "Unknown"
    if rec.get("market_position") not in MARKET_POSITIONS:
        rec["market_position"] = "Unknown"
    return rec


def parse_llm_json(raw: str) -> dict | None:
    """Markdown-fence-stripping JSON parse (reference enrich_data.py:113-116)."""
    s = raw.strip()
    if s.startswith("```"):
        s = s.split("\n", 1)[-1]
        s = s.rsplit("```", 1)[0]
    try:
        rec = json.loads(s)
    except (ValueError, TypeError):
        return None
    if not all(k in rec for k in ENRICH_COLS):
        return None
    return clamp_enums(rec)


class DeterministicMockBackend:
    """Network-free backend: enrichment is a pure hash of the name."""

    def __call__(self, name: str, dockets: list[str]) -> dict:
        h = int(hashlib.sha256(name.encode()).hexdigest(), 16)
        return {
            "is_active": h % 2 == 0,
            "activity_signal": f"mock-signal-{h % 7}",
            "industry_segment": INDUSTRY_SEGMENTS[h % len(INDUSTRY_SEGMENTS)],
            "product_summary": f"mock summary for {name}",
            "market_position": MARKET_POSITIONS[h % len(MARKET_POSITIONS)],
        }


@dataclass
class TokenBucket:
    """Partition-local rate limiter: `rate` calls/sec, burst `burst`."""

    rate: float
    burst: int = 1

    def __post_init__(self):
        self._tokens = float(self.burst)
        self._last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self._tokens = min(self.burst, self._tokens + (now - self._last) * self.rate)
            self._last = now
            if self._tokens >= 1:
                self._tokens -= 1
                return
            time.sleep(min(1.0, (1 - self._tokens) / self.rate))


def enrich_misses(
    misses: DataFrame,
    backend: Callable[[str, list[str]], dict] | None = None,
    calls_per_second: float = 0.0,
    n_partitions: int | None = None,
) -> DataFrame:
    """Run the backend for cache-miss names. Input needs columns
    ``normalized_name`` and (optionally) ``dockets array<string>``.

    ``calls_per_second`` > 0 enables the per-partition token bucket
    (cluster-wide rate ≈ n_partitions × calls_per_second — size
    ``n_partitions`` to the external API's quota, not the data).
    """
    backend = backend or DeterministicMockBackend()
    has_dockets = "dockets" in misses.columns
    cols = ["normalized_name"] + (["dockets"] if has_dockets else [])
    src = misses.select(*cols).dropDuplicates(["normalized_name"])
    if n_partitions:
        src = src.repartition(n_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(calls_per_second) if calls_per_second > 0 else None
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if bucket:
                    bucket.acquire()
                dockets = list(getattr(row, "dockets", []) or []) if has_dockets else []
                try:
                    rec = clamp_enums(backend(row.normalized_name, dockets))
                except Exception:  # failure → empty struct, counted by caller
                    rec = {}
                out.append(
                    {
                        "normalized_name": row.normalized_name,
                        "is_active": rec.get("is_active"),
                        "activity_signal": rec.get("activity_signal"),
                        "industry_segment": rec.get("industry_segment"),
                        "product_summary": rec.get("product_summary"),
                        "market_position": rec.get("market_position"),
                    }
                )
            yield pd.DataFrame(
                out, columns=["normalized_name", *ENRICH_COLS]
            ) if out else pd.DataFrame(columns=["normalized_name", *ENRICH_COLS])

    return src.mapInPandas(run, schema=ENRICH_SCHEMA_DDL)


def successful_cache_rows(new_cache_rows: DataFrame) -> DataFrame:
    """Only SUCCESSFUL enrichments may enter the cache table: a backend
    failure yields an all-null enrichment row, and appending it would
    (a) leave the name a permanent cache miss that re-pays the backend
    AND re-appends every run, and (b) fan out every later cache join
    with duplicate rows per name — duplicate gold rows forever. Failed
    names stay uncached and retry on the next run. Shared by the batch
    driver (pipeline/run.py) and both streaming gold sinks."""
    any_value = F.coalesce(
        *[F.col(c).cast("string") for c in ENRICH_COLS]
    ).isNotNull()
    return new_cache_rows.where(any_value)


@dataclass
class EnrichmentOutput:
    enriched: DataFrame  # input columns + 5 enrichment columns
    new_cache_rows: DataFrame  # rows to append to the cache table


def enrich_with_cache(
    companies: DataFrame,
    cache: DataFrame,
    backend: Callable[[str, list[str]], dict] | None = None,
    calls_per_second: float = 0.0,
    n_partitions: int | None = None,
) -> EnrichmentOutput:
    """Memoized enrichment: cache hits bypass the backend entirely
    (left join); only misses (left-anti) pay the external call.
    """
    # miss detection via a PRESENCE marker, not a nullable payload
    # column: a legitimately-cached record whose is_active is null would
    # otherwise look like a miss every run — re-calling the backend and
    # appending a duplicate cache row each time
    marked = cache.withColumn("__cached", F.lit(True))
    hits = companies.join(F.broadcast(marked), "normalized_name", "left")
    missing = hits.filter(F.col("__cached").isNull()).select(
        "normalized_name",
        *( ["dockets"] if "dockets" in companies.columns else [] ),
    )
    # persist: `fresh` feeds both outputs — without it every downstream
    # action would re-run the external calls (paying the API cost twice).
    fresh = enrich_misses(missing, backend, calls_per_second, n_partitions).persist()
    combined_cache = cache.unionByName(fresh)
    enriched = companies.join(F.broadcast(combined_cache), "normalized_name", "left")
    return EnrichmentOutput(enriched=enriched, new_cache_rows=fresh)
