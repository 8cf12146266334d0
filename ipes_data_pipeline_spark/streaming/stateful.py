"""Custom stateful streaming operator: exactly-once-style memoized
enrichment with ``applyInPandasWithState``.

The foreachBatch path (streaming/medallion.py) memoizes through a cache
*table* re-read per batch; this operator instead keeps the cache in
**keyed operator state** — the reference's in-memory
``enrichment_cache`` dict (``code/enrich_data.py:38-49,176-180``) made
durable and partitioned by Spark's state store:

- state key = ``normalized_name`` (the memoization key);
- first sighting of a key calls the backend, stores the result in
  state, emits the row with ``from_state=false``;
- every later sighting (same or later micro-batch) is served from
  state, ``from_state=true`` — zero external calls;
- state survives restarts via the query checkpoint, is sharded across
  executors by key, and scales horizontally with
  ``spark.sql.shuffle.partitions`` for state stores.

State is unbounded by design here (a memo cache); for keys with a
natural expiry use ``GroupStateTimeout.EventTimeTimeout`` and re-call
the backend on timeout — the plumbing is identical.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql import types as T

from ipes_data_pipeline_spark.operators.enrich import DeterministicMockBackend

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("normalized_name", T.StringType(), False),
        T.StructField("is_active", T.BooleanType(), True),
        T.StructField("activity_signal", T.StringType(), True),
        T.StructField("industry_segment", T.StringType(), True),
        T.StructField("product_summary", T.StringType(), True),
        T.StructField("market_position", T.StringType(), True),
        T.StructField("from_state", T.BooleanType(), False),
        T.StructField("n_occurrences", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("is_active", T.BooleanType(), True),
        T.StructField("activity_signal", T.StringType(), True),
        T.StructField("industry_segment", T.StringType(), True),
        T.StructField("product_summary", T.StringType(), True),
        T.StructField("market_position", T.StringType(), True),
        T.StructField("n_seen", T.LongType(), True),
    ]
)

_FIELDS = [
    "is_active",
    "activity_signal",
    "industry_segment",
    "product_summary",
    "market_position",
]


def enrich_stateful(
    names_stream: DataFrame,
    backend: Callable[[str, list[str]], dict] | None = None,
) -> DataFrame:
    """Streaming DataFrame with a ``normalized_name`` column → enriched
    stream where each distinct name pays the backend exactly once for
    the lifetime of the query (state-store memoization)."""
    backend = backend or DeterministicMockBackend()

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        name = key[0]
        n_rows = sum(len(p) for p in pdfs)
        if state.exists:
            (is_active, signal, segment, summary, position, n_seen) = state.get
            from_state = True
        else:
            rec = backend(name, [])
            is_active, signal, segment, summary, position = (
                rec.get(f) for f in _FIELDS
            )
            n_seen = 0
            from_state = False
        n_seen += n_rows
        state.update((is_active, signal, segment, summary, position, n_seen))
        yield pd.DataFrame(
            [
                {
                    "normalized_name": name,
                    "is_active": is_active,
                    "activity_signal": signal,
                    "industry_segment": segment,
                    "product_summary": summary,
                    "market_position": position,
                    "from_state": from_state,
                    "n_occurrences": n_seen,
                }
            ]
        )

    return names_stream.groupBy("normalized_name").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class MemoEnrichProcessor(StatefulProcessor):
    """``transformWithState`` form of the memo cache (Spark 4 API).

    Two independent state variables per key — the richer model the
    GroupState API can't express:

    - ``cache``: the enrichment record, with an optional **TTL**. The
      state store drops values older than ``ttl_ms`` at read time, so an
      expired key transparently re-pays the backend — the reference's
      cache has no expiry (``code/enrich_data.py:176-180`` serves any
      hit forever), which is wrong for "is this company active?" data;
      TTL bounds staleness without a side process sweeping the cache.
    - ``seen``: lifetime occurrence counter, deliberately WITHOUT TTL —
      cache expiry must not reset usage statistics.
    """

    def __init__(
        self,
        backend: Callable[[str, list[str]], dict] | None = None,
        ttl_ms: int | None = None,
    ) -> None:
        self._backend = backend or DeterministicMockBackend()
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._cache = handle.getValueState(
            "cache",
            T.StructType(STATE_SCHEMA.fields[:-1]),  # record sans counter
            ttlDurationMs=self._ttl_ms,
        )
        self._seen = handle.getValueState("seen", "n_seen long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        name = key[0]
        n_rows = sum(len(p) for p in rows)
        if self._cache.exists():
            is_active, signal, segment, summary, position = self._cache.get()
            from_state = True
        else:
            rec = self._backend(name, [])
            is_active, signal, segment, summary, position = (
                rec.get(f) for f in _FIELDS
            )
            from_state = False
            self._cache.update((is_active, signal, segment, summary, position))
        n_seen = (self._seen.get()[0] if self._seen.exists() else 0) + n_rows
        self._seen.update((n_seen,))
        yield pd.DataFrame(
            [
                {
                    "normalized_name": name,
                    "is_active": is_active,
                    "activity_signal": signal,
                    "industry_segment": segment,
                    "product_summary": summary,
                    "market_position": position,
                    "from_state": from_state,
                    "n_occurrences": n_seen,
                }
            ]
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """``transformWithStateInPandas`` talks to the JVM state server over a
    protobuf protocol; the API exists without protobuf but its driver
    worker crashes on first use."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace absent
        return False


def enrich_stateful_tws(
    names_stream: DataFrame,
    backend: Callable[[str, list[str]], dict] | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """``enrich_stateful`` on the ``transformWithStateInPandas`` API:
    same memoization contract, plus cache expiry after ``ttl_ms`` of
    processing time (counter state is never expired)."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pip install protobuf); use enrich_stateful (GroupState API) "
            "where it is unavailable"
        )
    return names_stream.groupBy("normalized_name").transformWithStateInPandas(
        MemoEnrichProcessor(backend, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="ProcessingTime",
    )
