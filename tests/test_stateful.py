"""applyInPandasWithState memoized enrichment: state persists across
micro-batches within one query AND across query restarts (checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.streaming.stateful import enrich_stateful


def _run(spark, src_dir, ckpt, name):
    # foreachBatch sink: supports checkpoint recovery (memory sink does
    # not); rows are captured on the driver via closure.
    rows = []
    stream = spark.readStream.schema("normalized_name string").parquet(src_dir)
    q = (
        enrich_stateful(stream)
        .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return rows


def test_stateful_enrichment_memoizes(spark, tmp_path):
    src = str(tmp_path / "names")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: three names, one duplicated inside the batch
    spark.createDataFrame(
        [("acme",), ("acme",), ("globex",), ("initech",)], "normalized_name string"
    ).write.mode("append").parquet(src)
    out1 = _run(spark, src, ckpt, "state1")
    rows1 = {r["normalized_name"]: r for r in out1}
    assert len(rows1) == 3
    # first sighting of each key: backend called, not served from state
    assert all(not r["from_state"] for r in rows1.values())
    assert rows1["acme"]["n_occurrences"] == 2  # in-batch dup counted
    assert rows1["acme"]["industry_segment"] is not None

    # batch 2 (query restart, same checkpoint): repeats + one new name
    spark.createDataFrame(
        [("acme",), ("globex",), ("hooli",)], "normalized_name string"
    ).write.mode("append").parquet(src)
    out2 = _run(spark, src, ckpt, "state2")
    rows2 = {r["normalized_name"]: r for r in out2}
    # only the new file is processed; repeats served from restored state
    assert set(rows2) == {"acme", "globex", "hooli"}
    assert rows2["acme"]["from_state"] is True
    assert rows2["acme"]["n_occurrences"] == 3  # 2 from batch 1 + 1 now
    assert rows2["globex"]["from_state"] is True
    assert rows2["hooli"]["from_state"] is False
    # memoized value identical to the first computation
    assert (
        rows2["acme"]["industry_segment"] == rows1["acme"]["industry_segment"]
    )


def _run_tws(spark, src_dir, ckpt, ttl_ms=None):
    import pytest

    from ipes_data_pipeline_spark.streaming.stateful import (
        enrich_stateful_tws,
        tws_available,
    )

    if not tws_available():  # protobuf absent in this container
        pytest.skip("transformWithStateInPandas needs protobuf")

    rows = []
    stream = spark.readStream.schema("normalized_name string").parquet(src_dir)
    q = (
        enrich_stateful_tws(stream, ttl_ms=ttl_ms)
        .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {r["normalized_name"]: r for r in rows}


def test_transform_with_state_memoizes_across_restart(spark, tmp_path):
    src = str(tmp_path / "names")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("acme",), ("acme",), ("globex",)], "normalized_name string"
    ).write.mode("append").parquet(src)
    rows1 = _run_tws(spark, src, ckpt)
    assert set(rows1) == {"acme", "globex"}
    assert all(not r["from_state"] for r in rows1.values())
    assert rows1["acme"]["n_occurrences"] == 2

    spark.createDataFrame(
        [("acme",), ("hooli",)], "normalized_name string"
    ).write.mode("append").parquet(src)
    rows2 = _run_tws(spark, src, ckpt)
    assert set(rows2) == {"acme", "hooli"}
    assert rows2["acme"]["from_state"] is True
    assert rows2["acme"]["n_occurrences"] == 3
    assert rows2["hooli"]["from_state"] is False
    assert (
        rows2["acme"]["industry_segment"] == rows1["acme"]["industry_segment"]
    )


def test_transform_with_state_ttl_expires_cache_not_counter(spark, tmp_path):
    import time

    src = str(tmp_path / "names")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("acme",)], "normalized_name string"
    ).write.mode("append").parquet(src)
    rows1 = _run_tws(spark, src, ckpt, ttl_ms=1)
    assert rows1["acme"]["from_state"] is False

    time.sleep(2)  # let the 1 ms cache TTL lapse in processing time
    spark.createDataFrame(
        [("acme",)], "normalized_name string"
    ).write.mode("append").parquet(src)
    rows2 = _run_tws(spark, src, ckpt, ttl_ms=1)
    # cache expired -> backend re-called; counter state (no TTL) kept
    assert rows2["acme"]["from_state"] is False
    assert rows2["acme"]["n_occurrences"] == 2
