"""Semantic units for the curation operators (q81–q87) beyond the
oracle hash-match: coverage/overlap invariants for chunking, extreme
cases for the repetition score, and planted-overlap contamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.queries import REGISTRY, load_all
from ipes_data_pipeline_spark.queries.curation import (
    _CHUNK,
    _STRIDE,
    _ngrams,
    contamination_overlap,
)

load_all()


def test_chunking_covers_every_char_with_fixed_overlap(spark, sf_dir):
    chunks = REGISTRY["q81_chunk_documents"].spark(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("chunk_idx").alias("min_idx"),
            F.max_by("chunk_len", "chunk_idx").alias("last_len"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "n_chars"
            ),
            "doc_id",
        )
        .collect()
    )
    assert per_doc
    for r in per_doc:
        # contiguous indices 0..k, count = floor((n-1)/stride)+1
        assert r["min_idx"] == 0
        assert r["n_chunks"] == r["max_idx"] + 1
        assert r["n_chunks"] == (r["n_chars"] - 1) // _STRIDE + 1
        # the last chunk ends exactly at the document's end: every char
        # is covered once the (CHUNK - STRIDE)-char overlaps are stitched
        assert r["max_idx"] * _STRIDE + r["last_len"] == r["n_chars"]
        # non-final chunks are full width
        if r["n_chunks"] > 1:
            assert r["last_len"] <= _CHUNK


def test_repetition_score_extremes(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # one distinct trigram
            (2, "alpha bravo charlie delta echo foxtrot"),  # all distinct
            (3, "too short"),  # < 3 tokens -> 0 trigrams, frac 0.0
        ],
        "doc_id long, text string",
    )
    tri = _ngrams(F.split(F.lower("text"), r"\W+"), 3)
    n = F.size(tri)
    dup = n - F.size(F.array_distinct(tri))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            n.alias("n_tri"),
            F.when(n > 0, dup.cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("frac"),
        ).collect()
    }
    assert out[1]["n_tri"] == 4 and out[1]["frac"] == 0.75  # 1 distinct of 4
    assert out[2]["frac"] == 0.0
    assert out[3]["n_tri"] == 0 and out[3]["frac"] == 0.0


def test_contamination_flags_planted_overlap_only(spark):
    bench_text = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (23, bench_text),  # benchmark doc (id % 23 == 0)
            (24, "zz " + bench_text + " yy"),  # copies benchmark 5-grams
            (25, "totally different words with no shared run at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in contamination_overlap(
            docs, "doc_id", "text", lambda i: i % 23 == 0, n=5
        ).collect()
    }
    # doc 24 contains all 4 of the benchmark's 5-gram shingles; doc 25
    # and the benchmark doc itself are absent
    assert got == {24: 4}


def test_boilerplate_gate_flags_shared_template_only(spark, tmp_path):
    # 5 docs share the template trigram run; each also has unique text.
    # DF_MIN = 5, so exactly the template trigrams are boilerplate.
    template = "all rights reserved worldwide"  # 2 trigrams, df = 5
    rows = [
        (i, f"{template} unique{i}a unique{i}b unique{i}c") for i in range(5)
    ] + [(9, "completely fresh prose with no template at all")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r["doc_id"]: r
        for r in REGISTRY["q99_boilerplate_gate"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    for i in range(5):
        # 7 tokens -> 5 distinct trigrams; the 2 template ones hit df=5
        assert out[i]["n_shingles"] == 5
        assert out[i]["n_boiler"] == 2
        assert abs(out[i]["boiler_frac"] - 0.4) < 1e-12
    assert out[9]["n_boiler"] == 0 and out[9]["boiler_frac"] == 0.0


def test_event_funnel_orders_stages(spark, tmp_path):
    from datetime import datetime as dt

    def ts(h):
        return dt(2024, 1, 1, h)

    rows = [
        # user 1: clean signup -> view -> purchase
        (1, "signup", ts(1)), (1, "view", ts(2)), (1, "purchase", ts(3)),
        # user 2: purchase BEFORE the view chain completes -> stage view
        (2, "purchase", ts(1)), (2, "signup", ts(2)), (2, "view", ts(3)),
        # user 3: view before signup doesn't count -> stage signup
        (3, "view", ts(1)), (3, "signup", ts(2)),
        # user 4: never signs up -> excluded
        (4, "view", ts(1)), (4, "purchase", ts(2)),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r["user_id"]: r
        for r in REGISTRY["q100_event_funnel"].spark(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["stage"] == "purchase" and out[1]["purchase_ts"] == ts(3)
    assert out[2]["stage"] == "view" and out[2]["purchase_ts"] is None
    assert out[3]["stage"] == "signup"
    assert out[3]["view_ts"] is None and out[3]["purchase_ts"] is None


def test_quality_classifier_margin_is_exact_and_thresholded(spark, tmp_path):
    # Hand-computable model: margin = BIAS + sum of bucket weights, all
    # integer milli-units; keep <=> margin > 0. An empty doc drops out
    # (no tokens -> no feature row), same as the oracle's unnest.
    from ipes_data_pipeline_spark.queries.curation import (
        _QC_BIAS,
        _QC_D,
        _QC_MULT,
    )
    import hashlib

    rows = [
        (0, "alpha beta alpha"),
        (1, "gamma"),
        (2, ""),  # no tokens -> absent from output
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r["doc_id"]: r
        for r in REGISTRY["q170_quality_classifier"]
        .spark(spark, str(tmp_path))
        .collect()
    }

    def w(tok: str) -> int:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:13], 16) % _QC_D
        return ((b + 1) * _QC_MULT) % 2001 - 1000

    assert set(out) == {0, 1}
    assert out[0]["n_tok"] == 3
    assert out[0]["margin_milli"] == _QC_BIAS + 2 * w("alpha") + w("beta")
    assert out[1]["margin_milli"] == _QC_BIAS + w("gamma")
    for r in out.values():
        assert r["keep"] == (r["margin_milli"] > 0)


def test_q170w_weight_table_gear_matches_inline_and_broadcasts(spark, sf_dir):
    """The trained-weights gear (round-9 verdict #4): margins identical
    to q170's inline synthetic weights (the generated weight table
    matches by construction) AND the plan joins the weight table by
    BROADCAST — the shape a real fasttext/CCNet weight export must get."""
    from ipes_data_pipeline_spark.plans import assert_broadcast_join

    inline = REGISTRY["q170_quality_classifier"].spark(spark, sf_dir)
    weighted = REGISTRY["q170w_quality_classifier_weighted"].spark(
        spark, sf_dir
    )
    assert_broadcast_join(weighted, forbid_smj=True)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, weighted.collect())
    )
