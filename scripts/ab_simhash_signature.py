"""A/B/C the simhash signature stage (round-11, VERDICT item 1).

Variants over sf0.1 documents, interleaved passes, noop sink:

  A current  — r10 form: masks TRANSFORM inlined in all 32 folds
               (library simhash_signatures as of round 10)
  B staged   — masks collapsed ONCE into their own projection, folds
               reference the column attribute
  C legacy   — r9 form: 32 aggregate(transform(substring-compare)) over
               the hash array

Usage: python scripts/ab_simhash_signature.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ipes_data_pipeline_spark.functions.text import token_hashes, tokens
from ipes_data_pipeline_spark.operators.util import spread
from ipes_data_pipeline_spark.session import get_session

N_BITS = 32


def _hashed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = spread(docs).select(
        F.col("doc_id").alias("id"), tokens(F.col("text")).alias("toks")
    )
    return toks.select("id", token_hashes(F.col("toks")).alias("th"))


def _mask_expr(hash_col):
    return F.transform(
        hash_col,
        lambda h: F.conv(
            F.translate(
                F.substring(h, 1, N_BITS),
                "0123456789abcdef",
                "0000000011111111",
            ),
            2,
            10,
        ).cast("long"),
    )


def _fold_fn(d):
    return lambda acc, x: acc + F.shiftrightunsigned(
        x, N_BITS - 1 - d
    ).bitwiseAND(F.lit(1))


def _bits_from_masks(mask_col, n_tokens):
    bits = []
    for d in range(N_BITS):
        c = F.aggregate(mask_col, F.lit(0).cast("long"), _fold_fn(d))
        bits.append(F.when(c * 2 >= n_tokens, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def variant_a(spark, sf_dir):
    # current library form (masks inline)
    h = _hashed(spark, sf_dir)
    return h.select(
        "id", _bits_from_masks(_mask_expr(F.col("th")), F.size(F.col("th"))).alias("simhash")
    )


def variant_b(spark, sf_dir):
    # staged masks projection
    h = _hashed(spark, sf_dir)
    staged = h.select(
        "id", F.size(F.col("th")).alias("n"), _mask_expr(F.col("th")).alias("mk")
    )
    return staged.select(
        "id", _bits_from_masks(F.col("mk"), F.col("n")).alias("simhash")
    )


def variant_c(spark, sf_dir):
    # legacy r9 substring-compare form
    h = _hashed(spark, sf_dir)

    def contrib_fn(d):
        return lambda x: F.when(
            F.substring(x, d + 1, 1) >= "8", F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for d in range(N_BITS):
        contrib = F.transform(F.col("th"), contrib_fn(d))
        total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
        bits.append(F.when(total >= 0, F.lit("1")).otherwise(F.lit("0")))
    return h.select("id", F.concat(*bits).alias("simhash"))


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-simhash")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    variants = {"A_current": variant_a, "B_staged": variant_b, "C_legacy": variant_c}
    samples = {k: [] for k in variants}
    import gc

    for r in range(runs):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"simhash {k} pass {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[k].append(time.perf_counter() - t0)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
    for k, ts in samples.items():
        print(
            f"{k}: median {statistics.median(ts):.3f}  "
            f"runs [{' '.join(f'{t:.2f}' for t in ts)}]"
        )
    # sanity: identical outputs
    a = variant_a(spark, sf_dir)
    for k, fn in [("B", variant_b), ("C", variant_c)]:
        d = a.join(fn(spark, sf_dir).withColumnRenamed("simhash", "s2"), "id")
        bad = d.where(F.col("simhash") != F.col("s2")).count()
        print(f"A vs {k}: mismatched rows = {bad}")


if __name__ == "__main__":
    main()
