"""Data-mixing + corpus-analysis queries (q105–q108).

The data-mixing leg of the training-data surface: weighted deterministic
sampling (the "sample sources proportional to quality×size" step of
corpus assembly), per-source lexical-diversity stats, PMI collocation
mining, and per-entity anomaly flagging. All pure DataFrame ops —
nothing here leaves whole-stage codegen — and every query carries a
DuckDB oracle.

Reference scope note: the reference has no mixing stage (its corpus is
one REST source, ``code/fetch.py``); these queries extend the declared
training-data operator set (SURVEY.md scope note, BASELINE north star).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ipes_data_pipeline_spark.functions.text import tokens
from ipes_data_pipeline_spark.operators.util import cut, spread
from ipes_data_pipeline_spark.queries import register, t

#: 2^52 — md5's first 13 hex chars as a uniform integer in [0, 2^52).
_U52 = float(1 << 52)

# DuckDB twin of functions.text.tokens (same as dataops.SQL_TOKENS).
_SQL_TOKENS = "list_filter(string_split_regex(lower({c}), '\\W+'), x -> x <> '')"


def _uniform(col):
    """Content-addressed uniform in (0,1): md5-hash bits of the id.

    Same family as q77/q85's bucket trick — the +0.5 keeps u strictly
    positive so ln(u) is finite. Both engines hash the same string to
    the same bits, so the "random" draw is reproducible anywhere.
    """
    bits = F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "double"
    )
    return (bits + F.lit(0.5)) / F.lit(_U52)


@register(
    "q105_weighted_sample",
    "mixing: deterministic weighted sample without replacement (A-Res)",
    f"""WITH k AS (
         SELECT doc_id, lang, n_chars,
                ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                   / {_U52!r}) / n_chars AS key
         FROM documents)
       SELECT doc_id, lang, n_chars
       FROM k ORDER BY key DESC, doc_id LIMIT 50""",
)
def q105(spark, sf):
    # Efraimidis–Spirakis A-Res: rank by ln(u)/w (u uniform, w = weight)
    # and keep the top k — an exact weighted sample without replacement.
    # With a hash-derived u the sample is a pure function of the ids:
    # stable under reshuffles, appends only displace losers. One
    # TakeOrderedAndProject over a scan — no shuffle at any scale; at
    # 100 TB each task offers its local top-50 and the driver merges.
    d = t(spark, sf, "documents")
    key = F.log(_uniform(F.col("doc_id"))) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("key"))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(50)
        .drop("key")
    )


@register(
    "q106_lexical_diversity",
    "mixing: per-source type-token ratio (vocabulary richness gate)",
    f"""WITH tk AS (SELECT source, doc_id, unnest({_SQL_TOKENS.format(c="text")}) AS tok
                    FROM documents)
       SELECT source,
              COUNT(*) AS n_tokens,
              COUNT(DISTINCT tok) AS n_types,
              COUNT(DISTINCT doc_id) AS n_docs,
              round(COUNT(DISTINCT tok) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr
       FROM tk GROUP BY source""",
)
def q106(spark, sf):
    # Corpus-mixing diagnostic: sources whose token stream has a
    # collapsed vocabulary (low type-token ratio) are boilerplate/spam
    # candidates for down-weighting in q105's weights. One explode, one
    # shuffle keyed on source; the two COUNT(DISTINCT)s share it
    # (Spark plans expand + two-phase distinct aggregation).
    tk = (
        spread(t(spark, sf, "documents"))
        .select("source", "doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    return tk.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_types"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.countDistinct("tok") / F.count(F.lit(1)), 6).alias("ttr"),
    )


def _q107_oracle() -> str:
    toks = _SQL_TOKENS.format(c="text")
    return f"""
WITH tk AS (SELECT {toks} AS w FROM documents),
uni AS (SELECT unnest(w) AS tok FROM tk),
uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
bg AS (SELECT unnest(CASE WHEN len(w) >= 2
                          THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
                          ELSE [] END) AS bigram
       FROM tk),
bc AS (SELECT bigram, COUNT(*) AS c_ab FROM bg GROUP BY bigram),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS n_uni, (SELECT COUNT(*) FROM bg) AS n_big)
SELECT bigram, c_ab,
       round(ln((c_ab / (CAST(a.c AS DOUBLE) * b.c))
                * (CAST(n_uni AS DOUBLE) * n_uni / n_big)), 6) AS pmi
FROM bc, tot
JOIN uc a ON a.tok = string_split(bigram, ' ')[1]
JOIN uc b ON b.tok = string_split(bigram, ' ')[2]
WHERE c_ab >= 5
ORDER BY pmi DESC, bigram LIMIT 50
"""


@register(
    "q107_pmi_collocations",
    "mixing: PMI-scored collocations (multi-word expression mining)",
    _q107_oracle(),
)
def q107(spark, sf):
    # Pointwise mutual information over adjacent token pairs: the
    # collocation scan used to mine multi-word vocabulary entries.
    # Token stream is materialized once and feeds both the unigram and
    # bigram rollups; totals ride along as 1-row broadcast cross joins;
    # the two unigram-count joins are vocab-sized (broadcast under AQE).
    # The double math is written with identical operation order in both
    # engines (products of exact counts, then one ln), so rounding to 6
    # decimals hashes identically.
    d = (
        spread(t(spark, sf, "documents"))
        .select(tokens(F.col("text")).alias("w"))
        .transform(cut)  # feeds 2 rollups with different shapes
    )
    uni = d.select(F.explode("w").alias("tok"))
    bigram_arr = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("w"), i.cast("int")),
                F.element_at(F.col("w"), (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = d.select(F.explode(bigram_arr).alias("bigram"))
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    bc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_ab"))
    tot = uni.agg(F.count(F.lit(1)).alias("n_uni")).crossJoin(
        bg.agg(F.count(F.lit(1)).alias("n_big"))
    )
    a = uc.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    b = uc.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") / (F.col("c_a").cast("double") * F.col("c_b")))
            * (F.col("n_uni").cast("double") * F.col("n_uni") / F.col("n_big"))
        ),
        6,
    )
    return (
        bc.where(F.col("c_ab") >= 5)
        .crossJoin(F.broadcast(tot))
        .join(a, F.element_at(F.split("bigram", " "), 1) == F.col("tok_a"))
        .join(b, F.element_at(F.split("bigram", " "), 2) == F.col("tok_b"))
        .select("bigram", "c_ab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(50)
    )


@register(
    "q108_zscore_anomaly",
    "mixing: per-user 3-sigma outlier events (decimal-exact moments)",
    """WITH st AS (
         SELECT user_id,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
                CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS q,
                COUNT(value) AS c
         FROM events WHERE value IS NOT NULL GROUP BY user_id)
       SELECT e.event_id, e.user_id, e.value
       FROM events e JOIN st ON e.user_id = st.user_id
       WHERE e.value IS NOT NULL AND st.c >= 30
         AND (e.value - s / c) * (e.value - s / c) > 9.0 * ((q - s * s / c) / c)""",
)
def q108(spark, sf):
    # Per-entity outlier gate (the "drop corrupt meter readings" step):
    # an event is anomalous when (v - mean)² > 9·variance — the 3-sigma
    # test squared, so no sqrt enters the comparison. Moments come from
    # exact decimal sums (cast to double only once, in the same order
    # in both engines), making the flag deterministic cross-engine.
    # Window over user_id: one shuffle, stats and filter in one pass —
    # no join back of a stats table.
    ev = t(spark, sf, "events").where(F.col("value").isNotNull())
    w = W.partitionBy("user_id")
    dv = F.col("value").cast("decimal(18,6)")
    s = F.sum(dv).over(w).cast("double")
    q = F.sum(dv * dv).over(w).cast("double")
    c = F.count("value").over(w)
    flagged = (F.col("value") - s / c) * (F.col("value") - s / c) > F.lit(9.0) * (
        (q - s * s / c) / c
    )
    return (
        ev.withColumn("__flag", flagged & (c >= 30))
        .where("__flag")
        .select("event_id", "user_id", "value")
    )


@register(
    "q116_mix_epoch_plan",
    "mixing: temperature-scaled mixture plan (p_s ~ n_s^alpha, alpha=0.5) "
    "with per-source token budgets and repetition factors",
    f"""WITH per AS (
         SELECT source,
                CAST(SUM(len({_SQL_TOKENS.format(c='text')})) AS BIGINT) AS n_tokens
         FROM documents GROUP BY source)
       SELECT source, n_tokens,
              sqrt(CAST(n_tokens AS DOUBLE))
                / SUM(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS mix_p,
              500000.0 * sqrt(CAST(n_tokens AS DOUBLE))
                / SUM(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS target_tokens,
              500000.0 * sqrt(CAST(n_tokens AS DOUBLE))
                / SUM(sqrt(CAST(n_tokens AS DOUBLE))) OVER ()
                / CAST(n_tokens AS DOUBLE) AS epochs
       FROM per""",
)
def q116(spark, sf):
    # Temperature-scaled sampling (alpha = 1/T = 0.5): the standard fix
    # for head-domain domination when assembling a training mixture —
    # small sources are up-weighted, p_s ~ n_s^alpha. The output is the
    # mixing PLAN: per-source probability, token budget out of a 500k
    # target, and the repetition factor (epochs > 1 means the source
    # repeats). One scan -> 20-row aggregate; the window normalization
    # runs over the tiny per-source table, so the plan costs one
    # map-side-combined shuffle regardless of corpus size.
    per = (
        t(spark, sf, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"))
    )
    root = F.sqrt(F.col("n_tokens").cast("double"))
    z = F.sum(root).over(W.partitionBy())
    return per.select(
        "source",
        "n_tokens",
        (root / z).alias("mix_p"),
        (F.lit(500000.0) * root / z).alias("target_tokens"),
        (F.lit(500000.0) * root / z / F.col("n_tokens").cast("double")).alias(
            "epochs"
        ),
    )


@register(
    "q131_source_token_budget",
    "mixing: greedy per-source token-budget fill — the doc-level "
    "materialization of a mixing plan (q116 computes targets; this "
    "selects the documents under each source's cap)",
    f"""WITH d AS (
         SELECT doc_id, source,
                CAST(len({_SQL_TOKENS.format(c='text')}) AS BIGINT) AS n_tokens
         FROM documents),
       c AS (
         SELECT doc_id, source, n_tokens,
                CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS cum_tokens
         FROM d)
       SELECT doc_id, source, n_tokens, cum_tokens,
              (cum_tokens <= 3000) AS selected
       FROM c""",
)
def q131(spark, sf):
    # Greedy budget fill: walk each source's documents in a deterministic
    # order (doc_id here; production would order by a quality score) and
    # keep rows while the running token total fits the source's budget.
    # The running sum uses the TWO-PASS prefix form
    # (operators.prefix.grouped_running_sum): per-(source, range-shard)
    # local cumsums plus a broadcast offset table, so a single giant
    # source never serializes into one window task — values are
    # identical to the naive window (equivalence-tested), which is what
    # keeps the SQL oracle unchanged.
    from ipes_data_pipeline_spark.operators.prefix import grouped_running_sum

    d = t(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return grouped_running_sum(
        d, "source", "doc_id", "n_tokens", out_col="cum_tokens"
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= F.lit(3000)).alias("selected"),
    )


@register(
    "q135_stratified_sample",
    "mixing: stratified weighted sample — per-source A-Res top-k via "
    "grouped_topk's map-side pre-reduce (each stratum gets an exact "
    "weighted sample without replacement; exchange bounded by "
    "k x strata x partitions, not corpus size)",
    f"""WITH k AS (
         SELECT doc_id, source, n_chars,
                ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                   / {_U52!r}) / n_chars AS key
         FROM documents),
       r AS (
         SELECT doc_id, source, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY key DESC, doc_id) AS rn
         FROM k)
       SELECT doc_id, source, n_chars FROM r WHERE rn <= 10""",
)
def q135(spark, sf):
    # q105's A-Res draw applied per stratum: rank ln(u)/w inside each
    # source and keep that source's top 10 — every stratum gets an exact
    # weighted sample without replacement, reshuffle/append-stable
    # because u is hash-derived from the id. grouped_topk's combiner
    # keeps <=10 rows per source per input partition before the window
    # shuffle, so the exchange carries k x strata x partitions rows, not
    # the corpus.
    from ipes_data_pipeline_spark.operators.topk import grouped_topk

    d = t(spark, sf, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        (F.log(_uniform(F.col("doc_id"))) / F.col("n_chars")).alias("ares_key"),
    )
    return grouped_topk(
        d, ["source"], "ares_key", k=10, tiebreak_col="doc_id"
    ).select("doc_id", "source", "n_chars")
