"""Grouped top-k with map-side pre-reduction.

The window-function form (`row_number() OVER (PARTITION BY g ORDER BY v)
<= k`) is exact but shuffles EVERY row to its group's partition before
any row is discarded — at 100 TB the exchange carries the full table to
throw almost all of it away. `grouped_topk` bounds the exchange first:
each input partition locally keeps at most k rows per group (an
Arrow-batched pandas reduction — the combiner step Spark's window
operator doesn't have), then the exact window runs on the survivors.
Correctness: a group's global top-k rows are each in SOME partition's
local top-k, so the pre-reduce never drops a winner. Shuffle volume
drops from |rows| to ≤ k·|groups|·|partitions| — in the common skewed
case (few giant groups) orders of magnitude less.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
) -> DataFrame:
    """Exact top-k rows per group, ordered by ``order_col`` (desc by
    default) with ties broken by ascending ``tiebreak_col``."""
    cols = list(df.columns)
    # Spark's null ordering: desc() puts NULLS LAST, asc() NULLS FIRST.
    # pandas sort_values has ONE na_position for all keys, so sort in
    # two STABLE passes (tiebreak first, then order col) with the
    # matching na_position each — a single-pass sort with pandas'
    # default NaN-last would let the combiner drop a NULL row the exact
    # window below ranks first.
    na_order = "last" if descending else "first"

    def local_topk(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: a NULL group key is a group like any other in
            # the exact window pass below; the pre-reduce must keep its
            # local top-k too or the combiner drops winners.
            ordered = pdf.sort_values(
                tiebreak_col, ascending=True, na_position="first", kind="mergesort"
            ).sort_values(
                order_col,
                ascending=not descending,
                na_position=na_order,
                kind="mergesort",
            )
            yield ordered.groupby(group_cols, sort=False, dropna=False).head(k)

    pre = df.mapInPandas(local_topk, df.schema)
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tiebreak_col).asc(),
    ]
    w = W.partitionBy(*group_cols).orderBy(*order)
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
        .select(*cols)
    )


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    c: int = 60,
) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked candidate lists: ``rrf(d) = Σ_lists 1 / (c + rank_d)``,
    the standard score-free combiner of heterogeneous retrievers (BM25 +
    embedding ANN is the classic hybrid-search pair, q163).

    ``ranked`` maps a list name to a DataFrame holding ``id_col`` and
    ``rank_col`` (1-based; rows absent from a list contribute 0). The
    output carries one ``<name>_rank`` column per input list (nullable
    int) plus ``rrf_score`` rounded to 6 dp, ordered best-first.

    Physical shape: candidate lists are top-k truncations, so every
    input is k rows — the fusion is a chain of full outer joins over
    frames Catalyst broadcasts; corpus scale never reaches this
    operator (it lives downstream of the retrievers' own
    TakeOrderedAndProject). Determinism: the contribution sum runs in
    dict order with fixed double literals, so both engines fold the
    same IEEE values in the same order; final ties break on id.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused = None
    for name, frame in ranked.items():
        part = frame.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("int").alias(f"{name}_rank"),
        )
        fused = part if fused is None else fused.join(part, "id", "full")
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"{name}_rank").cast("double")),
            F.lit(0.0),
        )
        for name in ranked
    ]
    score = contribs[0]
    for contrib in contribs[1:]:
        score = score + contrib
    return fused.select(
        "id",
        *[F.col(f"{name}_rank") for name in ranked],
        F.round(score, 6).cast("double").alias("rrf_score"),
    ).orderBy(F.desc("rrf_score"), F.asc("id"))
