"""Similarity search over embedding columns.

- :func:`ann_topk_bruteforce` — exact cosine top-k against one query
  vector. One scan + TakeOrderedAndProject; the correctness baseline.
- :func:`cosine_topk_pairs_lsh` — sign-LSH bucketed pair generation +
  exact refine; the scale path (shuffle key = bucket, no cross join).
- :func:`ann_topk_ivf` — IVF-style: assign vectors to the nearest of k
  deterministic centroid vectors (bucketing), probe only the query's
  cells. Demonstrates the partition-pruned ANN shape on the same API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.functions.vectors import cosine, dot, norm, sign_bucket


def ann_topk_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, query_df: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against a (broadcast) 1-row query vector."""
    q = F.broadcast(query_df.select(F.col(vec_col).alias("q_vec")))
    scored = df.crossJoin(q).select(
        F.col(id_col).alias("id"),
        cosine(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("id")).limit(k)


def cosine_topk_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: tuple[int, ...] = (1, 9, 17, 25),
    k: int = 50,
) -> DataFrame:
    """Top-k most-similar pairs among sign-LSH bucket candidates."""
    # materialize: referenced on both sides of the self-join (avoids
    # recomputing the scan + bucket per alias). Norms precompute per
    # VECTOR, not per pair — higher-order array folds don't codegen, so
    # paying |V| folds instead of 2|pairs| is the dominant win here.
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_bucket(F.col(vec_col), dims).alias("bkt"),
        norm(F.col(vec_col)).alias("nrm"),
    ).localCheckpoint(eager=True)
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b, on=[F.col("a.bkt") == F.col("b.bkt"), F.col("a.id") < F.col("b.id")]
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias(
            "cos_sim"
        ),
    )
    return pairs.orderBy(F.desc("cos_sim"), F.asc("id_a"), F.asc("id_b")).limit(k)


def ann_topk_ivf_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    n_cells: int = 8,
    k: int = 10,
    n_probe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN with *learned* cells: k-means centroids partition the
    vector space; search probes the ``n_probe`` cells nearest the query.

    The scale shape is identical to :func:`ann_topk_ivf` (equi-join on a
    cell id — no cross join); the cells are simply better balanced than
    coordinate sign planes. Training cost is one pass over a sample;
    assignment is a per-row argmin over ``n_cells`` centroids (JVM-side
    via the fitted model's transform). Declared as a rows-only-checked
    query: k-means results depend on init sampling, so no cross-engine
    value oracle exists (the exactness baseline remains
    :func:`ann_topk_bruteforce`).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feat.select("features"))
    assigned = model.transform(feat).select(
        "id", "v", F.col("prediction").alias("cell")
    )
    q_assigned = model.transform(
        query_df.select(
            F.col(vec_col).alias("q_vec"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias(
                "features"
            ),
        )
    ).select("q_vec", F.col("prediction").alias("q_cell"))
    # n_probe=1 probes the query's own cell; >1 would rank cells by
    # centroid distance (left for the caller via model.clusterCenters())
    q = F.broadcast(q_assigned.limit(n_probe))
    return (
        assigned.join(q, assigned.cell == F.col("q_cell"))
        .select(F.col("id"), cosine(F.col("v"), F.col("q_vec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("id"))
        .limit(k)
    )


def ann_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    n_cells: int = 8,
    probe_dims: tuple[int, ...] = (1, 9, 17),
    k: int = 10,
) -> DataFrame:
    """IVF-shaped ANN: coarse-quantize by sign bucket on ``probe_dims``
    (a deterministic stand-in for k-means cells), search only the query's
    cell. Recall < 1 by design; the exactness baseline is
    :func:`ann_topk_bruteforce`.
    """
    cell = sign_bucket(F.col(vec_col), probe_dims)
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), cell.alias("cell"))
    q = F.broadcast(
        query_df.select(F.col(vec_col).alias("q_vec"), cell.alias("q_cell"))
    )
    return (
        keyed.join(q, keyed.cell == F.col("q_cell"))
        .select(F.col("id"), cosine(F.col("v"), F.col("q_vec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("id"))
        .limit(k)
    )
