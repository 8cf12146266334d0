"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


#: Session conf flipping EVERY cut site to fault-tolerant checkpoints at
#: once — a 100 TB operator chain assembled from library defaults would
#: otherwise silently use localCheckpoint unless `reliable=True` were
#: threaded through every call. Cluster side: set
#: `spark.ipes.reliableCuts=true` (plus `setCheckpointDir` to HDFS/S3)
#: and all operators run in the durable regime unmodified.
RELIABLE_CUTS_CONF = "spark.ipes.reliableCuts"


def cut(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — the repo's standard
    barrier before a frame is referenced from multiple plan subtrees
    (self-joins, iterative rounds, multi-pass shards).

    Two durability regimes:

    - ``reliable=False`` (default): ``localCheckpoint(eager=True)``.
      Blocks live on executor local store — fastest, and the right
      default for interactive/bench work — but NOT fault-tolerant: lose
      one executor mid-job and the lineage is gone, the job dies.
    - ``reliable=True``: ``checkpoint(eager=True)`` to the session's
      checkpoint directory (``spark.sparkContext.setCheckpointDir`` —
      HDFS/S3 on a real cluster). Survives executor loss; this is the
      regime a multi-hour 100 TB run must use on every operator that
      cuts lineage, at the price of one distributed write+read.

    The per-call flag is OR-ed with the session conf
    ``spark.ipes.reliableCuts`` (default ``false``): setting the conf
    to ``true`` promotes every cut in the session to the durable
    regime without touching call sites. There is deliberately no
    conf that *demotes* an explicit ``reliable=True``.

    Both regimes pin partition contents AND partition ids, so
    downstream ``spark_partition_id`` determinism (the prefix-sum shard
    contract — SCALING.md case study) holds identically.
    """
    if not reliable:
        reliable = (
            str(
                df.sparkSession.conf.get(RELIABLE_CUTS_CONF, "false")
            ).lower()
            == "true"
        )
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY if the input is under-parallel.

    CPU-heavy per-row stages (minhash signatures, simhash bits, rolling
    hashes) inherit the scan's partitioning; a small parquet file can be
    a single row-group → a single task hogging one core while 31 idle.
    At real scale the input already has ≥ parallelism partitions and this
    is a no-op — so the shuffle cost is only ever paid when it buys
    actual parallelism on small inputs.
    """
    target = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
