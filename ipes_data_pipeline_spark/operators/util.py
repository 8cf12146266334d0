"""Shared operator utilities."""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

#: parquet-spill scratch dirs created by cut(via_parquet=True) in this
#: process, removed at interpreter exit (they must outlive every action
#: on the returned frame, so per-call cleanup is impossible).
_SPILL_DIRS: list[str] = []


def _cleanup_spill_dirs() -> None:
    for d in _SPILL_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_spill_dirs)


#: Session conf flipping EVERY cut site to fault-tolerant checkpoints at
#: once — a 100 TB operator chain assembled from library defaults would
#: otherwise silently use localCheckpoint unless `reliable=True` were
#: threaded through every call. Cluster side: set
#: `spark.ipes.reliableCuts=true` (plus `setCheckpointDir` to HDFS/S3)
#: and all operators run in the durable regime unmodified.
RELIABLE_CUTS_CONF = "spark.ipes.reliableCuts"


def cut(
    df: DataFrame, reliable: bool = False, via_parquet: bool = False
) -> DataFrame:
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

    Third regime, for LARGE intermediates: ``via_parquet=True`` spills
    the frame to a columnar scratch file and returns the re-read —
    compressed, off-heap, schema-preserving. Round-9 measurement
    (``scripts/ab_q39_edge_store.py``, q39's 213M-row edge set at sf10,
    fresh process per variant): raw compute 204 s, +182 s with
    localCheckpoint (the deserialized row blocks thrash a 48 GB heap),
    **+26 s with the parquet spill** — 7× cheaper materialization at
    scale, within noise of localCheckpoint on small frames. This is the
    regime for operators that materialize row sets PROPORTIONAL TO THE
    DATA (edge lists, pair candidates); small reused frames (labels,
    centroids, top-k lists) stay on the default. On a cluster the
    scratch path inherits fault tolerance from its filesystem, so
    ``via_parquet`` also satisfies the ``reliable`` contract.
    Order-sensitive callers beware: parquet re-read does NOT pin
    partition ids the way the checkpoint regimes do — do not use under
    a ``spark_partition_id`` consumer (the prefix-sum shard contract) —
    and column nullability loosens to nullable on the round trip
    (names/types/values are exact).

    Both checkpoint regimes pin partition contents AND partition ids,
    so downstream ``spark_partition_id`` determinism (the prefix-sum
    shard contract — SCALING.md case study) holds identically.
    """
    if via_parquet:
        path = tempfile.mkdtemp(prefix=f"ipes_cut_{uuid.uuid4().hex[:8]}_")
        _SPILL_DIRS.append(path)
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
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
