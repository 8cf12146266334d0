"""Z-order layout: files written from a Z-curve ordering have tight
min/max envelopes on EVERY zorder column at once, so a 2-D box
predicate prunes (by parquet footer stats) far more files than a
time-sorted layout can — the property that makes the layout worth a
compaction rewrite at 100 TB.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.layout import zorder_by
from ipes_data_pipeline_spark.queries import t
from tests.conftest import SF_SMOKE

SF_MID = "/root/testdata/sf0.01"  # 10k events: enough rows for 16 real files

N_FILES = 16


def _overlapping_files(path: str, box: dict[str, tuple[float, float]]) -> int:
    """Files whose [min,max] footer stats intersect the predicate box —
    exactly the files a stats-based reader must open."""
    hit = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        overlaps = True
        for col, (lo, hi) in box.items():
            c_lo, c_hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names.index(col)).statistics
                c_lo = st.min if c_lo is None else min(c_lo, st.min)
                c_hi = st.max if c_hi is None else max(c_hi, st.max)
            if c_hi < lo or c_lo > hi:
                overlaps = False
                break
        if overlaps:
            hit += 1
    return hit


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    ev = t(spark, SF_MID, "events").select("user_id", "value", "ts")
    nat, zed = str(base / "natural"), str(base / "zorder")
    # natural = time-ordered ingest (the layout data arrives in)
    ev.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(nat)
    zorder_by(ev, ["user_id", "value"], num_partitions=N_FILES).write.mode(
        "overwrite"
    ).parquet(zed)
    return nat, zed


def test_zorder_prunes_2d_box_better_than_time_layout(spark, layouts):
    nat, zed = layouts
    # narrow band in both dimensions (user_id spans 0-149, value 0-490)
    box = {"user_id": (40, 60), "value": (100.0, 160.0)}
    n_nat = _overlapping_files(nat, box)
    n_zed = _overlapping_files(zed, box)
    # time-sorted files all span the full user/value range -> no pruning
    assert n_nat == N_FILES
    assert n_zed < N_FILES / 2  # the curve confines the box to few files


def test_zorder_preserves_rows_exactly(spark, layouts):
    nat, zed = layouts
    a = spark.read.parquet(nat).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("user_id", "value")).alias("h"),
    ).first()
    b = spark.read.parquet(zed).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("user_id", "value")).alias("h"),
    ).first()
    assert (a["n"], a["h"]) == (b["n"], b["h"]) and a["n"] > 0


def test_zorder_validates_inputs(spark):
    df = t(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="at least one column"):
        zorder_by(df, [])
    with pytest.raises(ValueError, match="63-bit"):
        zorder_by(df, ["user_id", "value"], bits=32)
