"""Incremental silver: the delta refresh over affected blocks must equal
the full rebuild, including merges the delta introduces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.pipeline.bronze import flatten_filings
from ipes_data_pipeline_spark.pipeline.silver import structure, structure_delta
from ipes_data_pipeline_spark.schemas import RAW_FILING_NESTED
from tests.fixtures import RAW_FILINGS, VOIP_PROC, raw_filing

#: wave 2: a new filing for an existing entity (touches the 'acme'
#: block), a brand-new entity (new block), and a near-duplicate that
#: must MERGE with an existing wave-1 entity (the initech block gains a
#: component edge only the delta provides)
DELTA_FILINGS = [
    raw_filing("d001", "Acme Telecom LLC", date="2024-09-01T00:00:00Z",
               stype="APPLICATION", proceedings=[VOIP_PROC]),
    raw_filing("d002", "Nakatomi Trading Networks", stype="APPLICATION",
               proceedings=[VOIP_PROC]),
    raw_filing("d003", "Initech Voice Services, L.L.C.", stype="SUPPLEMENT",
               proceedings=[VOIP_PROC]),
]


def canon_companies(star):
    return sorted(
        (r["normalized_name"], r["id"], r["filing_count"],
         str(r["latest_filing_date"]))
        for r in star.companies.collect()
    )


def canon_filings(star):
    return sorted(
        (r["company_id"], r["filing_id"]) for r in star.filings.collect()
    )


def test_delta_refresh_equals_full_rebuild(spark):
    wave1 = spark.createDataFrame(RAW_FILINGS, RAW_FILING_NESTED)
    delta = spark.createDataFrame(DELTA_FILINGS, RAW_FILING_NESTED)
    flat1, flat_d = flatten_filings(wave1), flatten_filings(delta)
    full_flat = flat1.unionByName(flat_d)

    prev = structure(flat1)
    incremental = structure_delta(prev, full_flat, flat_d)
    full = structure(full_flat)

    assert canon_companies(incremental) == canon_companies(full)
    assert canon_filings(incremental) == canon_filings(full)

    # the delta actually exercised all three cases
    names = {r["normalized_name"] for r in incremental.companies.collect()}
    assert "nakatomi trading networks" in names  # new entity
    acme = [r for r in incremental.companies.collect()
            if r["normalized_name"] == "acme telecom"][0]
    assert acme["filing_count"] == 3  # wave-1 two + delta one
    # untouched entities carried over bit-for-bit (same ids)
    prev_ids = {r["normalized_name"]: r["id"] for r in prev.companies.collect()}
    inc_ids = {r["normalized_name"]: r["id"]
               for r in incremental.companies.collect()}
    assert inc_ids["stratus network"] == prev_ids["stratus network"]


def test_delta_refresh_limits_recompute(spark):
    """Entities in untouched blocks come from prev, not recomputation:
    corrupt prev's stratus row and verify the corruption survives (proof
    the row was spliced, not recomputed)."""
    wave1 = spark.createDataFrame(RAW_FILINGS, RAW_FILING_NESTED)
    delta = spark.createDataFrame(DELTA_FILINGS, RAW_FILING_NESTED)
    flat1, flat_d = flatten_filings(wave1), flatten_filings(delta)
    full_flat = flat1.unionByName(flat_d)

    prev = structure(flat1)
    poisoned_companies = prev.companies.withColumn(
        "filing_count",
        F.when(F.col("normalized_name") == "stratus network", 999).otherwise(
            F.col("filing_count")
        ),
    )
    from ipes_data_pipeline_spark.pipeline.silver import StarSchema

    poisoned = StarSchema(poisoned_companies, prev.filings, prev.companies_nested)
    inc = structure_delta(poisoned, full_flat, flat_d)
    rows = {r["normalized_name"]: r for r in inc.companies.collect()}
    assert rows["stratus network"]["filing_count"] == 999  # spliced from prev
    assert rows["acme telecom"]["filing_count"] == 3  # recomputed fresh
