"""Silver: relevance filter → normalize → fuzzy dedup → star schema.

Re-expresses the reference's ``structure_data()`` megafunction
(``code/structure_data.py:125-311``) as composable DataFrame stages.
Divergences by design (SURVEY §2.3): order-independent canonical ids
(component min), real arrays instead of `"; "` strings, and the intended
(not dead) latest-filing sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.classify import (
    entity_type,
    is_applicant_filing,
    is_excluded_entity,
)
from ipes_data_pipeline_spark.operators.dedup_fuzzy import dedupe_fuzzy
from ipes_data_pipeline_spark.operators.normalize import (
    deterministic_key,
    normalize_name,
)

#: Relevance predicate terms (reference structure_data.py:136-146).
RELEVANCE_TERMS = ("voip", "52.15")
RELEVANCE_DOCKET = "inbox-52.15"


def filter_relevant(flat: DataFrame) -> DataFrame:
    """C1 OR-of-contains relevance filter + C7 blank-name guard."""
    desc = F.lower(F.col("proceeding_description"))
    dockets_lower = F.transform(F.col("docket_numbers"), lambda d: F.lower(d))
    # docket test is substring CONTAINMENT, like the reference's
    # `"inbox-52.15" in docket` (structure_data.py:138) — exact element
    # equality would drop filings whose docket merely contains the key
    # ("INBOX-52.15(g)(3)", "INBOX-52.15-A")
    relevant = (
        desc.contains(RELEVANCE_TERMS[0])
        | desc.contains(RELEVANCE_TERMS[1])
        | F.exists(dockets_lower, lambda d: d.contains(RELEVANCE_DOCKET))
    )
    return flat.filter(relevant & (F.length(F.trim(F.col("company_name"))) > 0))


def exclude_institutions(df: DataFrame, name_col: str = "company_name") -> DataFrame:
    """C2 regex anti-filter for bureaus/agencies."""
    return df.filter(~is_excluded_entity(name_col))


def with_normalized_names(df: DataFrame) -> DataFrame:
    return df.withColumn("normalized_name", normalize_name("company_name"))


def with_canonical_names(df: DataFrame, max_edits: int = 2) -> DataFrame:
    """F4 fuzzy dedup: canonical_name per connected component of
    near-duplicate normalized names (first-token blocking)."""
    names = df.select("normalized_name").distinct()
    mapping = dedupe_fuzzy(
        names.withColumn("name_id", F.col("normalized_name")),
        id_col="name_id",
        name_col="normalized_name",
        max_edits=max_edits,
    ).select(
        F.col("name_id").alias("normalized_name"),
        F.col("canonical_id").alias("canonical_name"),
    )
    # mapping is one row per distinct name — broadcastable in the silver
    # flow (distinct entity names ≪ filings).
    return df.join(F.broadcast(mapping), "normalized_name", "left").withColumn(
        "canonical_name", F.coalesce("canonical_name", "normalized_name")
    )


@dataclass
class StarSchema:
    companies: DataFrame
    filings: DataFrame
    companies_nested: DataFrame
    #: shared per-entity parent when built with ``persist=True``
    _gated: DataFrame | None = None

    def unpersist(self) -> None:
        if self._gated is not None:
            self._gated.unpersist()


def build_star(filings_flat: DataFrame, persist: bool = False) -> StarSchema:
    """Group filings per canonical entity → company dim + filing fact.

    One shuffle on ``canonical_name`` produces every per-entity aggregate
    (count, representative name via max_by-on-length, latest date,
    boolean ANY applicant flag, nested filing list) in a single pass —
    the reference does five Python loops over the same groups.

    ``persist=True`` caches that shared per-entity frame (MEMORY_AND_DISK,
    spillable) so writing companies, filings and the nested layer executes
    the aggregation — and everything upstream of it, including the dedup
    joins — once instead of once per sink. Call ``StarSchema.unpersist()``
    after the sinks run.
    """
    per_entity = filings_flat.groupBy("canonical_name").agg(
        F.max_by("company_name", F.length("company_name")).alias("entity_name"),
        F.count(F.lit(1)).cast("int").alias("filing_count"),
        F.max("date_received").alias("latest_filing_date"),
        F.max(F.when(is_applicant_filing("submission_type"), 1).otherwise(0)).alias(
            "_has_application"
        ),
        F.array_sort(
            F.collect_list(
                F.struct(
                    "date_received",
                    F.col("submission_id").alias("filing_id"),
                    "submission_type",
                    "filing_status",
                    "docket_numbers",
                    "document_urls",
                )
            )
        ).alias("_filings_asc"),
    )
    # Final applicant gate (C5): company emitted only if it has an
    # application-type filing and is not an individual.
    # classification input = the RAW representative name (max_by length),
    # as the reference does (structure_data.py:218-222): suffixes like
    # "Inc." are the strongest company signal and canonical_name has had
    # them normalized away
    gated = (
        per_entity.withColumn("entity_type", entity_type("entity_name"))
        .filter((F.col("_has_application") == 1) & (F.col("entity_type") == "Company"))
        .withColumn("id", deterministic_key("canonical_name"))
    )
    if persist:
        gated = gated.persist()
    companies = gated.select(
        "id",
        "entity_name",
        F.col("canonical_name").alias("normalized_name"),
        "entity_type",
        "filing_count",
        "latest_filing_date",
    ).orderBy(F.desc("latest_filing_date"), "id")  # intended semantics of the
    # reference's dead sort (structure_data.py:274-278, SURVEY §2.3.1)

    companies_nested = gated.select(
        "id",
        "entity_name",
        F.col("canonical_name").alias("normalized_name"),
        "filing_count",
        F.reverse(F.col("_filings_asc")).alias("filings"),  # desc by date
    )

    filings = companies_nested.select(
        F.col("id").alias("company_id"), F.explode("filings").alias("f")
    ).select(
        "company_id",
        F.col("f.filing_id").alias("filing_id"),
        F.col("f.date_received").alias("date_received"),
        F.array_join(F.col("f.docket_numbers"), "; ").alias("docket_number"),
        F.col("f.submission_type").alias("submission_type"),
        F.col("f.filing_status").alias("status"),
        F.element_at(F.col("f.document_urls"), 1).alias("primary_doc_url"),
    )
    return StarSchema(
        companies, filings, companies_nested, _gated=gated if persist else None
    )


def structure(flat: DataFrame, max_edits: int = 2, persist: bool = False) -> StarSchema:
    """Full silver stage: filter → normalize → dedup → star."""
    relevant = with_normalized_names(exclude_institutions(filter_relevant(flat)))
    return build_star(with_canonical_names(relevant, max_edits), persist=persist)


#: Blocking key used by the fuzzy dedup (dedupe_fuzzy default): fuzzy
#: edges only form within a block, so entity components never span
#: blocks — the invariant the delta refresh below exploits.
def _block_key(name_col: str):
    return F.element_at(F.split(F.col(name_col), r"\s+"), 1)


def structure_delta(
    prev: StarSchema,
    full_flat: DataFrame,
    delta_flat: DataFrame,
    max_edits: int = 2,
) -> StarSchema:
    """Incremental silver refresh: recompute ONLY the entities whose
    dedup block is touched by the delta; splice everything else from the
    previous silver output unchanged.

    Correctness rests on the blocking invariant: a new filing can merge
    or extend components only within its normalized name's block, so
    entities in untouched blocks keep their canonical assignment, counts
    and nested filings bit-for-bit. At 100 TB this turns a daily refresh
    over the full corpus into one over the day's affected blocks.
    """
    delta_rel = with_normalized_names(
        exclude_institutions(filter_relevant(delta_flat))
    )
    affected_blocks = (
        delta_rel.select(_block_key("normalized_name").alias("blk")).distinct()
    )

    full_rel = with_normalized_names(
        exclude_institutions(filter_relevant(full_flat))
    ).withColumn("blk", _block_key("normalized_name"))
    affected_flat = full_rel.join(
        F.broadcast(affected_blocks), "blk", "left_semi"
    ).drop("blk")
    recomputed = build_star(with_canonical_names(affected_flat, max_edits))

    prev_keyed = prev.companies.withColumn("blk", _block_key("normalized_name"))
    untouched = prev_keyed.join(
        F.broadcast(affected_blocks), "blk", "left_anti"
    ).drop("blk")
    untouched_ids = untouched.select("id")
    untouched_filings = prev.filings.join(
        untouched_ids.withColumnRenamed("id", "company_id"),
        "company_id",
        "left_semi",
    )
    untouched_nested = prev.companies_nested.join(
        untouched_ids, "id", "left_semi"
    )
    return StarSchema(
        companies=untouched.unionByName(recomputed.companies),
        filings=untouched_filings.unionByName(recomputed.filings),
        companies_nested=untouched_nested.unionByName(
            recomputed.companies_nested
        ),
    )
