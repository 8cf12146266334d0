"""Bronze: flatten nested ingest records (reference ``code/fetch.py:101-191``).

The reference walks nested dicts with ``safe_get`` and joins list fields
into `"; "` strings; here nested access is null-safe column paths and
list fields stay typed arrays (`F.transform` to project a struct field
out of each element). `"; "` joins happen only in the CSV export shim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _names(col: str) -> object:
    """array<struct<name,...>> → array<string>, empty entries dropped."""
    return F.filter(
        F.transform(F.coalesce(F.col(col), F.array()), lambda x: x["name"]),
        lambda n: n.isNotNull() & (F.length(F.trim(n)) > 0),
    )


def flatten_filings(raw: DataFrame) -> DataFrame:
    """Nested bronze record → flat typed filing (RAW_FILING_FLAT shape)."""
    first_filer = F.element_at(_names("filers"), 1)
    return raw.select(
        F.col("id_submission").alias("submission_id"),
        F.coalesce(first_filer, F.lit("")).alias("company_name"),
        # reference truncates the ISO timestamp to 10 chars (fetch.py:181);
        # the typed equivalent is a date coercion with null-on-failure.
        F.to_date(F.substring(F.col("date_received"), 1, 10)).alias("date_received"),
        F.coalesce(F.col("submissiontype.description"), F.lit("")).alias(
            "submission_type"
        ),
        F.array_distinct(
            F.filter(
                F.transform(
                    F.coalesce(F.col("proceedings"), F.array()), lambda p: p["name"]
                ),
                lambda n: n.isNotNull() & (F.length(n) > 0),
            )
        ).alias("docket_numbers"),
        F.substring(
            F.coalesce(
                F.element_at(
                    F.transform(
                        F.coalesce(F.col("proceedings"), F.array()),
                        lambda p: p["description"],
                    ),
                    1,
                ),
                F.lit(""),
            ),
            1,
            200,  # reference caps the description at 200 chars (fetch.py:184)
        ).alias("proceeding_description"),
        F.array_distinct(
            F.filter(
                F.transform(
                    F.coalesce(F.col("proceedings"), F.array()),
                    lambda p: p["bureau_name"],
                ),
                lambda n: n.isNotNull() & (F.length(n) > 0),
            )
        ).alias("bureaus"),
        F.coalesce(F.col("filingstatus.description"), F.lit("")).alias(
            "filing_status"
        ),
        _names("authors").alias("contact_attorneys"),
        _names("lawfirms").alias("law_firms"),
        F.filter(
            F.transform(F.coalesce(F.col("documents"), F.array()), lambda d: d["src"]),
            lambda u: u.isNotNull() & (F.length(u) > 0),
        ).alias("document_urls"),
        F.concat(
            F.lit("https://www.fcc.gov/ecfs/search/search-filings/filing/"),
            F.col("id_submission"),
        ).alias("detail_url"),
    )


def export_csv_shim(flat: DataFrame) -> DataFrame:
    """Legacy-compatible view: arrays as `"; "`-joined strings (only for
    CSV export parity with the reference; never used internally)."""
    out = flat
    for c in ("docket_numbers", "bureaus", "contact_attorneys", "law_firms", "document_urls"):
        out = out.withColumn(c, F.array_join(F.col(c), "; "))
    return out
