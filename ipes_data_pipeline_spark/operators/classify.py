"""Entity / filing classification predicates
(reference ``code/structure_data.py:56-115`` and ``:99-102``).

All pure column expressions — applied per-row before aggregation, then
combined per-entity with boolean ANY aggregates (E6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Institutional entities excluded from the company dimension
#: (reference structure_data.py:56-63 — bureaus, FCC, DOJ, …).
EXCLUDED_ENTITY_PATTERN = (
    r"(?i)(wireline competition bureau|federal communications commission"
    r"|\bfcc\b|department of justice|\bdoj\b|public utility commission"
    r"|state of \w+)"
)

#: Submission types that mark an applicant (structure_data.py:99-102;
#: README also names the excluded classes COMMENT/REPLY/OPPOSITION).
APPLICANT_TYPE_PATTERN = "APPLICATION|REQUEST|PETITION"

#: Business keywords for the individual-vs-company heuristic
#: (structure_data.py:105-115).
BUSINESS_KEYWORD_PATTERN = (
    r"(llc|inc|corp|company|communications|telecom|network|wireless|voip"
    r"|services|solutions|technologies|group|partners|associates|consulting)"
)


def is_excluded_entity(name_col) -> Column:
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    return c.rlike(EXCLUDED_ENTITY_PATTERN)


def is_applicant_filing(submission_type_col) -> Column:
    c = (
        F.col(submission_type_col)
        if isinstance(submission_type_col, str)
        else submission_type_col
    )
    return F.upper(c).rlike(APPLICANT_TYPE_PATTERN)


def is_individual(normalized_name_col) -> Column:
    """≤3 tokens AND no business keyword ⇒ Individual."""
    c = (
        F.col(normalized_name_col)
        if isinstance(normalized_name_col, str)
        else normalized_name_col
    )
    few_tokens = F.size(F.split(c, r"\s+")) <= 3
    no_biz = ~F.lower(c).rlike(BUSINESS_KEYWORD_PATTERN)
    return few_tokens & no_biz


def entity_type(normalized_name_col) -> Column:
    return F.when(is_individual(normalized_name_col), F.lit("Individual")).otherwise(
        F.lit("Company")
    )
