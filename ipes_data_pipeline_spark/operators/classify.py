"""Entity / filing classification predicates
(reference ``code/structure_data.py:56-115`` and ``:99-102``).

All pure column expressions — applied per-row before aggregation, then
combined per-entity with boolean ANY aggregates (E6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Institutional entities excluded from the company dimension — the
#: reference's EXCLUDE_PATTERNS list EXACTLY (structure_data.py:56-63):
#: bureau, FCC (anchored, as the reference anchors it), the commission,
#: NTIA, DOJ, NARUC. (An earlier port draft invented extra patterns and
#: omitted NTIA/NARUC — institutional entities leaked into gold while
#: legitimate names like "State of the Art Telecom" risked exclusion.)
EXCLUDED_ENTITY_PATTERN = (
    r"(?i)(wireline competition bureau|^fcc\b"
    r"|federal communications commission"
    r"|national telecommunications and information"
    r"|department of justice"
    r"|national association of regulatory)"
)

#: Submission types that mark an applicant (structure_data.py:99-102;
#: README also names the excluded classes COMMENT/REPLY/OPPOSITION).
APPLICANT_TYPE_PATTERN = "APPLICATION|REQUEST|PETITION"

#: Business keywords for the individual-vs-company heuristic — the
#: reference's business_indicators EXACTLY (structure_data.py:105-115):
#: substring containment over the lowercased RAW name (including
#: "co." — an earlier port draft dropped it and added invented extras).
BUSINESS_KEYWORD_PATTERN = (
    r"(llc|inc|corp|company|co\.|communications|telecom|voip|network"
    r"|services|solutions)"
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
    """≤3 tokens AND no business keyword ⇒ Individual.

    Classify on the RAW representative name, not the normalized/
    suffix-stripped one: the reference runs is_likely_individual on the
    longest raw variant (structure_data.py:222), where a legal suffix
    like "Inc." is the strongest company signal — normalization strips
    exactly those suffixes, so classifying post-normalization would
    misfile suffix-only companies as individuals."""
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
