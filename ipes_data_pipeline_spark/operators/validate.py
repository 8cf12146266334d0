"""Declarative record validation with quarantine + observed metrics
(replacing per-row Pydantic try/except, reference
``code/structure_data.py:263-309``).

Constraints are column expressions → one `is_valid` flag; invalid rows
are *quarantined*, not dropped-with-a-print; counts come from
``DataFrame.observe`` so they ride along with the write action instead
of costing extra passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ValidationResult:
    valid: DataFrame
    quarantine: DataFrame  # original columns + violated_constraints array
    observation: Observation  # .get after an action on `valid`

    #: names of all declared constraints, in order
    constraint_names: list[str] = field(default_factory=list)


def company_constraints() -> dict[str, Column]:
    """Company-dim constraints (mirrors the Pydantic contract
    schemas.py:20-29). A function, not a constant: Columns need an
    active session."""
    return {
        "id_not_null": F.col("id").isNotNull() & (F.length("id") > 0),
        "entity_name_not_null": F.col("entity_name").isNotNull()
        & (F.length(F.trim("entity_name")) > 0),
        "filing_count_nonneg": F.col("filing_count") >= 0,
        "entity_type_enum": F.col("entity_type").isin("Company", "Individual"),
    }


def validate(
    df: DataFrame, constraints: dict[str, Column], name: str = "validation"
) -> ValidationResult:
    # NULL-safe: a constraint evaluating to NULL (e.g. `col >= 0` on a
    # NULL value) is a VIOLATION, not a pass — bare `~NULL` is NULL and
    # F.when would silently classify the row valid, letting NULLs flow
    # into columns the schema contract declares non-nullable
    violated = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(cname)).otherwise(
                    F.lit(None)
                )
                for cname, cond in constraints.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    flagged = df.withColumn("violated_constraints", violated)
    valid = flagged.filter(F.size("violated_constraints") == 0).drop(
        "violated_constraints"
    )
    quarantine = flagged.filter(F.size("violated_constraints") > 0)
    obs = Observation(name)
    observed = valid.observe(obs, F.count(F.lit(1)).alias("valid_records"))
    return ValidationResult(
        observed, quarantine, obs, constraint_names=list(constraints)
    )


def validation_report(
    result: ValidationResult,
    sample_errors: int = 5,
    sample_col: str = "entity_name",
) -> dict:
    """Metrics dict matching the reference's validation_stats record
    (timestamp added by the telemetry sink). ``sample_col`` names the
    column shown in error samples — validate() takes arbitrary
    constraint sets, so the report must not assume the company schema.

    Self-contained: runs its own action on ``valid`` (which also
    populates the Observation). In the pipeline path the caller's write
    action is the trigger and the counts ride along for free —
    ``Observation.get`` blocks until *some* action touches the observed
    DataFrame.
    """
    quarantined = result.quarantine.select(
        F.col(sample_col).alias("name"),
        F.array_join("violated_constraints", ", ").alias("error"),
    )
    samples = [r.asDict() for r in quarantined.limit(sample_errors).collect()]
    n_invalid = result.quarantine.count()
    n_valid = result.valid.count()  # action → Observation populated too
    return {
        "total_processed": n_valid + n_invalid,
        "valid_records": n_valid,
        "invalid_records": n_invalid,
        "error_samples": samples,
    }
