"""Entity-name normalization (reference ``code/structure_data.py:66-122``)
and filename sanitization (``code/download_pdfs_robust.py:42-49``),
re-expressed as chained JVM-side regexp column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Legal-suffix patterns (case-insensitive), mirroring the reference's four
#: regex passes: LLC/Inc/Corp/Ltd/LP/LLP/PLLC/PC + "d/b/a …" tails.
_SUFFIX_PATTERNS = [
    r"(?i),?\s+(l\.?l\.?c\.?|inc\.?|incorporated|corp\.?|corporation|ltd\.?|limited|l\.?p\.?|llp|pllc|p\.?c\.?|co\.?|company)\s*$",
    r"(?i)\s+d/?b/?a\s+.*$",
]


def normalize_name(col) -> Column:
    """lower → trim → strip legal suffixes → strip punctuation → collapse.

    Idempotent (property-tested): norm(norm(x)) == norm(x).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    for pat in _SUFFIX_PATTERNS:
        c = F.regexp_replace(c, pat, "")
        c = F.regexp_replace(c, pat, "")  # twice: "X, Inc., LLC"-style stacks
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def deterministic_key(col) -> Column:
    """Stable surrogate key of a normalized name (reference uses UUIDv5,
    structure_data.py:118-122; sha2-256 is the engine default — both are
    pure functions of the name, which is the property that matters)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def sanitize_filename(col, max_len: int = 80) -> Column:
    """Filesystem-safe name: forbidden chars → '_', collapse, cap length."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[^\w\-. ]", "_")
    c = F.regexp_replace(c, r"_+", "_")
    return F.substring(F.trim(c), 1, max_len)
