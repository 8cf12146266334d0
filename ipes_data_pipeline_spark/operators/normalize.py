"""Entity-name normalization (reference ``code/structure_data.py:66-122``)
and filename sanitization (``code/download_pdfs_robust.py:42-49``),
re-expressed as chained JVM-side regexp column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Legal suffixes (case-insensitive), mirroring the reference's regex
#: passes: LLC/Inc/Corp/Ltd/LP/LLP/PLLC/PC + "d/b/a …" tails.
_SUFFIX_CORE = (
    r"l\.?l\.?c\.?|inc\.?|incorporated|corp\.?|corporation|ltd\.?|limited"
    r"|l\.?p\.?|llp|pllc|p\.?c\.?|co\.?|company"
)
#: One pass strips an ENTIRE trailing suffix stack ("X, Inc., LLC"),
#: not one element — a bounded per-pattern repeat can always be beaten
#: by a deeper stack, which is how the idempotence property test first
#: broke this function.
_SUFFIX_STACK = rf"(?i)(?:,?\s+(?:{_SUFFIX_CORE}))+[\s,]*$"
_DBA_TAIL = r"(?i)\s+d/?b/?a\s+.*$"
_SUFFIX_PATTERNS = [_SUFFIX_STACK, _DBA_TAIL]  # kept for introspection


def normalize_name(col) -> Column:
    """lower → trim → strip "d/b/a …" tail → strip the trailing legal-
    suffix stack → punctuation to spaces → strip suffixes AGAIN →
    collapse whitespace.

    Idempotent (property-tested): norm(norm(x)) == norm(x). The second
    suffix pass is load-bearing: punctuation collapse can MANUFACTURE a
    suffix ("acme/co" → "acme co"), which a single pre-punctuation pass
    leaves for the next application to strip.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    c = F.regexp_replace(c, _DBA_TAIL, "")
    c = F.regexp_replace(c, _SUFFIX_STACK, "")
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    # punctuation→space can manufacture BOTH forms ("acme/co",
    # "x&dba y"), so each tail pattern runs once more on punctuation-
    # free text; on such text they are fixed-point (fuzz-verified), so
    # a third application can never find new work = idempotence.
    c = F.regexp_replace(c, _DBA_TAIL, "")
    c = F.regexp_replace(c, _SUFFIX_STACK, "")
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
