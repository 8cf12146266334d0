"""Training-data pipeline operators as declared queries (dedup, similarity,
text analysis) over the ``documents`` / ``embeddings`` / ``events`` tables.

Populated incrementally; every op gets a DuckDB oracle where SQL can
express it.
"""

from __future__ import annotations
