"""Vector (embedding) column expressions.

Dot products / norms fold left-to-right in double precision via
``F.aggregate`` — a deterministic summation order that the DuckDB oracle
mirrors with ``list_reduce`` — and run JVM-side (no Python UDF). For the
100 TB path, brute-force scoring is the per-bucket refine step after
sign-LSH blocking (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], accumulated sequentially in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, dims: tuple[int, ...] = (1, 9, 17, 25)) -> Column:
    """Sign-LSH bucket: concatenated sign bits of fixed dimensions.

    A degenerate (but deterministic and SQL-expressible) random-hyperplane
    LSH where the hyperplanes are coordinate axes. Vectors in the same
    bucket agree on the signs of ``dims`` — the blocking key for
    near-duplicate search, shrinking candidate pairs by ~2^len(dims).
    """
    bits = [
        F.when(F.element_at(a, d) > 0, F.lit("1")).otherwise(F.lit("0")) for d in dims
    ]
    return F.concat(*bits)
