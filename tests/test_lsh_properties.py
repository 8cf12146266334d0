"""Recall properties of the blocked near-duplicate operators:

- exact-duplicate documents share every MinHash band → ALWAYS a
  candidate pair (LSH recall 1.0 at similarity 1.0);
- identical token multisets → identical SimHash signatures;
- disjoint-vocabulary documents share no shingles → never a pair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipes_data_pipeline_spark.operators.dedup_minhash import (
    minhash_lsh_pairs,
    simhash_signatures,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
    (3, "quick the brown fox jumps over the lazy dog again and again"),  # reorder
    (4, "entirely different vocabulary concerning maritime navigation rules"),
    (5, "entirely different vocabulary concerning maritime navigation rules"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def test_exact_duplicates_always_candidates(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs  # identical text
    assert (4, 5) in pairs  # identical text, other vocabulary
    # disjoint vocabularies share no shingles → never candidates
    assert not any(
        (a in (1, 2, 3)) != (b in (1, 2, 3)) for a, b in pairs
    )


def test_identical_token_multisets_same_simhash(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in
            simhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]  # identical docs
    assert sigs[1] == sigs[3]  # simhash is order-insensitive (bag of tokens)
    assert sigs[1] != sigs[4]  # different vocabulary
    assert len(sigs[1]) == 32 and set(sigs[1]) <= {"0", "1"}
