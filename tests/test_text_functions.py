"""Text-analysis operators: TF-IDF (hand-computed oracle), repetition
quality signals, PII redaction, and n-gram decontamination."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions import text as tx


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "en", "apple banana apple"),
        (2, "en", "banana cherry"),
        (3, "fr", "cherry cherry cherry"),
        (4, "fr", "durian"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_tf_idf_hand_computed(spark, corpus):
    """N=4 docs. df(apple)=1, df(banana)=2, df(cherry)=2, df(durian)=1.
    tf_idf(doc1, apple) = 2 * ln(4/1); tf_idf(doc3, cherry) = 3 * ln(4/2)."""
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["tf_idf"])
        for r in tx.tf_idf(corpus, "text", "doc_id").collect()
    }
    ln = math.log
    want = {
        (1, "apple"): (2, round(2 * ln(4 / 1), 4)),
        (1, "banana"): (1, round(1 * ln(4 / 2), 4)),
        (2, "banana"): (1, round(1 * ln(4 / 2), 4)),
        (2, "cherry"): (1, round(1 * ln(4 / 2), 4)),
        (3, "cherry"): (3, round(3 * ln(4 / 2), 4)),
        (4, "durian"): (1, round(1 * ln(4 / 1), 4)),
    }
    assert got == want


def test_tf_idf_carry_cols_and_join_modes(spark, corpus):
    """carry_cols flow through; broadcast and shuffle idf joins agree."""
    a = tx.tf_idf(corpus, "text", "doc_id", carry_cols=("lang",))
    assert set(a.columns) == {"doc_id", "lang", "term", "tf", "tf_idf"}
    rows = {(r["doc_id"], r["term"]): r["lang"] for r in a.collect()}
    assert rows[(1, "apple")] == "en" and rows[(3, "cherry")] == "fr"
    b = tx.tf_idf(corpus, "text", "doc_id", broadcast_idf=False)
    av = {(r["doc_id"], r["term"]): r["tf_idf"] for r in a.collect()}
    bv = {(r["doc_id"], r["term"]): r["tf_idf"] for r in b.collect()}
    assert av == bv
