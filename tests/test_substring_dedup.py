"""duplicate_span_stats (functions/dedup.py): exact k-char substring
duplication with overlapping-span interval merge."""

from __future__ import annotations

import pytest

from hrtech_etl_spark.functions.dedup import duplicate_span_stats

BOILER = "All rights reserved worldwide."  # 30 chars, repeated verbatim


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_span_stats(df, "text", "doc_id", **kw)
    return {r["doc_id"]: (r["n_spans"], r["dup_chars"], r["dup_frac"]) for r in out.collect()}

def test_cross_document_duplicate_span(spark):
    # distinct chars ON BOTH SIDES of the boilerplate, so the maximal
    # shared run is exactly the boilerplate (a shared boundary char
    # would legitimately extend the run — exact substring semantics)
    rows = [
        (1, "unique prefix oneX%sYunique suffix one" % BOILER),
        (2, "totally different tP%sQand a tail here" % BOILER),
        (3, "no duplication in this document at all, certainly not"),
    ]
    got = _stats(spark, rows, k=20, min_dup=2)
    # doc 3 has no duplicated shingle -> absent
    assert 3 not in got
    # docs 1 and 2 each have exactly ONE maximal duplicated run of the
    # 30-char boilerplate (11 overlapping 20-shingles merge into one)
    assert got[1][0] == 1 and got[2][0] == 1
    assert got[1][1] == len(BOILER)
    assert got[2][1] == len(BOILER)
    n1 = len(rows[0][1])
    assert got[1][2] == round(len(BOILER) / n1, 6)

def test_within_document_repeat_counts(spark):
    # the SAME 20+ char substring twice in one doc, nowhere else
    seg = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
    rows = [(7, seg + " filler middle part " + seg)]
    got = _stats(spark, rows, k=20, min_dup=2)
    assert got[7][0] == 2
    assert got[7][1] == 2 * len(seg)

def test_adjacent_spans_merge(spark):
    # two duplicated runs separated by ONE char still merge only if
    # spans touch: [p, p+k-1] and next start <= prev_end + 1
    a = "x" * 25  # run of x: all its shingles collide with doc 2's
    rows = [(1, a + "Q" + a), (2, a)]
    got = _stats(spark, rows, k=20, min_dup=2)
    # doc 1: x-runs on both sides of Q; every 20-gram inside each run
    # duplicates doc 2's; the two runs' marked intervals touch across
    # the single Q (prev end = 25, next start = 27 > 26?) -> positions
    # 1..6 and 28..33 (1-based); gap 27-26=1 char -> spans [1,25] and
    # [27,51]: 27 <= 25+1? no, 27 > 26 is false -> 27 == prev_end+2?
    # prev_end=25 at k=20 from pos 6: 6+19=25; next pos 27 -> merge iff
    # 27 <= 25+1=26 -> false: TWO spans.
    assert got[1][0] == 2
    assert got[1][1] == 50
    assert got[2] == (1, 25, 1.0)

def test_min_dup_threshold_and_validation(spark):
    rows = [(1, "abcdefghijklmnopqrstuvwxyz")]
    # min_dup=1 marks everything (each shingle occurs once)
    got = _stats(spark, rows, k=20, min_dup=1)
    assert got[1] == (1, 26, 1.0)
    with pytest.raises(ValueError):
        _stats(spark, rows, k=1)

def test_short_and_null_texts_excluded(spark):
    rows = [(1, "short"), (2, None), (3, "x" * 19)]
    assert _stats(spark, rows, k=20, min_dup=1) == {}
