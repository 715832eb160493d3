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


def test_duplicate_span_stats_property_vs_python(spark):
    """Randomized cross-check against a direct Python reference:
    tiny alphabet strings force heavy shingle collisions; the Spark
    interval-merge must equal brute-force span computation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    K = 4

    def reference(texts, k=K, min_dup=2):
        from collections import Counter

        occ = Counter()
        for t in texts.values():
            if t and len(t) >= k:
                for i in range(len(t) - k + 1):
                    occ[t[i : i + k]] += 1
        out = {}
        for doc, t in texts.items():
            if not t or len(t) < k:
                continue
            pos = [
                i
                for i in range(len(t) - k + 1)
                if occ[t[i : i + k]] >= min_dup
            ]
            if not pos:
                continue
            spans = []
            for p in pos:  # merge [p, p+k-1] intervals (sorted)
                if spans and p <= spans[-1][1] + 1:
                    spans[-1][1] = max(spans[-1][1], p + k - 1)
                else:
                    spans.append([p, p + k - 1])
            dup = sum(b - a + 1 for a, b in spans)
            out[doc] = (len(spans), dup, round(dup / len(t), 6))
        return out

    @settings(max_examples=12, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="abc", min_size=0, max_size=30),
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        tmap = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            list(tmap.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_spans"], r["dup_chars"], r["dup_frac"])
            for r in duplicate_span_stats(
                df, "text", "doc_id", k=K, min_dup=2
            ).collect()
        }
        assert got == reference(tmap)

    check()
