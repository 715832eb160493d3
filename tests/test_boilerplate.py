"""Cross-document boilerplate removal: threshold semantics, order
preservation, all-boilerplate docs, NULL text."""

from __future__ import annotations

from hrtech_etl_spark.functions.text import remove_boilerplate

DOCS = [
    # "COOKIE BANNER" in 3/4 docs (75% > 50%), "© corp" in 2/4 (50%,
    # NOT > 50% → kept)
    (1, "COOKIE BANNER\nreal content one\n© corp\nmore text"),
    (2, "COOKIE BANNER\nunique insight two"),
    (3, "intro line\nCOOKIE BANNER\n© corp\nclosing line"),
    # all-boilerplate doc: disappears from the output
    (4, "COOKIE BANNER"),
    # NULL text: dropped (never trained on)
    (5, None),
]


def test_line_boilerplate_semantics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate(
            df, "text", "doc_id", max_doc_frac=0.5, min_doc_count=2
        ).collect()
    }
    # banner removed everywhere, order preserved, 50%-line kept
    assert out[1] == "real content one\n© corp\nmore text"
    assert out[2] == "unique insight two"
    assert out[3] == "intro line\n© corp\nclosing line"
    assert 4 not in out and 5 not in out


def test_min_doc_count_floor(spark):
    # two tiny docs sharing a line: 100% frequency but below the
    # absolute floor → kept (a 2-doc corpus has no "boilerplate")
    df = spark.createDataFrame(
        [(1, "shared\na"), (2, "shared\nb")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate(
            df, "text", "doc_id", max_doc_frac=0.5, min_doc_count=3
        ).collect()
    }
    assert out == {1: "shared\na", 2: "shared\nb"}


def test_duplicate_lines_within_doc_count_once(spark):
    # a line repeated INSIDE one doc counts once toward document
    # frequency; when it is boilerplate, every occurrence is removed
    df = spark.createDataFrame(
        [
            (1, "ad\nbody one\nad"),
            (2, "ad\nbody two"),
            (3, "only content"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate(
            df, "text", "doc_id", max_doc_frac=0.5, min_doc_count=2
        ).collect()
    }
    assert out[1] == "body one"
    assert out[2] == "body two"
    assert out[3] == "only content"


def _py_remove_boilerplate(docs, max_doc_frac, min_doc_count):
    """Pure-Python reference: document frequency per distinct line,
    drop lines over both thresholds, reassemble in order, drop docs
    with nothing left (or NULL text)."""
    from collections import Counter

    freq = Counter()
    for _id, text in docs:
        if text is None:
            continue
        freq.update(set(text.split("\n")))
    n_docs = len(docs)
    stop = {
        line
        for line, n in freq.items()
        if n >= min_doc_count and n > max_doc_frac * n_docs
    }
    out = {}
    for _id, text in docs:
        if text is None:
            continue
        kept = [l for l in text.split("\n") if l not in stop]
        if kept:
            out[_id] = "\n".join(kept)
    return out


def test_matches_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    line = st.sampled_from(["banner", "footer", "a", "bb", "ccc", ""])

    @st.composite
    def corpus(draw):
        n = draw(st.integers(min_value=1, max_value=8))
        return [
            (i, "\n".join(draw(st.lists(line, min_size=1, max_size=6))))
            for i in range(n)
        ]

    @settings(max_examples=15, deadline=None)
    @given(docs=corpus(), frac=st.sampled_from([0.3, 0.5, 0.8]),
           floor=st.sampled_from([2, 3]))
    def run(docs, frac, floor):
        want = _py_remove_boilerplate(docs, frac, floor)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in remove_boilerplate(
                df, "text", "doc_id", max_doc_frac=frac, min_doc_count=floor
            ).collect()
        }
        assert got == want

    run()


def test_regex_special_delimiter_is_literal(spark):
    """Spark's split() takes a REGEX — a '.' or '|' delimiter must be
    escaped to literal or every character becomes a segment."""
    df = spark.createDataFrame(
        [(1, "ad.keep one"), (2, "ad.keep two"), (3, "solo.text")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate(
            df, "text", "doc_id", delimiter=".",
            max_doc_frac=0.5, min_doc_count=2
        ).collect()
    }
    # 'ad' occurs in 2/3 docs (>50%) → dropped; reassembly uses the
    # literal '.' delimiter
    assert out == {1: "keep one", 2: "keep two", 3: "solo.text"}
