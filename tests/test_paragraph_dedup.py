"""drop_duplicate_paragraphs: CCNet keep-first paragraph dedup —
edge cases plus a property test against a pure-Python reference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hrtech_etl_spark.functions.dedup import drop_duplicate_paragraphs


def _reference(docs: list[tuple[int, str]], delim: str = "\n") -> dict[int, str]:
    """Pure-Python keep-first semantics: one pass in (id, pos) order."""
    seen: set[str] = set()
    out: dict[int, list[str]] = {}
    for did, text in sorted(docs):
        kept = []
        for seg in text.split(delim):
            if not seg.strip():
                kept.append(seg)  # blanks are structure, never deduped
            elif seg not in seen:
                seen.add(seg)
                kept.append(seg)
        if kept:
            out[did] = delim.join(kept)
    return out


def _run(spark, docs, **kw) -> dict[int, str]:
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_paragraphs(df, "text", "doc_id", **kw).collect()
    }


def test_keep_first_across_and_within_docs(spark):
    docs = [
        (1, "alpha\nshared\nalpha"),  # within-doc repeat dropped
        (2, "shared\nbeta"),  # cross-doc repeat dropped
        (3, "gamma\nbeta\ngamma"),
    ]
    assert _run(spark, docs) == {
        1: "alpha\nshared",
        2: "beta",
        3: "gamma",
    }


def test_blank_lines_always_kept(spark):
    docs = [(1, "a\n\nb"), (2, "\n\n"), (3, "a\n\nc")]
    got = _run(spark, docs)
    assert got[1] == "a\n\nb"
    assert got[2] == "\n\n"  # all-blank doc survives intact
    assert got[3] == "\nc"


def test_fully_duplicated_doc_dropped(spark):
    docs = [(1, "x\ny"), (2, "x\ny")]
    assert _run(spark, docs) == {1: "x\ny"}


def test_custom_delimiter_and_min_chars(spark):
    docs = [(1, "aa | b |aa"), (2, "b | cc")]
    got = _run(spark, docs, delimiter=" | ", min_chars=2)
    # 'b' is under min_chars → treated as structure, kept everywhere;
    # 'aa' dedups within doc 1 (note '|aa' != 'aa' — exact split)
    assert got == {1: "aa | b |aa", 2: "b | cc"}


def test_null_text_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_paragraphs(df, "text", "doc_id").collect()
    }
    assert got == {1: "a"}


_seg = st.sampled_from(["a", "b", "cc", "promo", " ", ""])
_doc = st.lists(_seg, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=6))
def test_matches_python_reference(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    assert _run(spark, docs) == _reference(docs)


def test_two_scan_plan_contract(spark, sf_dir):
    """Executed-plan shape: the parquet input is scanned exactly twice
    (parts lineage + keeper lineage — the blanks branch rides the
    marker join, not a third scan), the keeper aggregate runs a
    map-side partial before its exchange (the skew valve), and there
    is no row_number window anywhere."""
    from hrtech_etl_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    df = drop_duplicate_paragraphs(docs, "text", "doc_id")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    marker = plan.find("Initial Plan")
    if marker != -1:
        plan = plan[:marker]
    lower = plan.lower()
    scans = [
        ln for ln in lower.splitlines() if "scan" in ln and "parquet" in ln
    ]
    assert len(scans) == 2, plan
    assert "partial_min" in lower, plan
    assert "window" not in lower, plan
