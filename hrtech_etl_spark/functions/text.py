"""Text-analysis functions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no
Python UDFs in any hot path. Each has an exact SQL rendering so the
DuckDB oracle can verify values, not just shapes.

Operators: tokenization + token counting, language-ID (stopword
n-gram heuristic), quality scoring (length/punctuation/stopword
ratios), document fingerprinting (see
:mod:`hrtech_etl_spark.functions.hashing`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def occurrences(col: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences of ``needle`` — the
    portable length-difference idiom (identical semantics in DuckDB:
    ``(length(s) - length(replace(s, n, ''))) / length(n)``)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


# Stopword marker sets for the language-ID heuristic. Space-padded so
# they only match whole words mid-text.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " y "],
}


def lang_score(col: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    score = F.lit(0).cast("long")
    for marker in LANG_MARKERS[lang]:
        score = score + occurrences(padded, marker)
    return score


def lang_id(col: Column) -> Column:
    """Argmax language over marker-occurrence scores; 'unknown' when
    every score is zero. Deterministic tie-break: language order in
    LANG_MARKERS (first wins via strictly-greater comparison)."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best_lang = F.lit("unknown")
    best_score = F.lit(0).cast("long")
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


PUNCT_CLASS = r"[.,;:!?]"


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    removed = F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return F.when(F.length(col) > 0, (F.length(col) - removed) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    """English stopword tokens / total tokens."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    stop = F.lit(0).cast("long")
    for marker in (" the ", " and ", " of ", " a ", " to ", " in "):
        stop = stop + occurrences(padded, marker)
    n = token_count(col)
    return F.when(n > 0, stop / n).otherwise(F.lit(0.0))


def avg_token_length(col: Column) -> Column:
    """Mean token length = non-space chars / token count."""
    squeezed = F.trim(F.regexp_replace(col, r"\s+", " "))
    n = F.size(F.split(squeezed, " "))
    chars = F.length(F.replace(squeezed, F.lit(" "), F.lit("")))
    return F.when(n > 0, chars / n).otherwise(F.lit(0.0))


def tf_idf(
    df,
    text_col: str,
    id_col: str,
    *,
    carry_cols: tuple[str, ...] = (),
    broadcast_idf: bool = True,
):
    """Per-(document, term) TF-IDF over whitespace tokens — the classic
    corpus statistic (SURVEY §2.10 text-analysis row): ``tf`` = term
    occurrences in the document, ``idf = ln(N / df_t)`` with ``N`` the
    corpus document count and ``df_t`` the number of documents
    containing the term, ``tf_idf = round(tf · idf, 4)``.

    Plan shape (scale path): ONE explode pass → shuffle on
    ``(id, term)`` for tf → the document-frequency aggregation reads
    tf's exchange back (ReusedExchange) → idf joins in. The corpus
    document count rides the plan as a broadcast 1-row aggregate (no
    separate driver action). With ``broadcast_idf=True`` (default) the
    vocabulary-sized idf table broadcasts — right while the vocabulary
    fits executor memory (natural-language vocabularies are tiny next
    to the corpus); set False for web-scale vocabularies (URLs, hashes
    blowing up the term space) to use a shuffle join on ``term``.

    ``carry_cols`` are document-LEVEL attributes (functionally
    dependent on ``id_col``, e.g. a language label) carried through to
    the output; a non-doc-level column would split tf rows and inflate
    document frequencies.

    Returns (id, *carry, term, tf, tf_idf).
    """
    from pyspark.sql import functions as F  # noqa: F811 — local alias

    total = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    terms = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy(id_col, *carry_cols, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf = dfreq.join(F.broadcast(total)).select(
        "term", F.log(F.col("__n_docs") / F.col("__df")).alias("__idf")
    )
    joined = tf.join(F.broadcast(idf) if broadcast_idf else idf, "term")
    return joined.select(
        id_col,
        *carry_cols,
        "term",
        "tf",
        F.round(F.col("tf") * F.col("__idf"), 4).alias("tf_idf"),
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, words not too
    short/long, some punctuation, some stopwords. A transparent,
    portable stand-in for model-based quality classifiers.

    Formulated so every expensive component expression appears exactly
    once (least() instead of a when() branch; abs-distance instead of a
    two-sided range) — when() duplicates its operand subtree and the
    duplicated regexp/replace chains dominated the scan cost.
    """
    length_ok = F.least(F.lit(0.25), F.length(col) / 400.0)
    awl = avg_token_length(col)
    words_ok = F.when(F.abs(awl - 6.5) <= 3.5, F.lit(0.25)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    return F.round(length_ok + words_ok + punct_ok + stop_ok, 4)
