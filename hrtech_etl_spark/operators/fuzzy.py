"""Fuzzy (edit-distance) joins via deletion-neighborhood blocking.

Entity resolution at corpus scale — joining names, emails, titles,
codes that differ by a typo — cannot run as an all-pairs
``levenshtein`` (quadratic). The SymSpell blocking property makes it
a hash join: two strings within edit distance d ALWAYS share at least
one variant obtained by deleting at most d characters from each
(substitution → delete the differing position from both; insertion/
deletion → one string is a delete-variant of the other; equality →
the strings themselves). So:

    explode delete-variants → equi-join on variant → distinct pairs →
    exact ``levenshtein`` verify

has EXACT recall at the threshold, with the join shuffling short
variant keys instead of comparing everything to everything. All
variant generation is JVM expressions (``sequence`` + ``transform`` +
``substring``) — no UDFs.

Designed for SHORT key strings (a string of length L has L delete-1
variants and ~L²/2 delete-2 variants): ``max_len`` fails loudly on
misuse against document-sized text, where the right tool is the
shingle-based near-dup machinery in ``functions/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_variants(col: Column, *, max_distance: int = 1) -> Column:
    """Distinct array of the string plus every variant reachable by
    deleting up to ``max_distance`` characters (d ∈ {1, 2})."""
    if max_distance not in (1, 2):
        raise ValueError(f"max_distance must be 1 or 2, got {max_distance}")

    def deletes1(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1),
                F.substring(s, i + 1, F.length(s)),
            ),
        )

    d1 = deletes1(col)
    variants = F.concat(F.array(col), d1)
    if max_distance == 2:
        variants = F.concat(
            variants, F.flatten(F.transform(d1, deletes1))
        )
    return F.array_distinct(variants)


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_distance: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """All (id_a < id_b) pairs whose ``text_col`` values are within
    ``max_distance`` (Levenshtein), found by deletion-neighborhood
    blocking — exact recall, no all-pairs stage. Output:
    ``(id_a, id_b, distance)``.

    Plan: one Generate (variant explode) per side of a self-join keyed
    on the variant string; candidate pair dedup is the only shuffle
    carrying ids; the verify is the built-in ``levenshtein`` on the
    deduped candidates. Rows longer than ``max_len`` raise at runtime
    rather than silently exploding L² variants.
    """
    # NULL keys are routine in entity-resolution inputs and can never
    # match anything — they get a NULL variant array (explode emits
    # nothing), NOT the raise_error branch a bare when/otherwise would
    # send them to.
    guarded = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("array<string>")
    ).when(
        F.length(F.col(text_col)) <= max_len,
        delete_variants(F.col(text_col), max_distance=max_distance),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"edit_distance_pairs: value longer than max_len={max_len} "
                    "— this operator is for short keys; use functions/dedup.py "
                    "for documents. Offending length: "
                ),
                F.length(F.col(text_col)).cast("string"),
            )
        )
    )
    keyed = df.select(
        F.col(id_col), F.col(text_col), F.explode(guarded).alias("__v")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__v") == F.col("b.__v"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{text_col}").alias("__ta"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{text_col}").alias("__tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("distance", F.levenshtein("__ta", "__tb"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
