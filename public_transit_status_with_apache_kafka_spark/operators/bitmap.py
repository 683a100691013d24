"""Bitmap-word distinct counting and set algebra over dense integer ids.

`COUNT(DISTINCT id)` in Spark plans a two-stage distinct aggregation that
shuffles the full (group, id) pair multiset; at 100 TB the exchange is the
size of the deduplicated fact table. For DENSE integer id domains (user
ids, surrogate keys) the classic OLAP alternative is the bitmap: bucket
ids into fixed-width words (id DIV W -> word index, id MOD W -> bit),
`bit_or` the words per group, and `sum(bit_count(word))` is the EXACT
distinct count. The exchange shrinks to |id-domain| / W words per group —
a 32x compression here — and `bit_or` is a mergeable partial aggregate
(map-side combine halves it again before the shuffle). This is the shape
behind Roaring-bitmap audience engines (Chambi, Lemire et al., "Better
bitmap performance with Roaring bitmaps", 2016) expressed with nothing
but built-in JVM aggregates — no UDF, whole-stage codegen end to end.

Words are 32 bits stored in a BIGINT: DuckDB's `<< ` on BIGINT raises on
1 << 63 (sign-bit overflow), so the cross-engine-safe word width is 32.
Ids must be non-negative; callers with signed or sparse domains remap
first (sparse domains lose the compression, not the correctness).

Set algebra rides the same words: |A INTERSECT B| is
`sum(bit_count(a.word & b.word))` over an equi-join on word index — the
audience-overlap query (pairwise Jaccard of per-segment user sets)
without ever co-locating raw id pairs.

Reference scope note: the reference app (SURVEY.md section 2) has no
distinct-count engine; this family belongs to the training-data /
analytics mandate (unique-user reach, segment overlap) alongside the
approximate twin `x_approx_distinct` (HLL): the bitmap is the EXACT path
for dense-id domains, the sketch the fallback for unbounded ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def bitmap_words(
    df: DataFrame, group_cols: list[str], id_col: str, bits: int = WORD_BITS
) -> DataFrame:
    """Per-(group, word-index) bitmap words plus the underlying row
    count: `word` has bit (id MOD bits) set for every distinct id in
    the bucket, `n_rows` counts contributing rows. One partial-
    aggregable groupBy; every expression is a built-in JVM function."""
    word_idx = F.expr(f"{id_col} DIV {bits}").alias("w_idx")
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({id_col} % {bits} AS INT))"
    ).alias("bit")
    return (
        df.select(*group_cols, word_idx, bit)
        .groupBy(*group_cols, "w_idx")
        .agg(F.expr("bit_or(bit)").alias("word"), F.count("*").alias("n_rows"))
    )


def distinct_counts(
    words: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold bitmap words into per-group EXACT distinct counts:
    sum(bit_count(word)) — exact because `bit_or` already deduplicated
    within each word."""
    return words.groupBy(*group_cols).agg(
        F.expr("sum(bit_count(word))").cast("long").alias("n_distinct"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def pairwise_overlap(words: DataFrame, group_col: str) -> DataFrame:
    """Pairwise set algebra between every ordered pair of groups
    (a < b): intersection / union cardinalities and Jaccard, computed
    from the word frames alone. The self-join keys on the word index,
    so the exchange is O(words), never O(ids); pairs that share no
    word-level overlap are dropped (inter >= 1), matching the natural
    inner-join-on-id oracle."""
    from ..functions.rounding import ratio_round

    # the word frame feeds three branches (both join sides + the
    # distinct fold); one lazy checkpoint computes it once instead of
    # re-scanning the fact table per branch
    words = words.localCheckpoint(eager=False)
    a = words.select(
        F.col(group_col).alias("g_a"), "w_idx", F.col("word").alias("word_a")
    )
    b = words.select(
        F.col(group_col).alias("g_b"), "w_idx", F.col("word").alias("word_b")
    )
    inter = (
        a.join(b, ["w_idx"])
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(
            F.expr("sum(bit_count(word_a & word_b))")
            .cast("long")
            .alias("n_inter")
        )
        .filter(F.col("n_inter") > 0)
    )
    d = distinct_counts(words, [group_col]).select(
        F.col(group_col).alias("g"), "n_distinct"
    )
    da = d.select(F.col("g").alias("g_a"), F.col("n_distinct").alias("nd_a"))
    db = d.select(F.col("g").alias("g_b"), F.col("n_distinct").alias("nd_b"))
    return (
        inter.join(F.broadcast(da), ["g_a"])
        .join(F.broadcast(db), ["g_b"])
        .select(
            "g_a",
            "g_b",
            "n_inter",
            (F.col("nd_a") + F.col("nd_b") - F.col("n_inter"))
            .cast("long")
            .alias("n_union"),
            ratio_round(
                F.col("n_inter"),
                F.col("nd_a") + F.col("nd_b") - F.col("n_inter"),
                4,
            ).alias("jaccard"),
        )
    )
