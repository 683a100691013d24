"""Distributed BPE merge training (Sennrich/Haddow/Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016) — the
tokenizer-training pass of an LLM data pipeline, in the shape that
scales: the corpus collapses to a word-frequency table in ONE shuffle,
and every merge iteration runs over that vocab-sized frame (millions of
rows at 100 TB, never the corpus). Driver traffic per iteration is a
single argmax row, like kmeans' k centroids.

Greedy left-to-right pair merging within a word is a sequential fold, so
it is expressed with F.aggregate (higher-order function, JVM-side) over
the symbol array — no Python UDF in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized shuffle."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Greedy left-to-right replacement of adjacent (a, b) with a||b,
    as a sequential fold: append each symbol unless it extends the pair
    with the fold's last element (merged symbols can't re-merge within
    the same pass because a||b != a whenever b is non-empty)."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 8, end_of_word: str = "_"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_idx, left, right, pair_count) — the artifact a tokenizer
    ships. Deterministic: ties in pair count break lexicographically on
    (left, right), so every run and every engine agrees.

    Per iteration: one vocab-sized pair-count aggregation (explode
    adjacent symbol pairs weighted by word freq), ONE collected argmax
    row, and a map-side fold applying the merge. The evolving symbols
    frame is lazily localCheckpoint-ed each round (same lineage-control
    trick as connected components) so iteration N's plan doesn't replay
    rounds 1..N-1."""
    vocab = word_frequencies(df, text_col).select(
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(end_of_word))).alias("syms"),
        "freq",
    )
    merges = []
    for it in range(n_merges):
        vocab = vocab.localCheckpoint(eager=False)
        pairs = (
            vocab.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(2), F.greatest(F.size("syms"), F.lit(2))),
                            lambda i: F.struct(
                                F.element_at("syms", i - 1).alias("a"),
                                F.element_at("syms", i).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
        merges.append((it, a, b, cnt))
        vocab = vocab.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "freq")
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count long"
    )


def _apply_merges_batch(syms_col, pairs):
    """One fold pass applying EVERY merge of a mutually-disjoint batch
    (see :func:`plan_merge_batches`): at each (last, cur) position at
    most one rule can match (two rules matching the same pair would
    need identical (a, b)), and disjointness guarantees no rule's
    application creates or destroys a match for another, so one
    combined pass equals the sequential per-merge passes exactly."""
    def match(acc, s):
        cond = None
        for a, b in pairs:
            c = (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b))
            cond = c if cond is None else (cond | c)
        return cond

    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & match(acc, s),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def plan_merge_batches(merges):
    """Group an ordered merge list into maximal batches that are safe
    to apply in ONE fold pass each. A batch is safe iff its merges are
    pairwise NON-INTERACTING: for any two merges i != j in the batch,

      a_i != b_j  and  b_i != a_j    (no chain: one rule's right symbol
                                      can never be another's left, in
                                      either direction — otherwise one
                                      application consumes or creates
                                      the other's match), and
      a_i || b_i  not in {a_j, b_j}  (no output feeds another rule).

    Under these conditions no application of one rule changes any
    other rule's match set, so interleaving them in a single
    left-to-right scan yields exactly the sequential result (pinned
    against the chained form in tests/test_bpe.py). Learned BPE merges
    are usually disjoint in practice (distinct frequent pairs), so the
    chained O(n_merges) corpus passes usually collapse to one."""
    batches = []
    cur = []
    for a, b in merges:
        safe = all(
            a != pb
            and b != pa
            and (a + b) not in (pa, pb)
            and (pa + pb) not in (a, b)
            for pa, pb in cur
        )
        if cur and not safe:
            batches.append(cur)
            cur = []
        cur.append((a, b))
    if cur:
        batches.append(cur)
    return batches


def bpe_segment(
    df: DataFrame, text_col: str, id_col: str, merges: list,
    end_of_word: str = "_",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, the BPE
    token count and a checksum of the segmentation — the metering pass
    that prices a corpus in tokenizer units. Map-side only (the merge
    list is a plan literal); mutually-disjoint consecutive merges are
    batched into ONE fold pass each (:func:`plan_merge_batches` — the
    round-10 cut: 4 chained per-word folds usually collapse to 1)."""
    words = F.split(F.lower(F.col(text_col)), " ")
    segmented = F.transform(
        words,
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(end_of_word))),
    )
    def apply_batch(batch):
        # one-arg lambda: F.transform treats a second parameter as the
        # element index, so the batch must bind via closure, not a
        # default argument
        return lambda syms: _apply_merges_batch(syms, batch)

    for batch in plan_merge_batches(merges):
        segmented = F.transform(segmented, apply_batch(batch))
    flat = F.flatten(segmented)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(flat).alias("n_bpe_tokens"),
        F.md5(F.array_join(flat, "")).alias("segmentation_md5"),
    )
