"""Full-text search / lexical retrieval over the documents corpus
(training-data curation E8): inverted index build, BM25 top-k, and
positional phrase search.

Why this lives in a training-data engine: retrieval-based
decontamination and targeted curation ("find every training document
matching these benchmark queries / phrases") are lexical search
problems at corpus scale; BM25 (Robertson et al., TREC-3, 1994; the
Lucene practical-scoring variant) is the standard baseline next to the
embedding ANN family in ``operators/similarity.py``.

100 TB stance:
  - Index build is one token-explode map stage followed by
    partial-aggregable groupBys (tf, df, total_tf) — no corpus-sized
    sort, no window. Posting lists are NOT materialized whole per term
    (the "the" list would be a skew bomb); the registered query carries
    per-term stats plus a bounded top-k of postings via the mergeable
    partial top-k from ``operators/similarity.py`` (state ≤
    n_partitions * n_terms * k).
  - BM25 scoring prunes FIRST: the token stream is semi-joined against
    the broadcast query-term set before any shuffle, so the exchange
    carries only matching (doc, term) rows — flat in vocabulary size,
    proportional to hit count, never corpus token count.
  - Per-term score contributions are rounded then summed as DECIMAL so
    the (query, doc) score is independent of Spark's float-sum order —
    the cross-engine exactness idiom from ``functions/rounding.py``.
  - Phrase search joins per-word position streams on (doc, offset)
    after pushing the word-equality filter into the scan side; the
    shuffled volume is the per-word hit count, not the token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import grouped_topk

BM25_K1 = 1.2
BM25_B = 0.75


def doc_tokens_pos(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, tok) token stream with 1-based positions.

    Positions index the raw whitespace-split array BEFORE empty-token
    filtering, so they are stable regardless of repeated separators and
    reproduce DuckDB's ``generate_series(1, len(toks))`` numbering.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    return (
        docs.select(F.col(id_col).alias("id"), F.posexplode(toks).alias("pos0", "tok"))
        .filter(F.col("tok") != "")
        .select("id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok")
    )


def term_freqs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok, tf): per-document term frequencies (partial-aggregable)."""
    return (
        doc_tokens_pos(docs, text_col, id_col)
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def inverted_index_topk(
    docs: DataFrame, text_col: str, id_col: str, k: int = 3,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Inverted-index summary: per term, document frequency, corpus
    total frequency, and the k highest-tf postings (tf desc, id asc).

    Returns (term, df, total_tf, rnk, id, tf) — one row per surviving
    posting. The top-k is the mergeable partial form, not a window, so
    a degenerate hot term ("the" at corpus scale) truncates map-side.
    """
    if tf is None:
        tf = term_freqs(docs, text_col, id_col)
    stats = tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    top = grouped_topk(
        tf, k, order_col="tf", ascending=False, group_col="tok", id_col="id"
    )
    return (
        top.join(stats, "tok")
        .select(
            F.col("tok").alias("term"),
            "df",
            "total_tf",
            "rnk",
            "id",
            "tf",
        )
    )


def build_lexical_index(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """The two persistable tables a BM25 serving path needs: postings
    (id, tok, tf) and doclen (id, dl). Corpus constants (N, avgdl) and
    per-term df derive from these by partial-aggregable sums, so the
    serving path NEVER rescans documents. At scale, write postings
    partitioned/bucketed by ``tok`` so query-term lookups prune."""
    tokens = doc_tokens_pos(docs, text_col, id_col)
    postings = tokens.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tokens.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    return postings, doclen


def _query_terms(spark, queries: list[tuple[int, str]]) -> DataFrame:
    qterm_rows = sorted(
        {
            (qid, tok)
            for qid, qtext in queries
            for tok in qtext.lower().split()
            if tok
        }
    )
    return spark.createDataFrame(qterm_rows, "query_id int, tok string")


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k straight off the corpus: the token stream is pruned
    by a broadcast semi-join on the query terms BEFORE any shuffle, so
    the exchange carries only matching (doc, term) rows — never the
    corpus token count. See :func:`_bm25_score` for the scoring and
    cross-engine exactness contract. Returns (query_id, rnk, id,
    score)."""
    qterms = _query_terms(docs.sparkSession, queries)
    tokens = doc_tokens_pos(docs, text_col, id_col)
    terms = qterms.select("tok").distinct()
    matched = tokens.join(F.broadcast(terms), "tok").groupBy("id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tokens.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    return _bm25_score(matched, dl, qterms, k, k1, b)


def bm25_topk_from_index(
    postings: DataFrame,
    doclen: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k served purely from the PERSISTED index tables of
    :func:`build_lexical_index` — the lexical analog of the ANN
    build/serve split (``e3_ann_index_build`` → ``e3_pq_topk``): the
    serving path touches only (id, tok, tf) postings pruned to the
    query terms plus the doclen table, never the document text. Scores
    are identical to :func:`bm25_topk` by construction (same scorer)."""
    qterms = _query_terms(postings.sparkSession, queries)
    terms = qterms.select("tok").distinct()
    matched = postings.join(F.broadcast(terms), "tok")
    return _bm25_score(matched, doclen, qterms, k, k1, b)


def _bm25_score(
    matched: DataFrame,
    dl: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Shared scorer over matched postings (id, tok, tf) + doc lengths.

    Scoring: Lucene-style always-positive idf,
        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
        tfnorm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
        score(q,d)  = sum over distinct t in q of round(idf * tfnorm, 6)
    summed as DECIMAL(18,6) (order-independent, cross-engine exact),
    then rounded to 4 dp for ranking with (score desc, id asc).
    """
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    ).select(
        "n_docs",
        (F.col("total_len").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    df_stats = matched.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    # (k1 + 1.0) is summed IN-ENGINE (not precomputed in Python) so the
    # double matches the oracle's literal `(1.2 + 1.0)` bit-for-bit
    tfnorm = (F.col("tf") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * tfnorm, 6).cast("decimal(18,6)")

    scored = (
        matched.join(F.broadcast(qterms), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(corpus))
        .join(F.broadcast(df_stats), "tok")
        .groupBy("query_id", "id")
        .agg(F.sum(contrib).alias("score_dec"))
        .select(
            "query_id",
            "id",
            # round the EXACT decimal sum, THEN convert: rounding the
            # double instead splits engines on .x5 boundaries (hypothesis
            # found 0.91685 -> Spark 0.9169 / binary-round 0.9168); both
            # engines round DecimalType half-up identically
            F.round(F.col("score_dec"), 4).cast("double").alias("score"),
        )
    )
    top = grouped_topk(
        scored, k, order_col="score", ascending=False, group_col="query_id", id_col="id"
    )
    return top.select("query_id", "rnk", "id", "score")


def phrase_search(
    docs: DataFrame, text_col: str, id_col: str, phrase: str
) -> DataFrame:
    """Exact phrase occurrence counts via positional-posting joins.

    For an n-word phrase, the word-i position stream (filtered at the
    scan: tok == word_i) is joined on (id, pos - i == first word's pos)
    — the distributed equivalent of a positional-index intersection.
    Returns (id, n_occurrences, first_pos) for documents containing the
    phrase at least once.
    """
    words = [w for w in phrase.lower().split() if w]
    assert len(words) >= 2, "phrase_search wants a multi-word phrase"
    tp = doc_tokens_pos(docs, text_col, id_col)
    cur = tp.filter(F.col("tok") == words[0]).select("id", F.col("pos").alias("p"))
    for i, w in enumerate(words[1:], start=1):
        nxt = tp.filter(F.col("tok") == w).select(
            F.col("id").alias("id_r"), (F.col("pos") - i).alias("p_r")
        )
        cur = cur.join(
            nxt, (cur["id"] == nxt["id_r"]) & (cur["p"] == nxt["p_r"])
        ).select("id", "p")
    return cur.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("p").alias("first_pos"),
    )


def bm25_topk_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    qterms: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """:func:`bm25_topk` with a DATA-DEPENDENT (query_id, tok) term
    frame instead of literal query strings — the second stage of
    pseudo-relevance feedback, where the expanded term set comes out of
    the first-pass results. Same pruning discipline: the (small) term
    frame broadcasts into the token-stream semi-join."""
    tokens = doc_tokens_pos(docs, text_col, id_col)
    terms = qterms.select("tok").distinct()
    matched = tokens.join(F.broadcast(terms), "tok").groupBy("id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tokens.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    return _bm25_score(matched, dl, qterms, k, k1, b)
