"""Lexical search family (E8): semantics on planted corpora + the
no-Window scale contracts for the top-k plans."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry
from public_transit_status_with_apache_kafka_spark.operators import search

from test_plan_contracts import plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_overlapping_occurrences(spark):
    docs = _docs(
        spark,
        [
            (1, "go go go go"),
            (2, "stop go stop"),
            (3, "go stop go stop go"),
            (4, "nothing here"),
        ],
    )
    out = {
        r["id"]: (r["n_occurrences"], r["first_pos"])
        for r in search.phrase_search(docs, "text", "doc_id", "go go").collect()
    }
    # overlapping matches all count: positions 1,2,3 in doc 1
    assert out == {1: (3, 1)}


def test_phrase_three_words_and_gaps(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c a b c"),
            (2, "a b x c"),
            (3, "c b a"),
        ],
    )
    out = {
        r["id"]: (r["n_occurrences"], r["first_pos"])
        for r in search.phrase_search(docs, "text", "doc_id", "a b c").collect()
    }
    assert out == {1: (2, 1)}


def test_inverted_index_topk_tiebreak(spark):
    docs = _docs(
        spark,
        [
            (10, "w w w"),
            (11, "w w w"),
            (12, "w w w"),
            (13, "w w w"),
            (14, "v"),
        ],
    )
    rows = search.inverted_index_topk(docs, "text", "doc_id", k=3).collect()
    w = sorted(
        [(r["rnk"], r["id"], r["tf"]) for r in rows if r["term"] == "w"]
    )
    # four docs tie on tf=3; top-3 must break ties by ascending id
    assert w == [(1, 10, 3), (2, 11, 3), (3, 12, 3)]
    stats = {(r["term"], r["df"], r["total_tf"]) for r in rows}
    assert ("w", 4, 12) in stats and ("v", 1, 1) in stats


def _bm25_reference(corpus, queries, k1=search.BM25_K1, b=search.BM25_B):
    """Pure-python mirror of the documented scoring (per-term round(.,6)
    contributions summed exactly, final round(.,4))."""
    from collections import Counter
    from decimal import Decimal

    toks = {d: t.lower().split() for d, t in corpus}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(dl.values()) / n
    tfs = {d: Counter(t) for d, t in toks.items()}
    scores = {}
    for qid, qtext in queries:
        for d in toks:
            total = Decimal(0)
            for term in sorted(set(qtext.lower().split())):
                tf = tfs[d][term]
                if not tf:
                    continue
                df = sum(1 for dd in toks if tfs[dd][term])
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                tfn = (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
                total += Decimal(str(round(idf * tfn, 6)))
            if total:
                # HALF_UP quantize: Decimal's default round() is
                # banker's, which splits from the engines' decimal
                # rounding on .x5 sums (hypothesis-found)
                from decimal import ROUND_HALF_UP

                scores[(qid, d)] = float(
                    total.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
                )
    return scores


def test_bm25_matches_reference_scoring(spark):
    corpus = [
        (1, "hash join hash join scan"),
        (2, "hash scan scan scan scan scan scan scan"),
        (3, "join"),
        (4, "sort merge join hash"),
        (5, "filter project"),
    ]
    queries = [(7, "hash join"), (8, "scan")]
    expected = _bm25_reference(corpus, queries)
    got = {
        (r["query_id"], r["id"]): r["score"]
        for r in search.bm25_topk(
            _docs(spark, corpus), "text", "doc_id", queries, k=10
        ).collect()
    }
    assert got == expected


def test_bm25_rank_order_and_k(spark):
    corpus = [(i, "hit " * i + "pad") for i in range(1, 8)]
    out = search.bm25_topk(
        _docs(spark, corpus), "text", "doc_id", [(1, "hit")], k=3
    ).collect()
    assert [r["rnk"] for r in out] == [1, 2, 3]
    # higher tf wins, but longer docs are normalized — the reference
    # scoring (not raw tf) decides; just pin k and strict rank order
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rnk"])]
    assert scores == sorted(scores, reverse=True)


def test_bm25_topk_terms_matches_literal_and_prf_stage2(spark):
    """bm25_topk_terms (the term-FRAME scorer — the public operator
    form of e8_prf_expansion's stage 2) must score identically to
    bm25_topk when the frame carries exactly the literal query terms,
    AND to the plan's inline stage-2 shape (tf join + _bm25_score) for
    a data-dependent frame no literal API could express."""
    corpus = [
        (1, "hash join hash join scan"),
        (2, "hash scan scan scan scan scan scan scan"),
        (3, "join"),
        (4, "sort merge join hash"),
        (5, "filter project"),
    ]
    docs = _docs(spark, corpus)
    queries = [(7, "hash join"), (8, "scan")]
    lit = {
        (r["query_id"], r["rnk"]): (r["id"], r["score"])
        for r in search.bm25_topk(docs, "text", "doc_id", queries, k=10).collect()
    }
    qframe = search._query_terms(spark, queries)
    framed = {
        (r["query_id"], r["rnk"]): (r["id"], r["score"])
        for r in search.bm25_topk_terms(
            docs, "text", "doc_id", qframe, k=10
        ).collect()
    }
    assert framed == lit

    # data-dependent frame: terms harvested FROM the corpus (the PRF
    # shape) — pin the operator against the inline composition used by
    # plans/search_queries.e8_prf_expansion stage 2
    import pyspark.sql.functions as F

    dyn = spark.createDataFrame(
        [(1, "hash"), (1, "scan"), (2, "join"), (2, "filter")],
        "query_id int, tok string",
    )
    via_op = search.bm25_topk_terms(docs, "text", "doc_id", dyn, k=10)
    tokens = search.doc_tokens_pos(docs, "text", "doc_id")
    matched = (
        tokens.join(F.broadcast(dyn.select("tok").distinct()), "tok")
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tokens.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    via_inline = search._bm25_score(matched, dl, dyn, 10)
    a = sorted(map(tuple, via_op.collect()))
    b = sorted(map(tuple, via_inline.collect()))
    assert a == b and len(a) > 0


# ------------------------------------------------------------ contracts


def test_e8_topk_plans_have_no_window(spark):
    """Both retrieval top-k queries must use the mergeable partial
    top-k, never a Window over the scored corpus (the exchange stays
    flat in corpus size)."""
    for name in ("e8_inverted_index", "e8_bm25_topk"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, name


def test_e8_phrase_plan_pushes_word_filters(spark):
    """Word-equality filters must sit below the position joins (the
    shuffled volume is per-word hit counts), and the joins must be
    hash equi-joins, not cartesian."""
    plan = plan_of(spark, "e8_phrase_search")
    assert "CartesianProduct" not in plan
    assert plan.count("(tok") >= 2 or "tok" in plan  # filters survived


def test_e8_parity_smoke(spark):
    """Registry wiring: all three e8 queries run and return rows at the
    smoke SF (full hash parity runs in tools/parity.py + the sf0.1
    pytest gate)."""
    q = entry.queries()
    for name in ("e8_inverted_index", "e8_bm25_topk", "e8_phrase_search"):
        assert q[name](spark, "/root/testdata/sf0.001").count() > 0


def test_stream_index_update_equals_batch(spark):
    """The LSM-merged streaming index must equal the from-scratch batch
    index EXACTLY (set equality, not just the inner-join count the
    registry encodes)."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    merged = entry.queries()["e8_stream_index_update"](spark, sf)
    docs = __import__(
        "public_transit_status_with_apache_kafka_spark.io_util", fromlist=["load"]
    ).load(spark, sf, "documents")
    twin = (
        search.term_freqs(docs.select("doc_id", "text"), "text", "doc_id")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
        .select(F.col("tok").alias("term"), "df", "total_tf")
    )
    got = {(r["term"], r["df"], r["total_tf"]) for r in merged.collect()}
    want = {(r["term"], r["df"], r["total_tf"]) for r in twin.collect()}
    assert got == want


def test_rag_context_pack_budget_and_order_invariants(spark):
    """Packed contexts preserve MMR order with contiguous positions,
    cum_tokens is the exact running sum, the budget is honored for
    every row after position 1, and the first context always ships."""
    from public_transit_status_with_apache_kafka_spark.plans.search_queries import (
        QUERIES,
        RAG_BUDGET,
        RAG_K,
    )

    out = QUERIES["e8_rag_context_pack"](spark, "/root/testdata/sf0.01").collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.position)
        assert rows[0].position == 1  # first context always ships
        assert len(rows) <= RAG_K
        positions = [r.position for r in rows]
        assert positions == list(range(1, len(rows) + 1)), (qid, positions)
        cum = 0
        for r in rows:
            cum += r.n_tokens
            assert r.cum_tokens == cum
            if r.position > 1:
                assert r.cum_tokens <= RAG_BUDGET
        # no duplicate contexts within a query
        ids = [r.doc_id for r in rows]
        assert len(ids) == len(set(ids))
