"""Property test: BM25 top-k and phrase search match pure-python
references on randomized small corpora — tiny vocabularies force heavy
term collisions (every doc matches every query term somewhere), repeated
words force tf > 1 and overlapping phrase hits, and variable doc lengths
exercise the length normalization."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_status_with_apache_kafka_spark.operators import search

from test_search import _bm25_reference

VOCAB = ["red", "blue", "green", "red", "blue"]  # collisions on purpose

doc_text = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join)
corpus_strategy = st.lists(doc_text, min_size=2, max_size=8)


@settings(max_examples=10, deadline=None)
@given(texts=corpus_strategy, qwords=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3))
def test_bm25_random_corpora_match_reference(spark, texts, qwords):
    corpus = list(enumerate(texts))
    queries = [(1, " ".join(qwords))]
    expected = _bm25_reference(corpus, queries)
    got = {
        (r["query_id"], r["id"]): r["score"]
        for r in search.bm25_topk(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            "text",
            "doc_id",
            queries,
            k=len(corpus),
        ).collect()
    }
    assert got == expected


def _phrase_reference(texts, phrase):
    words = phrase.split()
    out = {}
    for d, t in enumerate(texts):
        toks = t.split()
        hits = [
            i + 1
            for i in range(len(toks) - len(words) + 1)
            if toks[i : i + len(words)] == words
        ]
        if hits:
            out[d] = (len(hits), hits[0])
    return out


@settings(max_examples=10, deadline=None)
@given(
    texts=corpus_strategy,
    phrase=st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3).map(" ".join),
)
def test_phrase_random_corpora_match_reference(spark, texts, phrase):
    expected = _phrase_reference(texts, phrase)
    got = {
        r["id"]: (r["n_occurrences"], r["first_pos"])
        for r in search.phrase_search(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            ),
            "text",
            "doc_id",
            phrase,
        ).collect()
    }
    assert got == expected
