"""Hypothesis property tests: the round-4 text operators vs pure-Python
references on random small corpora. Few examples (each runs Spark jobs)
but adversarial shapes: tiny vocab -> forced duplicate segments/ngrams,
ragged tails, single-token docs."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_status_with_apache_kafka_spark.operators import text

WORDS = ["a", "bb", "ccc", "dd", "e"]

doc = st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


def ref_segments(t: str, L: int) -> list[str]:
    toks = t.lower().split(" ")
    return [" ".join(toks[i : i + L]) for i in range(0, len(toks), L)]


@settings(max_examples=8, deadline=None)
@given(docs=corpus)
def test_segment_dedup_matches_reference(spark, docs):
    L = 3
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r.id: r for r in text.segment_dedup(df, "text", "doc_id", seg_len=L).collect()}
    seg_docs = {i: ref_segments(t, L) for i, t in enumerate(docs)}
    by_seg: dict[str, set] = {}
    for i, segs in seg_docs.items():
        for s in segs:
            by_seg.setdefault(s, set()).add(i)
    for i, segs in seg_docs.items():
        dup = sum(1 for s in segs if len(by_seg[s]) >= 2)
        assert got[i].n_segments == len(segs), (i, docs)
        assert got[i].n_dup_segments == dup, (i, docs)


@settings(max_examples=8, deadline=None)
@given(docs=corpus)
def test_bigram_logprob_matches_reference(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r.id: r for r in text.bigram_logprob(df, "text", "doc_id").collect()}
    toks = {i: t.lower().split(" ") for i, t in enumerate(docs)}
    uni = Counter(w for ts in toks.values() for w in ts)
    total = sum(uni.values())
    big = Counter(
        (ts[j - 1], ts[j]) for ts in toks.values() for j in range(1, len(ts))
    )
    for i, ts in toks.items():
        if len(ts) < 2:
            assert i not in got
            continue
        nll = [
            math.floor(
                -math.log(
                    0.75 * big[(ts[j - 1], ts[j])] / uni[ts[j - 1]]
                    + 0.25 * uni[ts[j]] / total
                )
                * 1e6
            )
            for j in range(1, len(ts))
        ]
        assert got[i].n_bigrams == len(nll)
        # compare against the UNROUNDED mean with half-ulp-of-round-4
        # slack: Python's round() is banker's, Spark/DuckDB round
        # HALF_UP, and hypothesis found a corpus landing exactly on a
        # .00005 boundary (engine and oracle agree with each other)
        exp_raw = sum(nll) / len(nll) / 1e6
        assert abs(got[i].avg_neg_logprob - exp_raw) <= 5.0001e-5, (i, docs)


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(doc, min_size=2, max_size=8))
def test_dup_ngram_fraction_matches_reference(spark, docs):
    k = 2
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r.id: r for r in text.dup_ngram_fraction(df, "text", "doc_id", k=k).collect()}
    sh_docs = {
        i: {" ".join(ts[j : j + k]) for j in range(max(len(ts) - k + 1, 0))}
        for i, ts in ((i, t.lower().split(" ")) for i, t in enumerate(docs))
    }
    dfreq = Counter(s for shs in sh_docs.values() for s in shs)
    for i, shs in sh_docs.items():
        if not shs:
            assert i not in got
            continue
        dup = sum(1 for s in shs if dfreq[s] >= 2)
        assert got[i].n_shingles == len(shs), (i, docs)
        assert got[i].n_dup_shingles == dup, (i, docs)


@settings(max_examples=8, deadline=None)
@given(docs=corpus)
def test_top_ngram_fraction_matches_reference(spark, docs):
    """Both forms vs a pure-Python reference, including the tie-break
    (max count, then lexicographically largest gram) and the exact
    half-up integer-ratio rounding. Tiny vocab forces count ties."""
    k = 2
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    for fn in (text.top_ngram_fraction, text.top_ngram_fraction_arrow):
        got = {r.id: r for r in fn(df, "text", "doc_id", k=k).collect()}
        expected_ids = set()
        for i, t in enumerate(docs):
            low = t.lower()
            toks = low.split(" ")
            if len(toks) < k:
                continue
            expected_ids.add(i)
            counts = Counter(" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1))
            c, gram = max((c, g) for g, c in counts.items())
            num, den = c * len(gram), max(len(low), 1)
            q = (2 * num * 10_000 + den) // (2 * den)
            r = got[i]
            assert (r.n_distinct_grams, r.top_count, r.top_gram_chars) == (
                len(counts), c, len(gram)), (i, docs)
            assert r.top_ngram_frac == q / 10_000.0, (i, docs)
        assert set(got) == expected_ids, docs


def ref_substring_dedup(docs: list[str], L: int) -> dict[int, tuple]:
    """Pure-Python reference for substring_dedup: window hashes by
    content equality, dup = total occurrences >= 2 corpus-wide, spans
    merge when starts are <= L apart; removed = union of [p, p+L)."""
    wins: dict[int, list[tuple[int, str]]] = {}
    freq: Counter = Counter()
    for d, t in enumerate(docs):
        toks = t.lower().split(" ")
        ws = [
            (i + 1, " ".join(toks[i : i + L]))
            for i in range(max(len(toks) - L + 1, 0))
        ]
        wins[d] = ws
        freq.update(w for _, w in ws)
    out = {}
    for d, ws in wins.items():
        dup = sorted(p for p, w in ws if freq[w] >= 2)
        covered: set[int] = set()
        spans = 0
        for j, p in enumerate(dup):
            covered.update(range(p, p + L))
            if j + 1 >= len(dup) or dup[j + 1] - p > L:
                spans += 1
        out[d] = (len(ws), len(dup), spans, len(covered))
    return out


@settings(max_examples=8, deadline=None)
@given(docs=corpus)
def test_substring_dedup_matches_reference(spark, docs):
    """Property: the distributed span math (array_sort + zip_with +
    aggregate) equals a brute-force Python union-of-intervals on random
    tiny-vocab corpora (tiny vocab forces window collisions; ragged and
    sub-window docs exercise the zero-window path)."""
    L = 3
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r.id: (r.n_windows, r.n_dup_windows, r.n_spans, r.n_removed_tokens)
        for r in text.substring_dedup(df, "text", "doc_id", win_len=L).collect()
    }
    assert got == ref_substring_dedup(docs, L)


@settings(max_examples=6, deadline=None)
@given(docs=corpus)
def test_substring_removal_matches_reference(spark, docs):
    """Property: the rewrite keeps exactly the uncovered tokens, in
    order — cleaned text md5 equals the Python reference's."""
    import hashlib

    L = 3
    ref = ref_substring_dedup(docs, L)
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r.id: r for r in text.substring_removal(df, "text", "doc_id", win_len=L).collect()
    }
    freq: Counter = Counter()
    toks_by_doc = {}
    for d, t in enumerate(docs):
        toks = t.lower().split(" ")
        toks_by_doc[d] = toks
        freq.update(
            " ".join(toks[i : i + L]) for i in range(max(len(toks) - L + 1, 0))
        )
    for d, toks in toks_by_doc.items():
        dup = [
            i + 1
            for i in range(max(len(toks) - L + 1, 0))
            if freq[" ".join(toks[i : i + L])] >= 2
        ]
        covered = {t for p in dup for t in range(p, p + L)}
        kept = [tok for j, tok in enumerate(toks, start=1) if j not in covered]
        assert got[d].n_removed == ref[d][3]
        assert got[d].clean_md5 == hashlib.md5(" ".join(kept).encode()).hexdigest(), (
            d, toks, dup,
        )
