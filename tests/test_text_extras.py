"""Unit tests for the round-4 text/membership operators: segment-level
dedup, interpolated bigram LM scoring, per-stratum quality gating, and
the Bloom-filter membership pre-screen."""

from __future__ import annotations

import math

import numpy as np
import pytest

from public_transit_status_with_apache_kafka_spark.operators import membership, text


def test_segment_dedup_planted_duplicates(spark):
    # doc 1 and 2 share their first 4-token segment verbatim; doc 3 is
    # unique; doc 4 is a short doc (one ragged segment)
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z w"),
        (3, "p q r s t u v n"),
        (4, "solo doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.id: r for r in text.segment_dedup(df, "text", "doc_id", seg_len=4).collect()}
    assert out[1].n_segments == 2 and out[1].n_dup_segments == 1
    assert out[2].n_segments == 2 and out[2].n_dup_segments == 1
    assert out[3].n_segments == 2 and out[3].n_dup_segments == 0
    assert out[4].n_segments == 1 and out[4].n_dup_segments == 0
    # kept checksum covers exactly the non-duplicated segments
    assert out[1].kept_checksum > 0 and out[4].kept_checksum > 0


def test_segment_dedup_within_doc_repeat_not_cross_doc(spark):
    # the same segment repeated INSIDE one doc is not a cross-doc dup
    df = spark.createDataFrame([(1, "a b c d a b c d")], ["doc_id", "text"])
    (row,) = text.segment_dedup(df, "text", "doc_id", seg_len=4).collect()
    assert row.n_segments == 2 and row.n_dup_segments == 0


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b a b" + "a b". unigrams: a=3, b=3, total=6.
    # bigrams: (a,b)x3, (b,a)x1.
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], ["doc_id", "text"])
    out = {r.id: r for r in text.bigram_logprob(df, "text", "doc_id").collect()}
    p_ab = 0.75 * 3 / 3 + 0.25 * 3 / 6
    p_ba = 0.75 * 1 / 3 + 0.25 * 3 / 6
    exp_doc1 = (
        math.floor(-math.log(p_ab) * 1e6) * 2 + math.floor(-math.log(p_ba) * 1e6)
    ) / 3 / 1e6
    assert out[1].n_bigrams == 3
    assert out[1].avg_neg_logprob == pytest.approx(round(exp_doc1, 4), abs=1e-4)
    assert out[2].n_bigrams == 1
    assert out[2].avg_neg_logprob == pytest.approx(
        round(math.floor(-math.log(p_ab) * 1e6) / 1e6, 4), abs=1e-4
    )


def test_bigram_logprob_single_token_doc_absent(spark):
    df = spark.createDataFrame([(1, "only"), (2, "two tokens")], ["doc_id", "text"])
    ids = {r.id for r in text.bigram_logprob(df, "text", "doc_id").collect()}
    assert ids == {2}  # no bigram positions -> no row, like the oracle


def test_quality_gate_keeps_best_half_per_stratum(spark):
    rows = [
        (i, " ".join(["word"] * n), lang)
        for i, (n, lang) in enumerate(
            [(5, "en"), (50, "en"), (100, "en"), (150, "en"),
             (8, "de"), (80, "de"), (160, "de")]
        )
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    kept = text.quality_gate(df, "text", "doc_id", "lang", q=0.5).collect()
    by_stratum: dict[str, list] = {}
    for r in kept:
        by_stratum.setdefault(r.stratum, []).append(r)
    # percent_rank >= 0.5 keeps ceil(n/2) rows of n (rank is (i-1)/(n-1))
    assert len(by_stratum["en"]) == 2 and len(by_stratum["de"]) == 2
    # kept rows are the top-quality ones and every rank is >= 0.5
    assert all(r.quality_rank >= 0.5 for r in kept)
    scored = {r.id: r.quality for r in text.quality_score(df, "text", "doc_id").collect()}
    for stratum, rows_ in by_stratum.items():
        kept_q = min(scored[r.id] for r in rows_)
        dropped = [
            q for i, q in scored.items()
            if i not in {r.id for r in rows_}
            and dict((r_[0], r_[2]) for r_ in rows)[i] == stratum
        ]
        assert all(kept_q >= q for q in dropped)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    ref = spark.range(0, 500).selectExpr("id", "id * 2654435761 % 900000007 as sh")
    probe = spark.range(0, 5000).selectExpr("id", "id * 2654435761 % 900000007 as sh")
    bm = membership.bloom_build(ref, "sh", m_bits=1 << 16, n_hash=4)
    out = membership.bloom_probe(probe, "sh", bm, m_bits=1 << 16, n_hash=4).collect()
    member = {r.id for r in out if r.bloom_member}
    true_members = {r.id for r in probe.join(ref.select("sh"), "sh", "left_semi").collect()}
    assert true_members <= member  # zero false negatives
    fp = len(member - true_members) / max(len(out) - len(true_members), 1)
    # m/n = 65536/500 bits per key, k=4 -> theoretical fp ~ 1e-4; allow slack
    assert fp < 0.01


def test_bloom_bitmap_deterministic(spark):
    df = spark.range(0, 100).selectExpr("id", "id * 31 as sh")
    b1 = membership.bloom_build(df, "sh")
    b2 = membership.bloom_build(df.repartition(7), "sh")
    assert b1 == b2  # partition layout cannot change the filter


def test_positions_cover_range():
    h = np.arange(10_000, dtype=np.uint64)
    for j in range(4):
        idx = membership._positions(h, j, 1 << 20)
        assert idx.min() >= 0 and idx.max() < (1 << 20)
    # different j give different position streams
    assert not np.array_equal(
        membership._positions(h, 0, 1 << 20), membership._positions(h, 1, 1 << 20)
    )


def test_segment_regexp_equals_hof_form(spark):
    """The greedy-regexp segmenter must stay bit-identical to the
    reference transform+slice+array_join formulation (the oracle's
    shape) — including ragged tails and seg_len changes."""
    from pyspark.sql import functions as F

    from public_transit_status_with_apache_kafka_spark.functions.hashing import md5_long

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for L in (3, 4, 7):
        toks = F.split(F.lower(F.col("text")), " ")
        n_segs = F.greatest(F.ceil(F.size(toks) / F.lit(L)).cast("int"), F.lit(1))
        seg_arr = F.transform(
            F.sequence(F.lit(1), n_segs),
            lambda i: F.array_join(F.slice(toks, (i - 1) * L + 1, L), " "),
        )
        hof = df.select(
            F.col("doc_id").alias("id"), F.posexplode(seg_arr).alias("pos", "seg")
        ).select("id", "pos", md5_long("seg").alias("h"))
        pat = "[^ ]+( [^ ]+){0,%d}" % (L - 1)
        rex = df.select(
            F.col("doc_id").alias("id"),
            F.posexplode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), 0)
            ).alias("pos", "seg"),
        ).select("id", "pos", md5_long("seg").alias("h"))
        assert hof.exceptAll(rex).count() == 0 and rex.exceptAll(hof).count() == 0, L


def test_top_ngram_arrow_equals_expression_form(spark):
    """The zero-shuffle Arrow kernel must be bit-identical to the
    expression form (which mirrors the DuckDB oracle), including the
    lexicographic tie-break on equal counts and the exact ratio."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    expr = {r.id: r for r in text.top_ngram_fraction(docs, "text", "doc_id").collect()}
    arrow = {r.id: r for r in
             text.top_ngram_fraction_arrow(docs, "text", "doc_id").collect()}
    assert set(expr) == set(arrow)
    for i in expr:
        assert tuple(expr[i]) == tuple(arrow[i]), i


def test_top_ngram_tie_breaks_toward_larger_gram(spark):
    """'b b a a' has 2-grams [b b, b a, a a], every count 1: the packed
    MAX must pick 'b b' (lexicographically largest) in both forms."""
    df = spark.createDataFrame([(1, "b b a a")], "doc_id long, text string")
    for fn in (text.top_ngram_fraction, text.top_ngram_fraction_arrow):
        r = fn(df, "text", "doc_id").collect()[0]
        assert (r.top_count, r.top_gram_chars) == (1, 3)
        assert r.top_ngram_frac == round(3 / 7, 4)


def test_gopher_rules_hand_computed(spark):
    """Each rule verified on hand-built edge-case docs: pass-all, too
    short, symbol-heavy, mean-word-length violations, no stopwords."""
    good = " ".join(["the", "be", "to"] + ["word"] * 60)  # passes everything
    short = "the be small"  # fails word count
    symbols = " ".join(["the", "be"] + ["###"] * 58)  # symbol cap + alpha
    longwords = " ".join(["the", "be"] + ["x" * 30] * 55)  # mean length high
    nostop = " ".join(["alpha", "beta"] * 30)  # < 2 gopher stopwords
    rows = [(1, good), (2, short), (3, symbols), (4, longwords), (5, nostop)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in text.gopher_rules(df, "text", "doc_id").collect()}

    assert out[1].keep
    assert all([out[1].r_word_count, out[1].r_mean_len, out[1].r_stopwords,
                out[1].r_alpha, out[1].r_symbols])

    assert not out[2].r_word_count and not out[2].keep
    assert out[2].n_words == 3 and out[2].n_stop == 2

    assert not out[3].r_symbols and not out[3].r_alpha and not out[3].keep
    # 58 '#'-only tokens: 174 hash marks, 0 ellipses
    assert out[3].n_symbols == 174

    assert not out[4].r_mean_len and not out[4].keep
    # ('the'+'be' = 5 chars + 55*30) * 1000 // 57 words
    assert out[4].mean_len_milli == (5 + 55 * 30) * 1000 // 57

    assert not out[5].r_stopwords and not out[5].keep
    assert out[5].n_stop == 0 and out[5].r_word_count


def test_gopher_rules_empty_and_ellipsis(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "the be " + " ".join(["ok..."] * 60))],
        "doc_id long, text string",
    )
    out = {r.id: r for r in text.gopher_rules(df, "text", "doc_id").collect()}
    # empty text -> one empty token; every count zero except n_words=1
    assert out[1].n_words == 1 and not out[1].keep
    # 60 'ok...' tokens = 60 ellipses -> 10*60 > 62 words fails the cap
    assert out[2].n_symbols == 60 and not out[2].r_symbols


def _md5_long(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_dsir_weights_hand_computed(spark):
    """DSIR avg log importance == a pure-Python reference on a tiny
    corpus (same 56-bit md5 feature hashing, same add-1 smoothing,
    same micro-nat floor + half-up 4-decimal average)."""
    import math

    target = [(100, "the cat sat"), (101, "the cat ran")]
    raw = [(1, "the cat sat"), (2, "dog dog dog"), (3, "x")]
    B, OFF = 256, 32_000_000

    def feats(text):
        toks = text.split(" ")
        out = [_md5_long(t) % B for t in toks]
        out += [_md5_long(f"{a} {b}") % B for a, b in zip(toks, toks[1:])]
        return out

    t_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    for _, tx in target:
        for b in feats(tx):
            t_counts[b] = t_counts.get(b, 0) + 1
    for _, tx in raw:
        for b in feats(tx):
            r_counts[b] = r_counts.get(b, 0) + 1
    T, R = sum(t_counts.values()), sum(r_counts.values())
    expected = {}
    for did, tx in raw:
        fs = feats(tx)
        s = sum(
            math.floor(
                math.log(
                    ((t_counts.get(b, 0) + 1) * (R + B))
                    / ((r_counts.get(b, 0) + 1) * (T + B))
                )
                * 1e6
            )
            + OFF
            for b in fs
        )
        n = len(fs)
        expected[did] = (n, (2 * s + 100 * n) // (200 * n) / 10000.0 - OFF / 1e6)

    from public_transit_status_with_apache_kafka_spark.operators.text import dsir_weights

    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r.id: (r.n_feats, r.avg_imp)
        for r in dsir_weights(raw_df, tgt_df, "text", "doc_id").collect()
    }
    assert got == expected
    # doc 1 is literally a target document; doc 2 shares nothing with
    # the target: target-like docs must score higher
    assert got[1][1] > got[2][1]


def test_substring_dedup_planted_duplicates(spark):
    """Exact-substring dedup (Lee et al. 2021 fixed-stride form):
    cross-doc duplicated substrings are found at DIFFERENT offsets
    (what aligned segment dedup misses), overlapping hit windows merge
    into one span with the exact removed-token count, within-doc
    repetition counts as duplication, and clean/short docs pass
    through untouched."""
    common = " ".join(f"c{i}" for i in range(10))  # 10 shared tokens
    x = " ".join(f"x{i}" for i in range(4))        # 4-token unit (not dup alone)
    rep8 = " ".join(f"r{i}" for i in range(8))     # 8-token within-doc repeat
    rows = [
        # common at offset 3 (doc 1) vs offset 1 (doc 2)
        (1, "a0 a1 a2 " + common + " a3 a4"),
        (2, "b0 " + common + " " + " ".join(f"b{i}" for i in range(1, 12))),
        # clean doc, long enough to have windows
        (3, " ".join(f"u{i}" for i in range(20))),
        # within-doc repetition separated by a >8-token unique gap
        (4, rep8 + " " + " ".join(f"g{i}" for i in range(10)) + " " + rep8),
        # too short for any window
        (5, "tiny doc"),
        (6, x),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.id: r for r in text.substring_dedup(df, "text", "doc_id", win_len=8).collect()}
    assert len(out) == 6

    # docs 1/2: the 10 shared tokens yield 3 shared windows each ->
    # one merged span removing exactly the 10 common tokens
    for d in (1, 2):
        assert out[d].n_dup_windows == 3, out[d]
        assert out[d].n_spans == 1, out[d]
        assert out[d].n_removed_tokens == 10, out[d]

    assert out[3].n_windows == 13 and out[3].n_dup_windows == 0
    assert out[3].n_spans == 0 and out[3].n_removed_tokens == 0

    # doc 4: rep8 appears twice within the SAME doc -> both occurrences
    # flagged, gap > win_len keeps them separate spans of 8 tokens each
    assert out[4].n_dup_windows == 2, out[4]
    assert out[4].n_spans == 2, out[4]
    assert out[4].n_removed_tokens == 16, out[4]

    # short docs: zero windows, zero everything, but still present
    for d in (5, 6):
        assert out[d].n_windows == 0 and out[d].n_removed_tokens == 0


def test_url_canonicalization_and_domain_ops(spark):
    """URL curation ops: all five synthetic surface styles of the same
    page fold to ONE canonical URL; dedup reports the raw-variant
    count; domain stats block exactly the blocklisted domains."""
    from public_transit_status_with_apache_kafka_spark.operators import urls

    rows = [
        (1, "https://src1.example.com/docs/9", 10, "en"),
        (2, "HTTPS://SRC1.EXAMPLE.COM/docs/9/", 20, "de"),
        (3, "https://src1.example.com/docs/9?utm_source=feed", 30, "en"),
        (4, "http://src1.example.com:80/docs/9#frag", 40, "en"),
        (5, "https://www.src1.example.com/docs/9", 50, "fr"),
        (6, "https://src7.example.com/docs/1", 60, "en"),
        (7, "https://src1.example.com/docs/10", 70, "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars", "lang"])

    dd = {r.canonical_url: r for r in urls.url_dedup(df).collect()}
    assert dd["src1.example.com/docs/9"].n_copies == 5
    assert dd["src1.example.com/docs/9"].n_raw_variants == 5
    assert dd["src1.example.com/docs/9"].canonical_id == 1
    assert dd["src1.example.com/docs/10"].n_copies == 1
    assert len(dd) == 3

    ds = {r.domain: r for r in urls.domain_stats(df).collect()}
    assert ds["src1.example.com"].n_docs == 6
    assert ds["src1.example.com"].is_blocked == 0
    assert ds["src1.example.com"].n_docs_kept == 6
    assert ds["src1.example.com"].n_langs == 3
    assert ds["src7.example.com"].is_blocked == 1
    assert ds["src7.example.com"].n_docs_kept == 0


def test_synthetic_urls_have_cross_style_duplicates(spark):
    """The fixture shim must produce real canonical duplicates whose
    raw surface forms DIFFER (else canonicalization is untested)."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import urls

    docs = urls.synthetic_urls(load(spark, "/root/testdata/sf0.001", "documents"))
    multi = urls.url_dedup(docs).filter("n_copies >= 2 AND n_raw_variants >= 2")
    assert multi.count() > 0


def test_substring_removal_consistent_with_dedup_spans(spark):
    """substring_removal must cut EXACTLY the tokens substring_dedup's
    merged spans cover (n_removed == n_removed_tokens per doc), and the
    cleaned text of the planted fixture drops the shared region."""
    import hashlib

    common = " ".join(f"c{i}" for i in range(10))
    rows = [
        (1, "a0 a1 a2 " + common + " a3 a4"),
        (2, "b0 " + common + " " + " ".join(f"b{i}" for i in range(1, 12))),
        (3, " ".join(f"u{i}" for i in range(20))),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    dd = {r.id: r for r in text.substring_dedup(df, "text", "doc_id", win_len=8).collect()}
    rm = {r.id: r for r in text.substring_removal(df, "text", "doc_id", win_len=8).collect()}
    for d in dd:
        assert rm[d].n_removed == dd[d].n_removed_tokens, (d, rm[d], dd[d])
        assert rm[d].n_kept == rm[d].n_tokens - rm[d].n_removed
    # doc 1 keeps exactly its private tokens around the cut region
    expect1 = "a0 a1 a2 a3 a4"
    assert rm[1].clean_md5 == hashlib.md5(expect1.encode()).hexdigest()
    # untouched doc: cleaned text == original (lowercased) text
    assert rm[3].clean_md5 == hashlib.md5(rows[2][1].encode()).hexdigest()


def test_domain_cap_keeps_lowest_ids(spark):
    """domain_cap_sample: deterministic keep set = the cap lowest doc
    ids per domain, checksum matches, totals preserved."""
    from public_transit_status_with_apache_kafka_spark.operators import urls

    rows = [
        (i, f"https://d{i % 2}.example.com/p/{i}", 10 + i)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    out = {r.domain: r for r in urls.domain_cap_sample(df, cap=3).collect()}
    for dom, ids in (("d0.example.com", [0, 2, 4]), ("d1.example.com", [1, 3, 5])):
        assert out[dom].n_docs == 10
        assert out[dom].n_kept == 3
        assert out[dom].kept_id_checksum == sum(i % 1000003 for i in ids)
        assert out[dom].n_chars_total == sum(10 + i for i in range(20) if i % 2 == (0 if dom.startswith("d0") else 1))


def test_substring_windows_arrow_equals_expression_form(spark):
    """The Arrow window-hash kernel must be bit-identical to the
    expression (oracle-shaped) form — same (id, pos, h) set."""
    from public_transit_status_with_apache_kafka_spark.io_util import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    a = {
        tuple(r)
        for r in text.substring_windows_arrow(docs, "text", "doc_id", 8).collect()
    }
    e = {
        tuple(r)
        for r in text._substring_windows_expr(docs, "text", "doc_id", 8).collect()
    }
    assert a == e and len(a) > 0


def test_pmi_collocations_ranks_bound_pair_above_independent(spark):
    """PMI semantics pinned on a planted corpus: a bigram that ONLY
    occurs as a pair ('san francisco') must out-score a bigram of two
    independently frequent words, and the micro-nat value must equal
    the closed-form ln((c_ab*N^2)/(M*c_a*c_b))."""
    import math

    from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
        e4_pmi_collocations,
    )

    docs = []
    for i in range(10):
        docs.append((i, "san francisco is big"))          # bound pair
    for i in range(10, 20):
        docs.append((i, "the cat saw the dog run"))       # independent words
    sdf = spark.createDataFrame(docs, "doc_id long, text string")

    import unittest.mock as mock
    from public_transit_status_with_apache_kafka_spark.plans import llm_data

    with mock.patch.object(llm_data, "load", lambda spark, sf, name: sdf):
        rows = {r.bigram: r for r in e4_pmi_collocations(spark, "ignored").collect()}

    assert "san francisco" in rows and "the cat" in rows
    assert rows["san francisco"].pmi_micro > rows["the cat"].pmi_micro
    # closed form: N tokens, M bigrams, all exact integers
    n = 10 * 4 + 10 * 6
    m = 10 * 3 + 10 * 5
    expect = math.floor(math.log((10 * n * n) / (m * 10 * 10)) * 1e6)
    assert rows["san francisco"].pmi_micro == expect
    assert rows["san francisco"].n_ab == 10


def test_substring_dedup_extents_are_exact_for_long_dups(spark):
    """Round-7 #5: the stride-1 form's merged spans are EXACT in token
    space for every duplicate of length >= win_len — not win_len-
    granular. A duplicated region of L tokens produces windows at
    starts p..p+L-win, whose merge covers exactly [p, p+L); the break
    rule (next - cur > win_len) splits precisely at true gaps. Planted
    here OFF-STRIDE (copies at unaligned offsets, different docs,
    different surrounding context):

    - a 13-token duplicate -> one span of exactly 13 removed tokens,
    - a separate 8-token duplicate 1 unique token away -> its own span
      (no false merge across the gap), exactly 8 more tokens,
    - a 7-token (< win_len) repeat -> invisible: the documented minimum
      duplicate length IS win_len (Lee et al.'s threshold parameter;
      they use 50, the fixtures use 8).
    """
    win = 8
    D = [f"dup{i}" for i in range(13)]       # 13-token duplicated region
    E = [f"edup{i}" for i in range(8)]       # 8-token duplicated region
    S = [f"short{i}" for i in range(7)]      # 7 tokens: below threshold
    uniq = lambda tag, n: [f"{tag}u{i}" for i in range(n)]  # noqa: E731

    # doc 1: D at offset 3, one unique token, then E; S at the end
    d1 = uniq("a", 3) + D + ["gap1"] + E + uniq("b", 4) + S
    # doc 2: same regions at DIFFERENT, unaligned offsets and order
    d2 = uniq("c", 5) + E + uniq("d", 6) + D + uniq("e", 2) + S
    df = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))], ["doc_id", "text"]
    )
    out = {
        r.id: r
        for r in text.substring_dedup(df, "text", "doc_id", win_len=win).collect()
    }
    # doc 1: D (13) and E (8) both found, as SEPARATE spans (the 1-token
    # gap "gap1" must not merge them), extents exact; S invisible
    assert out[1].n_spans == 2, out[1]
    assert out[1].n_removed_tokens == 13 + 8, out[1]
    # doc 2: same two regions, different offsets — same exact extents
    assert out[2].n_spans == 2, out[2]
    assert out[2].n_removed_tokens == 13 + 8, out[2]

    # removal agrees token-for-token: the kept text is everything else
    rm = {
        r.id: r
        for r in text.substring_removal(df, "text", "doc_id", win_len=win).collect()
    }
    for doc, toks in ((1, d1), (2, d2)):
        assert rm[doc].n_removed == 21, rm[doc]
        assert rm[doc].n_kept == len(toks) - 21

    # ADJACENT duplicated regions (no gap) merge into ONE exact span
    A = [f"adj{i}" for i in range(9)]
    B = [f"bdj{i}" for i in range(10)]
    df2 = spark.createDataFrame(
        [(1, " ".join(uniq("x", 4) + A + B + uniq("y", 3))),
         (2, " ".join(uniq("z", 2) + A + uniq("w", 5) + B))],
        ["doc_id", "text"],
    )
    out2 = {
        r.id: r
        for r in text.substring_dedup(df2, "text", "doc_id", win_len=win).collect()
    }
    assert out2[1].n_spans == 1 and out2[1].n_removed_tokens == 19, out2[1]
    assert out2[2].n_spans == 2 and out2[2].n_removed_tokens == 19, out2[2]
