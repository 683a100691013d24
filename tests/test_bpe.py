"""BPE merge training / segmentation: engine vs a pure-Python reference
implementation of greedy BPE (Sennrich et al. 2016), plus determinism
and scale-shape checks."""

from __future__ import annotations

from collections import Counter

from public_transit_status_with_apache_kafka_spark.operators import bpe

EOW = "_"


def ref_merges(texts: list[str], n: int):
    freqs = Counter(w for t in texts for w in t.lower().split(" ") if w)
    vocab = {tuple(list(w) + [EOW]): f for w, f in freqs.items()}
    merges = []
    for _ in range(n):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((a, b, cnt))
        vocab = {ref_apply(syms, a, b): f for syms, f in vocab.items()}
    return merges


def ref_apply(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_segment(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    for w in text.lower().split(" "):
        syms = tuple(list(w) + [EOW])
        for a, b in merges:
            syms = ref_apply(syms, a, b)
        out.extend(syms)
    return out


def test_bpe_merges_match_reference_toy(spark):
    texts = ["low low low lower lowest", "new newer newest", "low lower"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe.bpe_merges(df, "text", n_merges=6).collect()
    ]
    assert got == ref_merges(texts, 6)


def test_bpe_merges_match_reference_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe.bpe_merges(docs, "text", n_merges=5).collect()
    ]
    assert got == ref_merges(texts, 5)


def test_bpe_segment_matches_reference(spark):
    texts = ["low low low lower lowest", "new newer newest"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    learned = [
        (r.left, r.right) for r in bpe.bpe_merges(df, "text", n_merges=5).collect()
    ]
    out = {r.id: r for r in bpe.bpe_segment(df, "text", "doc_id", learned).collect()}
    for i, t in enumerate(texts):
        assert out[i].n_bpe_tokens == len(ref_segment(t, learned))


def test_bpe_merges_deterministic_across_partitioning(spark):
    texts = ["a b ab abc", "ab ab abc c c c"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    m1 = bpe.bpe_merges(df, "text", n_merges=4).collect()
    m2 = bpe.bpe_merges(df.repartition(7), "text", n_merges=4).collect()
    assert m1 == m2


def test_plan_merge_batches_splits_on_interaction():
    """Chained/interacting merges must NOT share a batch: an output
    feeding a later merge, or one rule's right symbol being another's
    left (either direction), forces a sequential boundary."""
    assert bpe.plan_merge_batches(
        [("e", "r"), ("e", "_"), ("n", "_"), ("er", "_")]
    ) == [[("e", "r"), ("e", "_"), ("n", "_")], [("er", "_")]]
    # right-of-one == left-of-other (both directions) splits
    assert bpe.plan_merge_batches([("a", "b"), ("b", "c")]) == [
        [("a", "b")],
        [("b", "c")],
    ]
    assert bpe.plan_merge_batches([("b", "c"), ("a", "b")]) == [
        [("b", "c")],
        [("a", "b")],
    ]
    # fully disjoint stays one batch
    assert bpe.plan_merge_batches([("a", "b"), ("c", "d"), ("e", "f")]) == [
        [("a", "b"), ("c", "d"), ("e", "f")]
    ]


def test_bpe_segment_batched_equals_reference_on_interacting_merges(spark):
    """bpe_segment with a merge list that SPLITS into several batches
    (outputs feeding later merges, shared chain symbols) must equal the
    strictly-sequential reference on adversarial words — the guard that
    batching never changes semantics, only pass count."""
    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("c", "_")]
    assert len(bpe.plan_merge_batches(merges)) >= 3
    texts = [
        "abc bca cab abab bcbc abcabc",
        "a b c ab bc abc",
        "aabbcc abccba cccab",
        "b c bc cb bbc bcc",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.id: r.n_bpe_tokens
        for r in bpe.bpe_segment(df, "text", "doc_id", merges).collect()
    }
    expect = {i: len(ref_segment(t, merges)) for i, t in enumerate(texts)}
    assert got == expect
    # and the checksum separator stays merge-sensitive: same char
    # stream, different segmentation -> different md5
    df2 = spark.createDataFrame([(0, "ab c"), (1, "a bc")], "doc_id long, text string")
    rows = bpe.bpe_segment(df2, "text", "doc_id", merges).collect()
    assert rows[0].segmentation_md5 != rows[1].segmentation_md5


def test_plan_merge_batches_condition_safe_on_random_merge_lists():
    """Randomized guard on the batching CONDITION (not just the Spark
    plumbing): for random merge lists over a tiny alphabet — maximizing
    chain/output collisions — applying each planned batch in ONE
    left-to-right pass must equal the strictly-sequential reference on
    every word of an adversarial corpus. A condition that wrongly
    batches interacting merges fails here within a few seeds."""
    import itertools
    import random

    def apply_batch_once(syms, batch):
        out = []
        for s in syms:
            if out and any(out[-1] == a and s == b for a, b in batch):
                out[-1] = out[-1] + s
            else:
                out.append(s)
        return out

    alpha = "abc_"
    rng = random.Random(20260816)
    words = [list(w) for L in range(1, 6) for w in itertools.product(alpha, repeat=L)]
    for _ in range(200):
        pool = [
            (a, b)
            for a in list(alpha) + ["ab", "bc", "a_"]
            for b in list(alpha) + ["ab", "bc"]
        ]
        merges = rng.sample(pool, rng.randint(1, 5))
        batches = bpe.plan_merge_batches(merges)
        assert [m for b in batches for m in b] == merges  # order preserved
        for w in words:
            seq = w
            for a, b in merges:
                seq = list(ref_apply(tuple(seq), a, b))
            got = w
            for batch in batches:
                got = apply_batch_once(got, batch)
            assert got == seq, (merges, w, got, seq)
