"""Property checks for the dedup/text operators (SURVEY.md §5.2 item 4)
plus cross-engine hash equivalence (the invariant the whole DuckDB oracle
strategy rests on)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.functions import hashing
from public_transit_status_with_apache_kafka_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),  # near dup
    (4, "completely different text about spark engines and kafka streams"),
    (5, "Short one"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_md5_long_matches_duckdb(spark):
    """Spark md5_long / minhash family == DuckDB md5_long_sql /
    minhash_hash_sql bit-for-bit — the cross-engine contract."""
    words = ["alpha", "beta", "gamma delta", "Ünïcode ✓", ""]
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    base = hashing.minhash_base("w")
    got = sdf.select(
        "w",
        hashing.md5_long("w").alias("h"),
        *[hashing.minhash_hash(base, i).alias(f"c{i}") for i in range(4)],
    ).collect()
    con = duckdb.connect()
    for r in got:
        exp_h = con.execute(f"SELECT {hashing.md5_long_sql('?::VARCHAR')}", [r.w]).fetchone()[0]
        assert r.h == exp_h, r.w
        for i in range(4):
            exp_c = con.execute(
                f"SELECT {hashing.minhash_hash_sql('?::VARCHAR', i)}", [r.w]
            ).fetchone()[0]
            assert getattr(r, f"c{i}") == exp_c, (r.w, i)


def test_minhash_family_is_distinct():
    """Different family members must disagree on the same input (the
    (a_i, b_i) parameters genuinely decorrelate the hashes)."""
    params = hashing.minhash_params(8)
    assert len(set(params)) == 8
    h = 123456789012345
    vals = {(a * h + b) % hashing.MINHASH_P for a, b in params}
    assert len(vals) == 8


def test_exact_dedup_groups_identical_content(spark, docs):
    out = dedup.exact_dedup(docs, "text", "doc_id").collect()
    groups = {r.canonical_id: r.n_copies for r in out}
    assert groups[1] == 2  # docs 1,2 identical -> canonical is min id
    assert groups[3] == 1 and groups[4] == 1
    assert sum(groups.values()) == len(DOCS)


def test_dedup_idempotence(spark, docs):
    """Applying exact dedup twice == once (A2/E1 idempotence)."""
    once = dedup.exact_dedup(docs, "text", "doc_id")
    canon = once.select(F.col("canonical_id").alias("doc_id"))
    kept = docs.join(canon, "doc_id")
    twice = dedup.exact_dedup(kept, "text", "doc_id")
    assert twice.count() == once.count()
    assert {r.canonical_id for r in twice.collect()} == {
        r.canonical_id for r in once.collect()
    }


def test_minhash_identical_docs_identical_signatures(spark, docs):
    sh = dedup.word_shingles(docs.filter("text != ''"), "text", "doc_id")
    sig = dedup.minhash_signatures(sh, n_hashes=8)
    rows = {r.id: tuple(r)[1:] for r in sig.collect()}
    assert rows[1] == rows[2]  # identical text -> identical signature
    assert rows[1] != rows[4]  # unrelated text -> different signature
    # near-dup shares most minhash components
    shared = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert shared >= 4


def test_minhash_row_order_invariant(spark, docs):
    """Signatures must not depend on input partitioning/row order."""
    base = docs.filter("text != ''")
    sig_a = dedup.minhash_signatures(dedup.word_shingles(base, "text", "doc_id"))
    shuffled = base.orderBy(F.desc("doc_id")).repartition(7)
    sig_b = dedup.minhash_signatures(dedup.word_shingles(shuffled, "text", "doc_id"))
    assert {tuple(r) for r in sig_a.collect()} == {tuple(r) for r in sig_b.collect()}


def test_lsh_finds_exact_and_near_dups(spark, docs):
    sh = dedup.word_shingles(docs.filter("text != ''"), "text", "doc_id")
    sig = dedup.minhash_signatures(sh, n_hashes=8)
    pairs = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sig).collect()}
    assert (1, 2) in pairs  # exact dup always collides in every band
    # unrelated docs should not pair with anything
    assert not any(4 in p for p in pairs)


def test_jaccard_exact_values(spark, docs):
    """Hand-checked Jaccard on 3-shingles: docs 1 vs 3 differ in one word
    of nine tokens -> 7 shingles each, 4 shared -> j = 4/10."""
    sh = dedup.word_shingles(docs.filter("doc_id in (1,3)"), "text", "doc_id")
    out = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(sh).collect()}
    assert out[(1, 3)] == pytest.approx(0.4)


def test_simhash_near_dups_have_close_hashes(spark, docs):
    out = {r.id: r.simhash for r in dedup.simhash(docs.filter("text != ''"), "text", "doc_id").collect()}
    assert out[1] == out[2]
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far


def test_connected_components_path_and_island(spark):
    """Path graph needs multiple propagation rounds; the island pair
    must keep its own min label; isolated ids don't appear."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.component) for r in dedup.connected_components(edges).collect()}
    assert got == {(i, 1) for i in range(1, 7)} | {(10, 10), (11, 10)}


def test_connected_components_endpoints_agree_on_lsh_graph(spark, docs):
    """Soundness on the real LSH pair graph: both endpoints of every
    candidate pair land in the same component, and every component is
    labeled by its own minimum member."""
    sig = dedup.minhash_signatures_text(docs, "text", "doc_id", k=3, n_hashes=6)
    pairs = dedup.lsh_candidate_pairs(sig, n_hashes=6, bands=3)
    comp = dedup.connected_components(pairs)
    joined = (
        pairs.join(comp.withColumnRenamed("id", "id_a"), "id_a")
        .withColumnRenamed("component", "comp_a")
        .join(comp.withColumnRenamed("id", "id_b"), "id_b")
        .withColumnRenamed("component", "comp_b")
    )
    assert joined.filter("comp_a != comp_b").count() == 0
    mins = comp.groupBy("component").agg(F.min("id").alias("min_id"))
    assert mins.filter("component != min_id").count() == 0


def test_dataset_split_is_stable_partition(spark):
    """e6_dataset_split invariants: the salted-hash split (1) assigns
    every doc exactly one split, (2) is deterministic across evaluations,
    and (3) lands within loose bounds of the 90/5/5 design ratios."""
    from public_transit_status_with_apache_kafka_spark.functions.hashing import md5_long

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    bucket = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":split:v1"))) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    a = docs.withColumn("split", split)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total preserved: a partition
    assert 0.85 * 2000 <= counts["train"] <= 0.95 * 2000
    assert counts["val"] > 0 and counts["test"] > 0
    # deterministic: re-evaluation assigns identical membership
    b = docs.withColumn("split", split)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # different salt re-rolls membership (some docs move)
    bucket2 = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":split:v2"))) % 100
    moved = a.withColumn(
        "split2",
        F.when(bucket2 < 90, "train").when(bucket2 < 95, "val").otherwise("test"),
    ).filter(F.col("split") != F.col("split2"))
    assert moved.count() > 0


def test_two_phase_cc_path_graph_logn_rounds(spark):
    """VERDICT r1 item 8: a 1k-node path is the adversarial shape for
    min-label propagation (diameter 999 -> 999 rounds). The
    large-star/small-star variant must solve it in O(log n) rounds and
    label every node with component 0."""
    n = 1_000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    e = edges.selectExpr("id_a as u", "id_b as v")
    parents, rounds = dedup._two_phase_cc(e, max_iter=25)
    assert rounds <= 15, f"expected O(log n) rounds, took {rounds}"
    labels = dedup.connected_components(edges, algorithm="two_phase").collect()
    assert len(labels) == n
    assert all(r.component == 0 for r in labels)


def test_two_phase_cc_matches_label_prop_on_clustered_graph(spark):
    """On small-diameter graphs (the real near-dup shape) both
    algorithms must produce identical labelings."""
    edges = []
    for c in range(20):  # 20 cliques of 5, plus a bridge inside each pair
        base = c * 10
        edges += [(base + i, base + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(0, 10), (20, 30)]  # merge two pairs of cliques
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {(r.id, r.component) for r in dedup.connected_components(df).collect()}
    b = {
        (r.id, r.component)
        for r in dedup.connected_components(df, algorithm="two_phase").collect()
    }
    assert a == b


def test_mulmod_mersenne61_exact():
    """The split-multiply must equal exact Python big-int arithmetic for
    boundary and random operands."""
    import numpy as np

    P = (1 << 61) - 1
    ys = np.array(
        [0, 1, 2, (1 << 56) - 1, 123456789012345, 0xDEADBEEFCAFE, (1 << 55) + 7],
        dtype=np.uint64,
    )
    rng = np.random.RandomState(7)
    ys = np.concatenate([ys, rng.randint(0, 1 << 56, size=5000).astype(np.uint64)])
    for a in [1, 2, P - 1, 0x9E3779B97F4A7C15 % P, 3 * 0x9E3779B97F4A7C15 % P]:
        got = dedup._mulmod_mersenne61(a, ys)
        exp = np.array([(a * int(y)) % P for y in ys], dtype=np.uint64)
        assert (got == exp).all(), a


def test_minhash_arrow_kernel_equals_expression_form(spark):
    """The Arrow kernel must be bit-identical to the oracle-verified
    array-expression form — including short docs (dropped), empty and
    unicode text."""
    rows = [(i, f"doc {i} body with some shared words and tail{i} t{i%7}") for i in range(300)]
    rows += [(1000, ""), (1001, "two tokens"), (1002, None), (1003, "Ünïcode ✓ text here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = dedup.minhash_signatures_text(df, "text", "doc_id", k=3, n_hashes=6)
    arrow = dedup.minhash_signatures_arrow(df, "text", "doc_id", k=3, n_hashes=6)
    a = {tuple(r) for r in expr.collect()}
    b = {tuple(r) for r in arrow.collect()}
    assert a == b
    # docs with >= 3 tokens survive: the 300 normal + the unicode one;
    # empty, 2-token and NULL docs drop in BOTH forms
    assert len(a) == 301


def test_simhash_arrow_kernel_equals_expression_form(spark):
    """simhash_arrow must be bit-identical to the oracle-verified
    conditional-sum expression form, including empty-string tokens."""
    rows = [(i, f"words w{i%5} shared body x{i} y{i%3}") for i in range(200)]
    rows += [(900, ""), (901, "one"), (902, None), (903, "Ünïcode ✓ here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {tuple(r) for r in dedup.simhash(df, "text", "doc_id", bits=16).collect()}
    b = {tuple(r) for r in dedup.simhash_arrow(df, "text", "doc_id", bits=16).collect()}
    assert a == b
    assert len(a) == 203  # every non-NULL doc scores (empty text included)


def test_arrow_kernels_fuzz_equality(spark):
    """Seeded fuzz: the Arrow kernels must equal the expression forms on
    adversarial tokenization shapes — double/leading/trailing spaces
    (empty tokens), unicode case pairs, CJK, emoji, digits-only."""
    import random

    rng = random.Random(42)
    vocab = [
        "word", "WORD", "Wörd", "straße", "ẞß", "İstanbul", "中文", "😀",
        "a", "", "123", "mixedCASE", "tail,punct!", "ümlaut", "ЯБЛОКО",
    ]
    rows = []
    for i in range(150):
        n = rng.randint(0, 12)
        # join with random-width space runs to plant empty tokens
        txt = (" " * rng.randint(1, 3)).join(rng.choice(vocab) for _ in range(n))
        if rng.random() < 0.2:
            txt = " " + txt + " "
        rows.append((i, txt))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    expr_mh = {tuple(r) for r in dedup.minhash_signatures_text(df, "text", "doc_id", k=3, n_hashes=6).collect()}
    arrow_mh = {tuple(r) for r in dedup.minhash_signatures_arrow(df, "text", "doc_id", k=3, n_hashes=6).collect()}
    assert expr_mh == arrow_mh

    expr_sh = {tuple(r) for r in dedup.simhash(df, "text", "doc_id", bits=16).collect()}
    arrow_sh = {tuple(r) for r in dedup.simhash_arrow(df, "text", "doc_id", bits=16).collect()}
    assert expr_sh == arrow_sh


def test_shingle_hashes_arrow_equals_expression_form(spark):
    """The Arrow shingle-hash kernel must emit exactly the exploded
    (id, md5_long(shingle)) rows of word_shingles + md5_long."""
    from public_transit_status_with_apache_kafka_spark.functions.hashing import md5_long

    rows = [(i, f"some shared words here unique{i} tail{i%3}") for i in range(100)]
    rows += [(900, ""), (901, "two tokens"), (902, None), (903, "Ünï code ✓ four")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = (
        dedup.word_shingles(df, "text", "doc_id", k=3)
        .select("id", md5_long("shingle").alias("sh"))
    )
    arrow = dedup.shingle_hashes_arrow(df, "text", "doc_id", k=3)
    assert {tuple(r) for r in expr.collect()} == {tuple(r) for r in arrow.collect()}


def test_md5_numpy_matches_hashlib():
    """The vectorized single-block MD5 (functions/md5_numpy) must equal
    hashlib's first-14-hex-digits value for fixed and ragged messages,
    including boundary lengths (0, 1, 55) and chunking (> _CHUNK rows)."""
    import hashlib

    import numpy as np

    from public_transit_status_with_apache_kafka_spark.functions import md5_numpy

    rng = np.random.RandomState(11)
    # fixed length, enough rows to cross the internal _CHUNK boundary
    n = md5_numpy._CHUNK + 500
    mat = rng.randint(0, 256, size=(n, 8)).astype(np.uint8)
    got = md5_numpy.md5_u56_fixed(mat)
    idx = np.concatenate([np.arange(300), np.arange(n - 300, n)])
    for i in idx:
        assert got[i] == int(hashlib.md5(mat[i].tobytes()).hexdigest()[:14], 16)

    # ragged 0..55-byte messages in one flat buffer
    lens = np.concatenate([[0, 1, 55], rng.randint(0, 56, size=2000)]).astype(np.int64)
    data = rng.randint(0, 256, size=int(lens.sum())).astype(np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    got_r = md5_numpy.md5_u56_ragged(data, starts, lens)
    for i in range(len(lens)):
        msg = data[starts[i] : starts[i] + lens[i]].tobytes()
        assert got_r[i] == int(hashlib.md5(msg).hexdigest()[:14], 16), i

    # one-block limit enforced
    import pytest as _pytest

    with _pytest.raises(ValueError):
        md5_numpy.md5_u56_fixed(np.zeros((1, 56), dtype=np.uint8))


def test_containment_detects_near_superset(spark):
    """A short doc quoted whole inside a long one: containment of the
    short side ~1.0 while Jaccard stays small — the signal this
    operator exists for."""
    from public_transit_status_with_apache_kafka_spark.operators import dedup

    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated words entirely different")],
        "doc_id long, text string",
    )
    sh = dedup.word_shingles(df, "text", "doc_id", k=3)
    pairs = {(r.id_a, r.id_b): r for r in dedup.containment_pairs(sh).collect()}
    jac = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(sh).collect()}
    r = pairs[(1, 2)]
    # every one of doc 1's shingles appears in doc 2
    assert r.containment_a == 1.0
    assert r.containment_b < 0.2
    assert jac[(1, 2)] < 0.2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_calibration_exact_on_planted_extremes(spark):
    """Identical docs estimate Jaccard 1 with zero error; near-disjoint
    docs (one shared shingle) land in a low bucket with bounded
    estimator error (error <= 1.0 in 1e-4-units/10000 terms by
    construction: both quantities live in [0, 10000])."""
    import shutil, tempfile, os
    from public_transit_status_with_apache_kafka_spark.plans.llm_data import QUERIES

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, dup), (2, dup), (3, "alpha beta gamma xx yy zz qq ww")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tmp = tempfile.mkdtemp(prefix="mhcal_")
    try:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.bucket: r for r in QUERIES["e2_minhash_calibration"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # exact-duplicate pair: exact_u = 10000 -> bucket 10, est matches exactly
    assert 10 in out and out[10].mean_abs_err_u4 == 0.0
    # the partial-overlap pairs sit in lower buckets with bounded error
    lower = [r for b, r in out.items() if b < 10]
    assert lower and all(0 <= r.mean_abs_err_u4 <= 10000 for r in lower)


def _jaccard_brute(corpus, pct):
    """Pure-python ground truth: word-3-gram Jaccard over every pair."""
    sets = {}
    for i, text in corpus:
        toks = text.lower().split(" ")
        s = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if s:
            sets[i] = s
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            union = len(a) + len(b) - inter
            if union and 100 * inter >= pct * union:
                out[(ids[x], ids[y])] = inter
    return out


def test_prefix_filter_pairs_equals_brute_force_randomized(spark):
    """Losslessness of the prefix bound (SSJoin/All-Pairs): on random
    corpora with planted mutations, prefix_filter_pairs returns EXACTLY
    the pairs the all-pairs brute force qualifies — no false dismissals
    from the prefix pruning, no survivors missing the threshold."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(60)]
    for trial in range(4):
        corpus = []
        base_docs = []
        for i in range(14):
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
            base_docs.append(words)
            corpus.append((i, " ".join(words)))
        # planted near-dups: copy with small mutations
        nid = len(corpus)
        for j in range(6):
            src = list(rng.choice(base_docs))
            for _ in range(rng.randint(0, max(1, len(src) // 8))):
                src[rng.randrange(len(src))] = rng.choice(vocab)
            corpus.append((nid + j, " ".join(src)))
        pct = rng.choice([30, 40, 60, 80])
        expected = _jaccard_brute(corpus, pct)
        sdf = spark.createDataFrame(corpus, "doc_id long, text string")
        sh = dedup.shingle_hashes_arrow(sdf, "text", "doc_id", k=3)
        got = {
            (r.id_a, r.id_b): r.n_shared
            for r in dedup.prefix_filter_pairs(
                sh, threshold_pct=pct, max_df=None
            ).collect()
        }
        assert got == expected, (trial, pct)


def test_prefix_filter_candidate_join_prunes(spark):
    """The point of the prefix join: strictly fewer (id, token) rows
    enter the self-join than the full token stream — and at a high
    threshold the prefix is a small fraction of it."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = dedup.shingle_hashes_arrow(docs, "text", "doc_id", k=3).localCheckpoint()
    total = sh.count()
    from pyspark.sql.window import Window

    df_tab = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    ranked = (
        sh.join(df_tab, "sh")
        .withColumn(
            "pos", F.row_number().over(Window.partitionBy("id").orderBy("df", "sh"))
        )
        .join(sizes, "id")
    )
    pct = 80
    prefix_rows = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr(f"({pct} * n + 99) div 100") + 1
    ).count()
    assert prefix_rows < total * 0.45, (prefix_rows, total)


def test_ppjoin_positional_filter_prunes_without_loss(spark):
    """Round-8 (VERDICT r7 #9): the positional upper bound must prune
    candidates the plain prefix filter admits (strictly fewer rows
    entering verification than distinct colliding pairs) while the
    FINAL pair set stays exact — the randomized brute-force equality
    test above pins exactness; this pins that the filter is actually
    ACTIVE, so a refactor can't silently turn it into a no-op."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = dedup.shingle_hashes_arrow(docs, "text", "doc_id", k=3).localCheckpoint()
    st = dedup.prefix_filter_stages(sh, threshold_pct=40)
    n_collided = st["collided"].select("id_a", "id_b").distinct().count()
    n_cand = st["cand"].count()
    assert n_cand < n_collided, (n_cand, n_collided)
    # every verified pair must survive the positional prune (soundness
    # of the bound): the final pairs computed from the pruned cand set
    # must equal the pairs computed with pruning disabled (collided as
    # candidates)
    final = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_filter_pairs(sh, threshold_pct=40).collect()
    }
    sizes, full = st["sizes"], st["shingled"]
    inter = (
        st["collided"].select("id_a", "id_b").distinct()
        .join(full.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(full.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    unpruned = {
        (r.id_a, r.id_b)
        for r in (
            inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
            .filter(F.col("n_shared") * 100 >= (F.col("na") + F.col("nb") - F.col("n_shared")) * 40)
            .select("id_a", "id_b")
            .collect()
        )
    }
    assert final == unpruned


def _containment_brute(corpus, pct):
    """All-pairs max-containment >= pct/100 over 3-gram shingle sets."""
    sets = {}
    for i, text in corpus:
        toks = text.lower().split(" ")
        s = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if s:
            sets[i] = s
    ids = sorted(sets)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            mn = min(len(a), len(b))
            if mn and 100 * inter >= pct * mn:
                out[(ids[x], ids[y])] = inter
    return out


def test_containment_prefix_pairs_equals_brute_force_randomized(spark):
    """Round 9 (VERDICT r8 #5): losslessness of the min-size prefix +
    positional bound — on random corpora with planted mutations AND
    planted sub-document quotes (the asymmetric case Jaccard misses),
    containment_prefix_pairs returns EXACTLY the brute-force
    thresholded pair set."""
    import random

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(60)]
    for trial in range(4):
        corpus = []
        base_docs = []
        for i in range(12):
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
            base_docs.append(words)
            corpus.append((i, " ".join(words)))
        nid = len(corpus)
        for j in range(4):  # near-dups (mutated copies)
            src = list(rng.choice(base_docs))
            for _ in range(rng.randint(0, max(1, len(src) // 8))):
                src[rng.randrange(len(src))] = rng.choice(vocab)
            corpus.append((nid + j, " ".join(src)))
        for j in range(3):  # planted QUOTES: short doc inside long filler
            src = rng.choice([d for d in base_docs if len(d) >= 8])
            quote = src[: rng.randint(5, len(src))]
            filler = [rng.choice(vocab) for _ in range(rng.randint(20, 50))]
            corpus.append((nid + 4 + j, " ".join(filler + quote)))
        pct = rng.choice([40, 60, 80])
        expected = _containment_brute(corpus, pct)
        sdf = spark.createDataFrame(corpus, "doc_id long, text string")
        sh = dedup.shingle_hashes_arrow(sdf, "text", "doc_id", k=3)
        got = {
            (r.id_a, r.id_b): r.n_shared
            for r in dedup.containment_prefix_pairs(
                sh, threshold_pct=pct, max_df=None
            ).collect()
        }
        assert got == expected, (trial, pct)


def test_containment_positional_filter_prunes_without_loss(spark):
    """The containment positional bound must be ACTIVE (fewer rows
    entering verification than distinct prefix collisions) while the
    final pair set stays exact vs verification over the unpruned
    collision set."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = dedup.shingle_hashes_arrow(docs, "text", "doc_id", k=3).localCheckpoint()
    st = dedup.containment_prefix_stages(sh, threshold_pct=60)
    n_collided = st["collided"].select("id_s", "id_l").distinct().count()
    n_cand = st["cand"].count()
    assert n_cand < n_collided, (n_cand, n_collided)

    final = {
        (r.id_a, r.id_b, r.n_shared)
        for r in dedup.containment_prefix_pairs(sh, threshold_pct=60).collect()
    }
    sizes, full = st["sizes"], st["shingled"]
    inter = (
        st["collided"].select("id_s", "id_l").distinct()
        .join(full.select(F.col("id").alias("id_s"), "sh"), "id_s")
        .join(full.select(F.col("id").alias("id_l"), "sh"), ["id_l", "sh"])
        .groupBy("id_s", "id_l")
        .agg(F.count("*").alias("n_shared"))
    )
    unpruned = {
        (min(r.id_s, r.id_l), max(r.id_s, r.id_l), r.n_shared)
        for r in inter.join(
            sizes.select(F.col("id").alias("id_s"), F.col("n").alias("n_s")), "id_s"
        )
        .join(sizes.select(F.col("id").alias("id_l"), F.col("n").alias("n_l")), "id_l")
        .filter(F.col("n_shared") * 100 >= F.least("n_s", "n_l") * 60)
        .collect()
    }
    assert final == unpruned


def test_containment_prefix_detects_planted_quote(spark):
    """A short doc quoted whole inside a long one qualifies at a high
    max-containment threshold even though its Jaccard is tiny — the
    pair the Jaccard-thresholded prefix join (e2_prefix_filter_pairs)
    correctly does NOT emit."""
    long_words = " ".join(f"t{i}" for i in range(80))
    short_words = " ".join(f"t{i}" for i in range(40, 52))
    sdf = spark.createDataFrame(
        [(1, long_words), (2, short_words), (3, "x1 x2 x3 x4 x5 x6")],
        "doc_id long, text string",
    )
    sh = dedup.shingle_hashes_arrow(sdf, "text", "doc_id", k=3)
    got = {
        (r.id_a, r.id_b): r
        for r in dedup.containment_prefix_pairs(sh, threshold_pct=90).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)].containment_b == 1.0  # the quote side
    assert got[(1, 2)].containment_a < 0.2
    jac = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_filter_pairs(sh, threshold_pct=40).collect()
    }
    assert (1, 2) not in jac
