"""Hot-key skew hardening for the near-dup operators (VERDICT r1 items
1-2): a degenerate LSH bucket (thousands of identical/boilerplate docs)
and a stop-phrase shingle must not concentrate quadratic work in one
task. The caps are mirrored in the DuckDB oracle, so these tests run the
REGISTERED queries against planted corpora where the caps actually bind
and assert Spark == DuckDB end to end.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import Observation
from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.operators import dedup
from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
    MAX_BUCKET,
    MAX_DF,
    N_HASHES,
    BANDS,
    ORACLE,
    QUERIES,
)

# distinct docs: two near-dup pairs + unrelated filler (rare shingles only)
DISTINCT_DOCS = [
    (90_001, "the quick brown fox jumps over the lazy dog tonight"),
    (90_002, "the quick brown fox jumps over the lazy dog today"),
    (90_003, "spark structured streaming handles late arriving data with event time watermarks and stateful operators tonight"),
    (90_004, "spark structured streaming handles late arriving data with event time watermarks and stateful operators today"),
    (90_005, "completely unrelated text about distributed query planning"),
]


def _planted_docs(n_clones: int, clone_text: str):
    rows = [(i, clone_text) for i in range(n_clones)]
    return rows + DISTINCT_DOCS


def _write_documents(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _oracle_df(sf_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(ORACLE[name]).df()


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_lsh_hot_bucket_parity_under_skew(spark, tmp_path):
    """1500 identical docs exceed MAX_BUCKET: both engines drop the hot
    bucket, keep the near-dup pairs among distinct docs, and still
    hash-match each other."""
    sf_dir = _write_documents(
        spark, tmp_path, _planted_docs(MAX_BUCKET + 500, "identical boiler plate body")
    )
    got = _sorted(QUERIES["e2_lsh_candidate_pairs"](spark, sf_dir).toPandas())
    exp = _sorted(_oracle_df(sf_dir, "e2_lsh_candidate_pairs"))
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_dtype=False
    )
    # every clone-clone pair is gone; the distinct near-dup pairs survive
    assert not ((got["id_a"] < 90_000) & (got["id_b"] < 90_000)).any()
    pairs = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    assert (90_001, 90_002) in pairs
    assert (90_003, 90_004) in pairs


def test_lsh_drop_bounds_bucket_and_reports_overflow(spark):
    """10k identical docs: the oversized bucket never reaches a
    collect_set (membership is filtered on bucket size first), and the
    Observation metrics report the overflow for free."""
    rows = _planted_docs(10_000, "ten thousand copies of this exact sentence")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.minhash_signatures_text(df, "text", "doc_id", k=3, n_hashes=N_HASHES)
    obs = Observation("lsh_skew")
    pairs = dedup.lsh_candidate_pairs(
        sig, n_hashes=N_HASHES, bands=BANDS, max_bucket=100, observation=obs
    ).toPandas()
    assert obs.get["max_bucket_size"] == 10_000
    # the clones collide in every band: BANDS oversized buckets x 10k rows
    assert obs.get["n_oversized_rows"] == BANDS * 10_000
    # no clone-clone pair materialized anywhere
    assert not ((pairs["id_a"] < 90_000) & (pairs["id_b"] < 90_000)).any()
    assert {(90_001, 90_002), (90_003, 90_004)} <= set(
        map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False))
    )


def test_lsh_salt_mode_keeps_bounded_recall(spark):
    """oversize='salt': the hot bucket splits into deterministic md5
    sub-buckets, so clones still pair — but each doc's fan-out stays
    O(max_bucket), never O(bucket)."""
    rows = _planted_docs(1_000, "salted bucket clone sentence body")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.minhash_signatures_text(df, "text", "doc_id", k=3, n_hashes=N_HASHES)
    cap = 50
    pairs = dedup.lsh_candidate_pairs(
        sig, n_hashes=N_HASHES, bands=BANDS, max_bucket=cap, oversize="salt"
    ).toPandas()
    clone_pairs = pairs[(pairs["id_a"] < 90_000) & (pairs["id_b"] < 90_000)]
    assert len(clone_pairs) > 0  # recall inside the hot bucket is partial, not zero
    partners = pd.concat([clone_pairs["id_a"], clone_pairs["id_b"]]).value_counts()
    # sub-bucket sizes are ~Binomial(1000, cap/1000); 4*cap is a loose
    # bound that only breaks if salting failed to spread the bucket
    assert partners.max() <= 4 * cap
    # determinism: same input -> same sub-bucket assignment -> same pairs
    again = dedup.lsh_candidate_pairs(
        sig, n_hashes=N_HASHES, bands=BANDS, max_bucket=cap, oversize="salt"
    ).toPandas()
    assert set(map(tuple, pairs.itertuples(index=False))) == set(
        map(tuple, again.itertuples(index=False))
    )


def test_jaccard_hot_shingle_parity_under_skew(spark, tmp_path):
    """A stop-phrase 3-gram shared by MAX_DF+200 docs: both engines prune
    it before the intersection join (bounded fan-out) and still match."""
    n_hot = MAX_DF + 200
    rows = [
        (i, f"common boiler plate phrase unique{i} filler{i} tail{i}")
        for i in range(n_hot)
    ] + DISTINCT_DOCS
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = _sorted(QUERIES["e2_jaccard_topk"](spark, sf_dir).toPandas())
    exp = _sorted(_oracle_df(sf_dir, "e2_jaccard_topk"))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # boilerplate docs share ONLY capped shingles -> no pair between them
    hot_pairs = got[(got["id_a"] < 90_000) & (got["id_b"] < 90_000)]
    assert len(hot_pairs) == 0
    # the genuine near-dups still rank on top
    assert {(90_001, 90_002), (90_003, 90_004)} <= set(
        map(tuple, got[["id_a", "id_b"]].itertuples(index=False))
    )


def test_jaccard_df_cap_bounds_join_fanout(spark):
    """The intersection join's per-shingle fan-out is bounded by the DF
    cap: planted 5k-doc hot shingle contributes zero join rows."""
    rows = [(i, f"hot stop phrase u{i} v{i} w{i}") for i in range(5_000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.word_shingles(df, "text", "doc_id", k=3)
    pairs = dedup.jaccard_pairs(sh, max_df=100)
    assert pairs.count() == 0  # without the cap this would be ~12.5M pairs


def test_segment_dedup_hot_boilerplate_segment(spark):
    """Every document shares one boilerplate segment (the degenerate
    input the two-level-agg formulation exists for): the hot segment
    must be counted as duplicated in every doc, unique tails kept, and
    the query must complete without a window buffering the hot key."""
    from public_transit_status_with_apache_kafka_spark.operators.text import segment_dedup

    n = 2000
    rows = [(i, f"common boiler plate segment u{i} v{i} w{i} x{i}") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    out = segment_dedup(df, "text", "doc_id", seg_len=4).collect()
    assert len(out) == n
    for r in out:
        assert r.n_segments == 2 and r.n_dup_segments == 1, r
        assert r.kept_checksum > 0  # the unique tail survived


def test_dup_ngram_hot_shingle(spark):
    """One 3-gram present in every document: dup_frac must reflect it
    exactly (groupBy+join-back path, no window over the shingle key)."""
    from public_transit_status_with_apache_kafka_spark.operators.text import (
        dup_ngram_fraction,
    )

    n = 1000
    rows = [(i, f"shared hot gram only{i} here{i}") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    out = {r.id: r for r in dup_ngram_fraction(df, "text", "doc_id", k=3).collect()}
    assert len(out) == n
    # shingles per doc: "shared hot gram", "hot gram onlyN", "gram onlyN hereN"
    for r in out.values():
        assert r.n_shingles == 3 and r.n_dup_shingles == 1
        assert abs(r.dup_frac - 0.3333) < 1e-9


def test_probe_pairs_finds_planted_batch_neardup(spark):
    """A batch doc that near-duplicates a historical doc must surface as
    a (batch_id, hist_id) candidate; unrelated batch docs must not."""
    hist_rows = DISTINCT_DOCS
    batch_rows = [
        (99_001, "the quick brown fox jumps over the lazy dog yesterday"),  # near-dup of 90_001/2
        (99_002, "totally novel content with no historical counterpart whatsoever"),
    ]
    sig = lambda rows: dedup.minhash_signatures_arrow(  # noqa: E731
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", "doc_id",
        k=3, n_hashes=N_HASHES,
    )
    pairs = dedup.lsh_probe_pairs(
        sig(batch_rows), sig(hist_rows),
        n_hashes=N_HASHES, bands=BANDS, max_bucket=MAX_BUCKET,
    ).collect()
    got = {(r.batch_id, r.hist_id) for r in pairs}
    assert any(b == 99_001 and h in (90_001, 90_002) for b, h in got), got
    assert not any(b == 99_002 for b, _ in got), got


def test_probe_pairs_hot_history_bucket_capped(spark):
    """A degenerate historical bucket (hundreds of identical docs) must
    emit NO probe pairs once over the cap — cost stays bounded even when
    the batch doc would collide with every clone."""
    cap = 50
    clone = "identical boilerplate body repeated across the historical corpus"
    hist_rows = [(i, clone) for i in range(cap * 4)] + DISTINCT_DOCS
    batch_rows = [(99_100, clone), (99_101, DISTINCT_DOCS[0][1])]
    sig = lambda rows: dedup.minhash_signatures_arrow(  # noqa: E731
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", "doc_id",
        k=3, n_hashes=N_HASHES,
    )
    pairs = dedup.lsh_probe_pairs(
        sig(batch_rows), sig(hist_rows),
        n_hashes=N_HASHES, bands=BANDS, max_bucket=cap,
    ).collect()
    got = {(r.batch_id, r.hist_id) for r in pairs}
    # the hot-clone probe is dropped with its bucket...
    assert not any(b == 99_100 for b, _ in got), got
    # ...while normal probes still match history
    assert any(b == 99_101 and h == 90_001 for b, h in got), got


def test_prefix_filter_exchange_grows_linearly(spark):
    """Round-7 bound: the prefix-filter candidate EXCHANGE (pre-distinct
    self-join output — the shuffle SSJoin exists to bound) must grow
    ~linearly in corpus size on the salted-replicate fixture. 4x the
    docs may cost at most 4x * 1.5 slack the exchanged pairs."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from tools.probe_prefix_filter import exchange_counts, salted_replicate

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )

    def counts(factor):
        big = salted_replicate(docs, factor)
        sh = dedup.shingle_hashes_arrow(big, "text", "doc_id", k=3)
        out = exchange_counts(sh, threshold_pct=40, max_df=1000)
        out["docs"] = big.count()
        return out

    c1, c4 = counts(1), counts(4)
    assert c4["exchanged"] <= 4 * 1.5 * c1["exchanged"], (c1, c4)
    assert c4["cand"] <= 4 * 1.5 * c1["cand"], (c1, c4)
    # prefix keeps ~60% of postings at pct=40 (plus <= 1 token per doc)
    assert c4["prefix_rows"] <= 0.62 * c4["postings"] + c4["docs"], c4


def test_prefix_filter_df_cap_bounds_adversarial_exchange(spark):
    """SSJoin worst case: every token mid-frequency (df ~ uniform),
    so rare-first prefixes have no selectivity. The df cap restores the
    arithmetic bound exchanged <= prefix_rows * (max_df - 1) / 2, and
    sizing the cap BELOW the uniform df empties the corpus (the recall
    trade is explicit, not silent)."""
    from tools.probe_prefix_filter import exchange_counts

    n_docs, m, vocab = 400, 20, 100  # df ~ 80 per token
    adv = (
        spark.range(n_docs)
        .select(
            F.col("id"),
            F.explode(
                F.expr(f"transform(sequence(0, {m - 1}),"
                       f" j -> (id * 37 + j * 13) % {vocab})")
            ).alias("tok"),
        )
        .distinct()
        .select("id", F.xxhash64(F.col("tok").cast("string")).alias("sh"))
    ).localCheckpoint()

    capped = exchange_counts(adv, threshold_pct=40, max_df=100)
    assert capped["exchanged"] <= capped["prefix_rows"] * 99 // 2
    assert capped["exchanged"] > 0  # cap above df: nothing dropped
    under = exchange_counts(adv, threshold_pct=40, max_df=40)
    assert under["postings"] == 0  # cap below the uniform df: explicit empty
