"""Behavioral pins for the round-9 analytics2 batch, beyond the DuckDB
oracles: the HLL merge law and error envelope, MERGE INTO branch
identities, bottom-k sample semantics, planted-keyword recovery, and
kNN classification on a corpus where the labels are actually learnable
(the sf embeddings carry random labels, so the oracle proves mechanics
and this proves the classifier)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

import __spark_entry__ as entry

Q = entry.queries()


# ------------------------------------------------------------------ HLL
def test_hll_estimates_within_standard_error_envelope(spark):
    """HLL with m=256 registers has relative standard error
    1.04/sqrt(256) ~= 6.5%; every scope (including the register-merged
    union) must land within 3 sigma of exact."""
    out = Q["x_hll_union_estimate"](spark, SF_ORACLE).toPandas()
    assert len(out) == 8
    rel = (out["est_hll"] - out["n_exact"]).abs() / out["n_exact"]
    assert (rel < 3 * 1.04 / 16).all(), out


def test_hll_union_scope_consistency(spark):
    """The register-merged u_even+u_odd estimate must EQUAL the estimate
    a single sketch over all users would give: max-merge of per-scope
    registers is exactly the registers of the union (the HLL merge
    law). The query computes the merged scope from the two partial
    sketches; the per-event-type scopes each cover all users (every
    user emits every type at this SF), so their estimate IS the
    single-sketch-over-all-users value to compare against."""
    out = Q["x_hll_union_estimate"](spark, SF_ORACLE).toPandas().set_index("scope")
    merged = out.loc["u_even+u_odd", "est_hll"]
    whole = out.loc["click", "est_hll"]
    assert out.loc["click", "n_exact"] == out.loc["u_even+u_odd", "n_exact"]
    assert merged == whole


# ------------------------------------------------------------ MERGE INTO
def test_merge_into_branch_identities(spark):
    """Per-action row counts must equal the set algebra of the
    deterministic target/source split: kept = T\\S, updated/deleted
    partition T∩S by the op flag, inserted/noop partition S\\T."""
    from public_transit_status_with_apache_kafka_spark.io_util import load

    o = load(spark, SF_ORACLE, "orders").select("o_orderkey").toPandas()
    keys = set(o["o_orderkey"])
    t = {k for k in keys if k % 3 != 0}
    s = {k for k in keys if k % 2 == 0}
    expected = {
        "kept": len(t - s),
        "updated": len({k for k in t & s if k % 10 != 0}),
        "deleted": len({k for k in t & s if k % 10 == 0}),
        "inserted": len({k for k in s - t if k % 10 != 0}),
        "noop": len({k for k in s - t if k % 10 == 0}),
    }
    out = Q["x_merge_into"](spark, SF_ORACLE).toPandas().set_index("action")
    got = {a: int(out.loc[a, "n"]) for a in expected}
    assert got == expected


# ------------------------------------------------------------- sampling
def test_reservoir_sample_is_exact_bottom_k(spark):
    """The deterministic sample must be EXACTLY the k smallest salted
    hashes — globally and per type — i.e. re-running or re-partitioning
    can never change membership (the reproducible-subset property)."""
    from public_transit_status_with_apache_kafka_spark.functions.hashing import md5_long
    from public_transit_status_with_apache_kafka_spark.io_util import load

    out = Q["x_reservoir_sample"](spark, SF_ORACLE).toPandas()
    e = (
        load(spark, SF_ORACLE, "events")
        .select(
            "event_type",
            "event_id",
            md5_long(F.col("event_id").cast("string"), salt="|smp").alias("h"),
        )
        .toPandas()
    )
    g = out[out["scope"] == "__global__"]
    assert len(g) == 50
    want = set(e.nsmallest(50, ["h", "event_id"])["event_id"])
    assert set(g["event_id"]) == want
    for etype, grp in e.groupby("event_type"):
        got = set(out[out["scope"] == etype]["event_id"])
        assert got == set(grp.nsmallest(20, ["h", "event_id"])["event_id"]), etype


# ----------------------------------------------------------- keywords
def test_keyword_extract_recovers_planted_keyword(spark, tmp_path):
    """A token over-represented in one source must surface as that
    source's top keyword (and not as any other source's)."""
    rows = []
    for i in range(40):
        src = f"s{i % 4}"
        base = "the quick brown fox jumps over the lazy dog"
        text = base + (" qqqmarker qqqmarker" if src == "s0" else "")
        rows.append((i, text, "en", src, len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = Q["e4_keyword_extract"](spark, str(tmp_path)).toPandas()
    top_s0 = out[(out["source"] == "s0") & (out["rnk"] == 1)]["tok"].iloc[0]
    assert top_s0 == "qqqmarker"
    assert not ((out["source"] != "s0") & (out["tok"] == "qqqmarker")).any()


# ------------------------------------------------------------------ kNN
def test_knn_classify_perfect_on_separable_clusters(spark, tmp_path):
    """On a corpus whose labels ARE geometrically meaningful (three
    orthogonal clusters with small deterministic jitter), the 5-NN
    majority vote must classify every held-out query correctly."""
    dim = 8
    rows = []
    for vid in range(60):
        label = vid % 3
        vec = [0.0] * dim
        vec[label] = 10.0
        vec[(label + 3) % dim] = 0.01 * (vid % 7)  # deterministic jitter
        rows.append((vid, [float(x) for x in vec], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = Q["e3_knn_classify"](spark, str(tmp_path)).toPandas()
    assert len(out) == 10
    assert (out["correct"] == 1).all(), out


# ----------------------------------------------- time-series diagnostics
def test_autocorr_detects_planted_weekly_cycle(spark, tmp_path):
    """A series with a strong 7-day cycle must show acf(7) >> acf(1..3):
    plant one event per (day, slot) with slot count cycling by dow."""
    import datetime as dt

    rows = []
    eid = 0
    d0 = dt.datetime(2024, 1, 1)
    for day in range(112):  # 16 full weeks
        n = 10 + (40 if day % 7 == 0 else 0)  # weekly spike
        for k in range(n):
            ts = d0 + dt.timedelta(days=day, seconds=k)
            rows.append((eid, ts, eid % 50, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = Q["x_autocorr_lags"](spark, str(tmp_path)).toPandas().set_index("lag")
    assert out.loc[7, "acf"] > 0.9
    assert (out.loc[[1, 2, 3], "acf"] < 0.2).all()


def test_seasonal_decompose_recovers_planted_dow_effect(spark, tmp_path):
    """With a planted Monday spike, the Monday (isodow=1) seasonal
    component must be strongly positive and the others negative; the
    trend level must sit at the series mean."""
    import datetime as dt

    rows = []
    eid = 0
    d0 = dt.datetime(2024, 1, 1)  # a Monday
    for day in range(84):
        n = 20 + (70 if day % 7 == 0 else 0)
        for k in range(n):
            ts = d0 + dt.timedelta(days=day, seconds=k)
            rows.append((eid, ts, eid % 50, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = Q["x_seasonal_decompose"](spark, str(tmp_path)).toPandas().set_index("dow")
    assert out.loc[1, "seasonal"] == pytest.approx(60.0, abs=1.0)
    assert (out.drop(index=1)["seasonal"] < 0).all()
    assert out["trend_level"].mean() == pytest.approx(30.0, abs=1.0)


# ----------------------------------------------------------- chi-square
def test_chisq_total_is_sum_of_cells_and_zero_under_independence(spark, tmp_path):
    """(a) The reported total equals the sum of per-cell contributions.
    (b) A perfectly independent planted table (identical dow profile
    for every type) must yield chi2 == 0 exactly."""
    import datetime as dt

    out = Q["x_chisq_independence"](spark, SF_ORACLE).toPandas()
    assert (out["chi2_total_micro"] == out["chi2_micro"].sum()).all()

    rows = []
    eid = 0
    d0 = dt.datetime(2024, 1, 1)
    for day in range(14):
        for etype in ("a", "b"):
            for k in range(5):  # same count for every (type, day)
                ts = d0 + dt.timedelta(days=day, seconds=k)
                rows.append((eid, ts, 1, etype, 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    flat = Q["x_chisq_independence"](spark, str(tmp_path)).toPandas()
    assert (flat["chi2_micro"] == 0).all()
    assert (flat["chi2_total_micro"] == 0).all()


# ------------------------------------------------------------ KMV/theta
def test_kmv_exact_degradation_below_k(spark, tmp_path):
    """Sets smaller than k must report est == n_exact (theta = M, every
    hash retained): the sketch degrades to an exact distinct count."""
    import datetime as dt

    rows = []
    eid = 0
    d0 = dt.datetime(2024, 1, 1)
    for uid in range(10):  # 10 users click-high, 6 of them also view-high
        rows.append((eid, d0, uid, "click", 200.0, "{}")); eid += 1
        if uid < 6:
            rows.append((eid, d0, uid, "view", 200.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = Q["x_kmv_intersection"](spark, str(tmp_path)).toPandas().set_index("scope")
    assert (out["est"] == out["n_exact"]).all(), out
    assert out.loc["a", "n_exact"] == 10
    assert out.loc["b", "n_exact"] == 6
    assert out.loc["intersection", "n_exact"] == 6
    assert out.loc["union", "n_exact"] == 10


def test_kmv_estimates_within_envelope_at_sf(spark):
    """In the estimating regime (sf0.1 sets >> k=64) every estimate must
    land within the KMV error envelope (~1/sqrt(k-1) per set; looser for
    the intersection, which divides a smaller retained sample)."""
    out = Q["x_kmv_intersection"](spark, "/root/testdata/sf0.1").toPandas()
    out = out.set_index("scope")
    for scope in ("a", "b", "union"):
        rel = abs(out.loc[scope, "est"] - out.loc[scope, "n_exact"]) / out.loc[
            scope, "n_exact"
        ]
        assert rel < 4 / (64 - 1) ** 0.5, (scope, out)
    rel_i = abs(
        out.loc["intersection", "est"] - out.loc["intersection", "n_exact"]
    ) / out.loc["intersection", "n_exact"]
    assert rel_i < 0.5, out


# ---------------------------------------------------------------- PRF
def test_prf_expansion_widens_recall(spark, tmp_path):
    """A document sharing NO term with the query but co-occurring with
    its feedback docs' dominant term must enter the top-k only AFTER
    expansion — the recall-widening property PRF exists for."""
    rows = []
    # feedback docs: match query 1 ("hash join") and carry marker 'zzz'
    for i in range(3):
        rows.append((i, "hash join zzz zzz zzz", "en", "s0", 20))
    # the recall target: only reachable via the expansion term
    rows.append((10, "zzz zzz zzz zzz", "en", "s0", 15))
    # background noise so idf is meaningful
    for i in range(20, 60):
        rows.append((i, "the quick brown fox jumps over lazy dog", "en", "s1", 40))
    # weak matches for the other two fixed queries so they return rows
    rows.append((61, "window agg stream", "en", "s1", 17))
    rows.append((62, "customer order value", "en", "s1", 20))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    plain = Q["e8_bm25_topk"](spark, str(tmp_path)).toPandas()
    prf = Q["e8_prf_expansion"](spark, str(tmp_path)).toPandas()
    q1_plain = set(plain[plain["query_id"] == 1]["id"])
    q1_prf = set(prf[prf["query_id"] == 1]["id"])
    assert 10 not in q1_plain
    assert 10 in q1_prf


# ------------------------------------------------------------------- KS
def test_ks_detects_planted_drift(spark, tmp_path):
    """A pair with a shifted value distribution must reject at 5%
    (drift_at_5pct = 1) with a large statistic; an identical-
    distribution pair must accept with a near-zero statistic."""
    import datetime as dt

    rows, eid = [], 0
    d0 = dt.datetime(2024, 1, 1)
    for i in range(400):
        v = float(i % 100)
        rows.append((eid, d0, 1, "click", v, "{}")); eid += 1
        rows.append((eid, d0, 1, "view", v, "{}")); eid += 1          # identical
        rows.append((eid, d0, 1, "purchase", v + 60.0, "{}")); eid += 1  # shifted
        rows.append((eid, d0, 1, "signup", v, "{}")); eid += 1
        rows.append((eid, d0, 1, "error", v, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = Q["x_ks_drift_test"](spark, str(tmp_path)).toPandas().set_index("label")
    assert out.loc["click|purchase", "drift_at_5pct"] == 1
    assert out.loc["click|purchase", "ks_stat"] > 0.5
    assert out.loc["click|view", "drift_at_5pct"] == 0
    assert out.loc["click|view", "ks_stat"] == 0.0
    assert out.loc["signup|error", "drift_at_5pct"] == 0
