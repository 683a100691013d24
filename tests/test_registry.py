"""Driver-contract invariants (__spark_entry__.py):
every oracle key has a query, names are unique, entry() runs with a
stable schema, and flagged query/oracle column names agree."""

from __future__ import annotations

import re

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 65


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "c_name",
        "last_type",
        "entries",
    ]
    assert df.count() > 0


def test_oracle_sql_has_no_spark_only_syntax():
    """Oracle strings must be DuckDB-runnable: no backticks, no Spark
    interval literals."""
    for name, sql in entry.oracle_sql().items():
        assert "`" not in sql, name
        assert not re.search(r"\bINTERVAL\s+\d+\s+DAYS\b", sql), name


def test_coverage_md_counts_match_registry():
    """COVERAGE.md's header counts are hand-maintained and drifted once
    in round 1 — pin them to the live registry (VERDICT r1 item 10)."""
    from pathlib import Path

    text = (Path(__file__).parent.parent / "COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+) queries, (\d+) oracle-verified\*\*", text)
    assert m, "COVERAGE.md header count line missing"
    assert int(m.group(1)) == len(entry.queries())
    assert int(m.group(2)) == len(entry.oracle_sql())
    m2 = re.search(r"(\d+) ok, (\d+) rows-only, 0 fail", text)
    assert m2, "COVERAGE.md expected-parity line missing"
    assert int(m2.group(1)) == len(entry.oracle_sql())
    assert int(m2.group(1)) + int(m2.group(2)) == len(entry.queries())


def test_readme_counts_match_registry():
    """README's registry counts drifted by one in round 7 (VERDICT r7
    item 2) — pin them the same way COVERAGE.md is pinned."""
    from pathlib import Path

    text = (Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(r"\((\d+) registered queries", text)
    assert m, "README registered-query count line missing"
    assert int(m.group(1)) == len(entry.queries())
    m2 = re.search(r"the (\d+) SQL-expressible ones", text)
    assert m2, "README SQL-expressible count line missing"
    assert int(m2.group(1)) == len(entry.oracle_sql())
    m3 = re.search(r"`(\d+) ok, (\d+) rows-only, 0 fail`", text)
    assert m3, "README expected-parity line missing"
    assert int(m3.group(1)) == len(entry.oracle_sql())
    assert int(m3.group(1)) + int(m3.group(2)) == len(entry.queries())


def test_derived_partsupp_primary_key_invariant(spark):
    """The derived partsupp must honor TPC-H's (ps_partkey, ps_suppkey)
    primary key: exactly 4 distinct suppliers per part at every fixture
    SF. The dbgen-faithful stride (S/4 + pk/S) violated this whenever
    that stride hit 0 mod S (60 parts at sf0.001, ADVICE r3); the fixed
    S/4 stride is provably collision-free for S >= 4."""
    from public_transit_status_with_apache_kafka_spark.plans.tpch import derived_partsupp

    for sf_dir in [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]:
        ps = derived_partsupp(spark, sf_dir)
        n_parts = ps.select("ps_partkey").distinct().count()
        n_pk = ps.select("ps_partkey", "ps_suppkey").distinct().count()
        assert n_pk == ps.count() == 4 * n_parts, sf_dir


def test_approx_percentiles_within_exact_bounds(spark):
    """x_approx_percentiles: each approx decile must land between the
    EXACT neighboring deciles (GK sketch error bound, accuracy=1000 ->
    rank error <= 0.1%)."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    approx = {r.l_returnflag: r for r in entry.queries()["x_approx_percentiles"](spark, sf).collect()}
    li = load(spark, sf, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(*[F.expr(f"percentile(l_extendedprice, {i/10})").alias(f"e{i*10}") for i in range(1, 10)])
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        for i in range(1, 10):
            lo = e[f"e{(i-1)*10}"] if i > 1 else float("-inf")
            hi = e[f"e{(i+1)*10}"] if i < 9 else float("inf")
            assert lo <= a[f"p{i*10}"] <= hi, (flag, i, a[f"p{i*10}"], lo, hi)


def test_zorder_files_bound_both_dimensions(spark):
    """x_zorder_layout: every z-file must cover a bounded range of BOTH
    keys (<= 64 of 256 values with 1024 z-values per file: a 32x32
    tile), which is the pruning property a single-key sort lacks (its
    trailing-key range spans all 256 values in every file)."""
    rows = entry.queries()["x_zorder_layout"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 1
    for r in rows:
        assert r.x_hi - r.x_lo <= 63, r
        assert r.y_hi - r.y_lo <= 63, r


def test_dq_checks_count_planted_violations(spark):
    """x_dq_checks' battery must actually count dirt: plant one pk
    duplicate, one dangling lineitem fk, one negative price, one
    out-of-range discount, one null ts, one out-of-range quantity —
    each check reports exactly its planted violation count."""
    from pyspark.sql import functions as F

    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.plans.joins_aggs import dq_report

    sf = "/root/testdata/sf0.001"
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    ev = load(spark, sf, "events")
    o_bad = o.unionByName(
        o.limit(1).withColumn("o_totalprice", F.lit(-5.0))
    )  # duplicates a pk AND plants a negative price
    li_bad = li.unionByName(
        li.limit(1)
        .withColumn("l_orderkey", F.lit(-999))  # dangling fk
        .withColumn("l_discount", F.lit(2.0))  # discount out of range
        .withColumn("l_quantity", F.lit(99.0))  # quantity out of range
    )
    ev_bad = ev.unionByName(ev.limit(1).withColumn("ts", F.lit(None).cast("timestamp")))
    got = {r["chk"]: r["n_violations"] for r in dq_report(o_bad, li_bad, ev_bad).collect()}
    assert got == {
        "orders_pk_unique": 1,
        "lineitem_fk_orders": 1,
        "orders_price_positive": 1,
        "lineitem_discount_range": 1,
        "events_ts_not_null": 1,
        "lineitem_qty_range": 1,
    }, got
    clean = {r["chk"]: r["n_violations"] for r in dq_report(o, li, ev).collect()}
    assert set(clean.values()) == {0}, clean


def test_rows_only_census_matches_registry():
    """COVERAGE.md's rows-only census table must list EXACTLY the
    registry's rows-only queries (queries() minus oracle_sql()) — the
    prose drifted in round 10 ("five classes" vs six table rows,
    VERDICT r10 What's-wrong 3), so the whole census is now pinned to
    the live registry: every census name must be a real rows-only
    query, every rows-only query must appear in exactly one class, and
    the inline total must match."""
    import re
    from pathlib import Path

    text = (Path(__file__).parent.parent / "COVERAGE.md").read_text()
    m = re.search(
        r"## Rows-only census[^\n]*\n(.*?)(?:\n## |\Z)", text, re.DOTALL
    )
    assert m, "COVERAGE.md census section missing"
    section = m.group(1)
    census: dict[str, set[str]] = {}
    for line in section.splitlines():
        if not line.startswith("|") or set(line) <= {"|", "-", " "}:
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if cells[0] in ("Reason",):
            continue
        names = set(re.findall(r"`([a-z0-9_]+)`", cells[1]))
        assert names, f"census row {cells[0]!r} lists no queries"
        census[cells[0]] = names
    listed = [n for names in census.values() for n in names]
    assert len(listed) == len(set(listed)), "query in two census classes"
    rows_only = set(entry.queries()) - set(entry.oracle_sql())
    assert set(listed) == rows_only, (
        sorted(set(listed) - rows_only),
        sorted(rows_only - set(listed)),
    )
    m2 = re.search(r"(\d+) queries total", section)
    assert m2 and int(m2.group(1)) == len(rows_only)
    m3 = re.search(r"one of (\w+) principled classes", section)
    words = {"five": 5, "six": 6, "seven": 7, "eight": 8}
    assert m3 and words.get(m3.group(1)) == len(census)
