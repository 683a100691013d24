"""Local mirror of the driver's DuckDB-oracle correctness gate.

For every queries() entry with an oracle_sql(): run both at the given SF,
compare row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats kept as the queries emit
them — queries are responsible for rounding). Prints one line per query
and a summary; exit code 1 on any mismatch.

Usage: python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from public_transit_status_with_apache_kafka_spark.io_util import TABLES  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.astype(object).map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def run_parity(
    spark,
    sf_dir: str,
    only: set[str] | None = None,
    oracle_only: bool = False,
    verbose: bool = True,
) -> tuple[int, int, list[str]]:
    """Run the oracle gate; returns (n_pass, n_rows_only, failures).

    ``oracle_only=True`` restricts to queries with an oracle (the
    hash-verified gate, skipping rows-only executions) — what the
    routine sf0.1 regression test runs."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        import os as _os

        if _os.path.isdir(path):  # Spark-written dir (e.g. the sf1.0 fixture)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracle = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []

    def report(line: str) -> None:
        if verbose:
            print(line)

    for name, fn in queries.items():
        if only and name not in only:
            continue
        if oracle_only and name not in oracle:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            report(f"FAIL {name}: spark query raised")
            if verbose:
                traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracle:
            n_rows_only += 1
            report(f"rows-only {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as exc:
            report(f"FAIL {name}: oracle SQL raised: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} != {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}")
        if not problems:
            ns, nd = normalize(sdf), normalize(ddf)
            if value_hash(ns) != value_hash(nd):
                diff = ns.compare(nd) if ns.shape == nd.shape else None
                problems.append(
                    f"value hash mismatch"
                    + (f"; first diffs:\n{diff.head(5)}" if diff is not None and not diff.empty else "")
                )
        if problems:
            n_fail += 1
            failures.append(name)
            report(f"FAIL {name}: {'; '.join(problems)}  [{time.time()-t0:.1f}s]")
        else:
            n_pass += 1
            report(f"ok   {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")

    report(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} fail")
    if failures:
        report("failures: " + " ".join(failures))
    return n_pass, n_rows_only, failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark("parity", cpus=8, shuffle_partitions=8)
    _, _, failures = run_parity(spark, sf_dir, only=only)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
