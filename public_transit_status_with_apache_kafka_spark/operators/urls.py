"""URL/domain-level curation operators (SURVEY §2.10 extension; VERDICT
r5 #5): canonicalized-URL exact dedup and per-domain aggregation with a
blocklist filter — the RefinedWeb/C4 "front door" (Penedo et al. 2023
§3.1 filter by URL before touching content; Raffel et al. 2020 C4
page-level dedup keys on URL).

The driver's documents fixture carries no URL column, so
:func:`synthetic_urls` derives one deterministically from (doc_id,
source) in five messy-but-equivalent surface styles (case variants,
trailing slash, utm tracking param, explicit :80 port + fragment, www
prefix). The derivation is plain column arithmetic, so the DuckDB
oracle rebuilds the identical URLs and the canonicalization +
dedup/aggregation results are fully value-verifiable. Swap
synthetic_urls for a real `url` column and everything downstream is
unchanged.

Scale shape: canonicalization is a fixed chain of 6 codegen'd
regexp_replace ops, map-side; URL dedup shuffles the canonical-URL
string key exactly like e1_exact_dedup shuffles md5 fingerprints (at
100 TB, hash the canonical form first for a fixed-width key); domain
aggregation is one partial-aggregable groupBy over ~domain-cardinality
groups with the blocklist as a literal IN predicate (a real blocklist
of millions of domains would broadcast-join instead — same plan shape
as the DSIR bucket broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: modulus for the synthetic path: a multiple of the fixture's 20
#: sources, so doc_ids congruent mod 100 share source AND path — real
#: cross-style duplicate canonical URLs exist at every SF
PATH_MOD = 100

DEFAULT_BLOCKLIST = ("src7.example.com", "src13.example.com")


def synthetic_urls(
    df: DataFrame, id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Attach a deterministic `url` column in one of five surface
    styles chosen by doc_id % 7 % 5 (7 is coprime with PATH_MOD, so
    canonical-equal docs land in different styles)."""
    host = F.concat(F.col(source_col), F.lit(".example.com"))
    path = F.concat(F.lit("/docs/"), (F.col(id_col) % PATH_MOD).cast("string"))
    style = (F.col(id_col) % 7) % 5
    url = (
        F.when(style == 0, F.concat(F.lit("https://"), host, path))
        .when(style == 1, F.concat(F.lit("HTTPS://"), F.upper(host), path, F.lit("/")))
        .when(style == 2, F.concat(F.lit("https://"), host, path, F.lit("?utm_source=feed")))
        .when(style == 3, F.concat(F.lit("http://"), host, F.lit(":80"), path, F.lit("#frag")))
        .otherwise(F.concat(F.lit("https://www."), host, path))
    )
    return df.withColumn("url", url)


def synthetic_url_sql() -> str:
    """DuckDB rendering of :func:`synthetic_urls`'s url expression."""
    host = "source || '.example.com'"
    path = f"'/docs/' || CAST(doc_id % {PATH_MOD} AS VARCHAR)"
    return f"""CASE (doc_id % 7) % 5
      WHEN 0 THEN 'https://' || {host} || {path}
      WHEN 1 THEN 'HTTPS://' || upper({host}) || {path} || '/'
      WHEN 2 THEN 'https://' || {host} || {path} || '?utm_source=feed'
      WHEN 3 THEN 'http://' || {host} || ':80' || {path} || '#frag'
      ELSE 'https://www.' || {host} || {path} END"""


def canonicalize_url(url: Column) -> Column:
    """Scheme-free canonical form: lowercase, drop https?://, drop the
    #fragment, drop utm_* tracking params, drop a leading www., drop an
    explicit :80 default port, drop a trailing slash. Six chained
    regexp_replace ops — whole-stage codegen, no UDF."""
    c = F.lower(url)
    c = F.regexp_replace(c, "^https?://", "")
    c = F.regexp_replace(c, "#.*$", "")
    c = F.regexp_replace(c, r"[?&]utm_[^&#]*", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, "^([^/:]+):80(/|$)", "$1$2")
    return F.regexp_replace(c, "/$", "")


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB rendering of :func:`canonicalize_url` (same chain; DuckDB
    backrefs are \\1, Spark's are $1)."""
    c = f"lower({expr})"
    c = f"regexp_replace({c}, '^https?://', '')"
    c = f"regexp_replace({c}, '#.*$', '')"
    # 'g' flag: Spark's regexp_replace replaces ALL matches, DuckDB's
    # default is first-match-only — URLs with several utm_* params would
    # diverge cross-engine without it (anchored rules match at most once).
    c = f"regexp_replace({c}, '[?&]utm_[^&#]*', '', 'g')"
    c = f"regexp_replace({c}, '^www\\.', '')"
    c = f"regexp_replace({c}, '^([^/:]+):80(/|$)', '\\1\\2')"
    return f"regexp_replace({c}, '/$', '')"


def domain_of(canonical: Column) -> Column:
    """Host part of a canonical URL (everything before the first /)."""
    return F.substring_index(canonical, "/", 1)


def url_dedup(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Canonicalized-URL exact dedup: one row per canonical URL with
    the canonical (min-id) doc, the copy count, and how many distinct
    RAW surface forms collapsed into it (n_raw_variants > 1 is the
    value canonicalization adds over raw-URL dedup)."""
    canon = canonicalize_url(F.col(url_col)).alias("canonical_url")
    return (
        df.select(canon, F.col(id_col).alias("id"), F.col(url_col).alias("raw"))
        .groupBy("canonical_url")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
            F.countDistinct("raw").alias("n_raw_variants"),
        )
    )


def domain_cap_sample(
    df: DataFrame,
    cap: int = 10,
    id_col: str = "doc_id",
    url_col: str = "url",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb/C4 anti-boilerplate
    lever: no single domain may dominate the corpus): keep at most
    ``cap`` docs per domain, deterministically the lowest doc ids.
    Emits the per-domain decision summary with an id-checksum pinning
    exact kept membership.

    Scale shape: the keep set per domain is the mergeable partial
    top-k from the ANN work (operators/similarity.grouped_topk,
    ascending by id) — per-partition truncation to ``cap`` rows per
    domain then a bounded merge, so a million-page domain never
    shuffles more than partitions * cap of its rows and there is no
    Window over the domain key (the hot-domain analog of the hot-LSH-
    bucket rule)."""
    from .similarity import grouped_topk

    canon = canonicalize_url(F.col(url_col))
    rows = df.select(
        domain_of(canon).alias("domain"),
        F.col(id_col).alias("id"),
        F.col(chars_col).alias("chars"),
    )
    kept = grouped_topk(
        rows.select("domain", "id", F.col("id").alias("ord")),
        cap, "ord", ascending=True, group_col="domain", id_col="id",
    ).select("domain", "id")
    totals = rows.groupBy("domain").agg(
        F.count("*").alias("n_docs"), F.sum("chars").alias("n_chars_total")
    )
    kept_stats = (
        rows.join(kept, ["domain", "id"])
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(F.pmod(F.col("id"), F.lit(1000003))).cast("long").alias(
                "kept_id_checksum"
            ),
        )
    )
    return totals.join(kept_stats, "domain").select(
        "domain", "n_docs", "n_chars_total", "n_kept", "kept_id_checksum"
    )


def domain_stats(
    df: DataFrame,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    id_col: str = "doc_id",
    url_col: str = "url",
    chars_col: str = "n_chars",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-domain aggregation + blocklist filter flag: docs, chars,
    distinct languages, blocked status, and docs surviving the
    blocklist — the decision table a domain-level curation pass acts
    on."""
    canon = canonicalize_url(F.col(url_col))
    rows = df.select(
        domain_of(canon).alias("domain"),
        F.col(chars_col).alias("chars"),
        F.col(lang_col).alias("lang"),
    )
    is_blocked = F.col("domain").isin(*blocklist).cast("int")
    return (
        rows.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars").alias("n_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .select(
            "domain",
            "n_docs",
            "n_chars",
            "n_langs",
            is_blocked.alias("is_blocked"),
            F.when(is_blocked == 1, F.lit(0)).otherwise(F.col("n_docs")).alias("n_docs_kept"),
        )
    )
