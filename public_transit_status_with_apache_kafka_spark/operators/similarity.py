"""Vector similarity search over an embedding column (SURVEY.md E3).

Baseline: brute-force cosine top-k with pure array expressions
(zip_with + aggregate = a sequential double-precision fold, reproducible
in DuckDB). Scale path: random-hyperplane LSH bucketing so the pairwise
work only happens within buckets, plus pyspark.ml's
BucketedRandomProjectionLSH when the euclidean metric is acceptable.

100 TB stance: the query side is always the small side — broadcast it;
the corpus side streams through a single pass; no NxN cross join exists
anywhere except *within* an LSH bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left fold in double precision (bit-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    Broadcast the (small) query side against the corpus scan, rank with a
    deterministic (rounded_sim desc, neighbor id) window. Ranking on the
    rounded similarity keeps the result stable across engines and runs."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "sim")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v . plane_i). Vectors in
    the same bucket are cosine-close with high probability; pairwise search
    then runs per bucket (the scale path for E3/near-dup E2)."""
    sig = None
    v = _to_double(F.col(vec_col))
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.select(F.col(id_col), F.col(vec_col), sig.cast("long").alias("bucket"))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.
    Recall is tunable by n_planes / multi-probe; pytest checks recall
    against brute force on the test corpus."""
    qb = hyperplane_lsh_buckets(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    cb = hyperplane_lsh_buckets(corpus, planes, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_limit: int = 100,
    top_n: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E2 embedding-cosine near-dup: the most similar (id_a < id_b) pairs
    within a bounded window of the corpus. The bounded window keeps the
    demonstration quadratic-free at scale; the production path is
    hyperplane_lsh_buckets + per-bucket pairing."""
    sub = df.filter(F.col(id_col) < id_limit)
    a = sub.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = sub.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 4).alias("sim")
        )
    )
    # global top-N as orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-N, no single-partition sort of the full pair set); the
    # rank window then runs over only top_n rows
    order = [F.desc("sim"), F.asc("id_a"), F.asc("id_b")]
    top = pairs.orderBy(*order).limit(top_n)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*order))).select(
        "id_a", "id_b", "sim", "rnk"
    )
