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

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def partition_topk(
    scored: DataFrame,
    k: int,
    order_col: str,
    ascending: bool,
    group_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Mergeable partial top-k, stage 1: per input partition keep at most
    k rows per group by (order asc/desc, id asc) — bounded state via a
    mapInPandas fold over the partition's Arrow batches (a sorted-array
    truncation: the running survivor set never exceeds groups * k rows).

    This replaces the round-5 ``Window.partitionBy(query_id)`` rank: a
    window shuffles the ENTIRE scored corpus into n_query partitions and
    sorts each to take k — a corpus-sized exchange whose parallelism is
    capped at the query count. Here the exchange downstream of this
    operator carries at most n_partitions * n_groups * k rows — flat in
    corpus size (the same partial-then-merge shape the heavy-hitter
    sketches use). Values pass through Arrow untouched (no rescoring),
    so ranks are bit-identical to the window form."""
    cols = list(scored.columns)
    assert {group_col, id_col, order_col} <= set(cols), cols

    def fold(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            cur = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            cur = cur.sort_values(
                [group_col, order_col, id_col],
                ascending=[True, ascending, True],
                kind="mergesort",
            )
            acc = cur.groupby(group_col, sort=False).head(k).reset_index(drop=True)
        if acc is not None and len(acc):
            yield acc[cols]

    return scored.mapInPandas(fold, schema=scored.schema)


def merge_topk(
    cand: DataFrame,
    k: int,
    order_col: str,
    ascending: bool,
    group_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Mergeable partial top-k, stage 2: exact rank over the bounded
    survivor set WITHOUT a window — groupBy(group) + array_sort of the
    collected (key, id, value) structs + slice + posexplode. collect_list
    here is bounded by stage 1 (≤ n_partitions * k rows per group), so
    the aggregation state is small by construction; array_sort makes the
    result deterministic regardless of collect order. ``0.0 - x`` (not
    unary minus) realizes descending order while mapping 0.0 -> +0.0 so
    sign-of-zero never perturbs struct comparison."""
    key = F.col(order_col) if ascending else (F.lit(0.0) - F.col(order_col))
    return (
        cand.groupBy(group_col)
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            key.alias("k0"),
                            F.col(id_col).alias("i1"),
                            F.col(order_col).alias("v2"),
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select(group_col, F.posexplode("top").alias("pos", "t"))
        .select(
            group_col,
            F.col("t.i1").alias(id_col),
            (F.col("pos") + 1).cast("int").alias(rank_col),
            F.col("t.v2").alias(order_col),
        )
    )


def grouped_topk(
    scored: DataFrame,
    k: int,
    order_col: str,
    ascending: bool,
    group_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """partition_topk + merge_topk: exact per-group top-k with a
    corpus-size-independent shuffle and no Window anywhere."""
    part = partition_topk(scored, k, order_col, ascending, group_col, id_col)
    return merge_topk(part, k, order_col, ascending, group_col, id_col)


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

    Broadcast the (small) query side against the corpus scan, rank by
    (rounded_sim desc, neighbor id) via the mergeable partial top-k
    (grouped_topk: per-partition truncation then a bounded merge — no
    corpus-sized exchange, no Window). Ranking on the rounded similarity
    keeps the result stable across engines and runs."""
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
    return grouped_topk(scored, k, "sim", ascending=False).select(
        "query_id", "neighbor_id", "rnk", "sim"
    )


def _bucket_expr(vec: Column, planes: list[list[float]], pre_cast: bool = False) -> Column:
    """Random-hyperplane signature expression: bit i = sign(v . plane_i).
    Pass ``pre_cast=True`` when ``vec`` is already array<double> — the
    cast is a per-plane HOF that codegen cannot CSE, so callers hashing
    against many planes should hoist it once behind a barrier."""
    sig = None
    v = vec if pre_cast else _to_double(vec)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def hyperplane_lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v . plane_i). Vectors in
    the same bucket are cosine-close with high probability; pairwise search
    then runs per bucket (the scale path for E3/near-dup E2)."""
    return df.select(
        F.col(id_col), F.col(vec_col), _bucket_expr(F.col(vec_col), planes).alias("bucket")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]] | list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket(s).

    ``planes`` is one plane set (single table) or a list of plane sets
    (multi-table OR-amplification — the standard recall lever: a true
    neighbor is found if it collides in ANY table). Candidates are the
    union of per-table bucket matches, deduped before scoring so each
    (query, neighbor) is scored once."""
    tables = planes if isinstance(planes[0][0], (list, tuple)) else [planes]

    # All tables' buckets in ONE Arrow-batched numpy matmul per batch:
    # (N, dim) @ (dim, n_tables*n_planes) then per-table bit packing.
    # Spark's higher-order-function lambdas are interpreted (no codegen),
    # so n_tables*n_planes per-row dot folds are the slow path here —
    # this is the documented "vectorized Pandas UDF when built-ins can't
    # express it efficiently" escape hatch (SURVEY §2.9).
    from pyspark.sql.functions import pandas_udf

    plane_mat = np.concatenate([np.asarray(t, dtype=np.float64) for t in tables]).T
    sizes = [len(t) for t in tables]
    offsets = np.cumsum([0] + sizes)

    @pandas_udf("array<long>")
    def all_buckets(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        bits = (mat @ plane_mat) >= 0  # (N, total_planes)
        out = np.zeros((mat.shape[0], len(sizes)), dtype=np.int64)
        for t in range(len(sizes)):
            for j in range(sizes[t]):
                out[:, t] |= bits[:, offsets[t] + j].astype(np.int64) << j
        return pd.Series(list(out))

    def bucketed(df, out_id, out_vec):
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(all_buckets(F.col(vec_col))).alias("table_idx", "bucket"),
        )

    qb = bucketed(queries, "query_id", "q_vec")
    cb = bucketed(corpus, "neighbor_id", "c_vec")
    candidates = (
        cb.join(F.broadcast(qb), ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
    )
    return grouped_topk(scored, k, "sim", ascending=False).select(
        "query_id", "neighbor_id", "rnk", "sim"
    )


def ivf_assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF build phase: assign every vector to its nearest centroid
    (cosine). One broadcast join against the tiny centroid set + a
    max_by — the 100 TB path partitions the corpus by cell afterwards
    so probes touch only matching partitions."""
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.join(F.broadcast(cent)).select(
        id_col, vec_col, "cell", cosine(F.col(vec_col), F.col("cent_vec")).alias("cs")
    )
    # deterministic assignment: rank on the ROUNDED similarity with a
    # smaller-cell tie-break, encoded as one scalar so DuckDB's arg_max
    # can mirror it — this is what lets e3_ivf_topk carry a full value
    # oracle. Round 12 (ADVICE): the 4dp similarity is a multiple of
    # 1e4 on the 1e8 scale, so the tie-break quantum is 10,000 and the
    # subtracted cell id is a PURE tie-break for any cell < 1e4 — the
    # old 1e5 scale had quantum 10, which a cell-id gap > 10 could
    # outrank, assigning a vector to a not-nearest centroid. Mirrored
    # verbatim in the three SQL oracles (e3_ivf_topk, the frozen
    # IVF-k-means oracle, the streaming ANN oracle).
    order_val = F.round(F.col("cs"), 4) * 100_000_000 - F.col("cell")
    return (
        scored.groupBy(id_col, vec_col)
        .agg(F.max_by("cell", order_val).alias("cell"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 6,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> DataFrame:
    """E3 scale path (IVF flavor): coarse-quantize the corpus into
    n_centroids cells, probe only the n_probe cells nearest each query.

    centroid_mode picks the coarse quantizer:
    - "first": the first n_centroids corpus vectors by id —
      deterministic without an iterative fit (demonstrates the cell
      *structure* at minimum cost).
    - "kmeans": spherical k-means centroids from
      operators/kmeans.kmeans_fit run on L2-NORMALIZED vectors
      (deterministic init, a few rounds) — trained on a bounded
      deterministic sample (train_size=1024, the FAISS production
      shape: at 100 TB the quantizer trains on a sample; only
      assignment streams the corpus). Normalization matters:
      Euclidean Lloyd on raw vectors builds cells that disagree with
      the cosine probe metric; on unit vectors Euclidean and cosine
      order identically, so cells align with probing.
    Work scales as |corpus| * n_centroids (assignment, broadcast) +
    |query| * (n_probe/n_centroids) * |corpus| (probed scan) — never
    N x N."""
    if centroid_mode == "kmeans":
        idx = ivf_kmeans_build(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
        return ivf_kmeans_serve(idx, queries, n_probe, k, id_col, vec_col)
    centroids = corpus.orderBy(id_col).limit(n_centroids)
    cells = ivf_assign_cells(corpus, centroids, id_col, vec_col)

    return ivf_serve(queries, cells, centroids, n_probe, k, id_col, vec_col)


def _centroids_df(spark, cent_mat, id_col: str, vec_col: str) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cent_mat)],
        f"{id_col} long, {vec_col} array<double>",
    )


def ivf_kmeans_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_dir: str | None = None,
    on_stale: str = "rebuild",
    train_size: int | None = 1024,
):
    """IVF build with the production quantizer (spherical k-means on
    L2-normalized vectors — see ivf_topk's centroid_mode note), split
    out as a build/serve pair like pq_build/ivfpq_build (round 9): the
    Lloyd fit (sample-trained, kmeans_fit(train_size) — one bounded
    collect instead of iters full-corpus rounds) plus full-corpus cell
    assignment run ONCE and persist under ``store_dir`` (cells as
    parquet, centroids + corpus fingerprint in the npz manifest via
    the shared AnnIndex store); every later call loads. The fit is
    deterministic and shared with ivf_topk(kmeans), so served results
    are exactly the from-scratch results — tests/test_similarity.py
    pins the equality."""
    from .kmeans import kmeans_fit
    from .pq import AnnIndex, _load_index, _save_index, corpus_fingerprint

    spark = corpus.sparkSession
    fp = corpus_fingerprint(corpus, id_col)
    if store_dir is not None:
        idx = _load_index(
            spark, "ivfkm", store_dir, expected_fp=fp, on_stale=on_stale
        )
        if idx is not None:
            return idx
    norm = l2_norm(F.col(vec_col))
    unit = corpus.select(
        id_col,
        F.transform(_to_double(F.col(vec_col)), lambda x: x / norm).alias(vec_col),
    )
    cent_mat, _ = kmeans_fit(
        unit, k=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col,
        train_size=train_size,
    )
    cells = ivf_assign_cells(
        corpus, _centroids_df(spark, cent_mat, id_col, vec_col), id_col, vec_col
    )
    idx = AnnIndex("ivfkm", cells, {"centroids": cent_mat, "corpus_fp": fp})
    if store_dir is not None:
        idx = _save_index(idx, store_dir)
    return idx


def ivf_kmeans_serve(
    idx,
    queries: DataFrame,
    n_probe: int = 6,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve phase over a built/loaded k-means IVF index: probe the
    n_probe nearest cells, score members only (ivf_serve)."""
    centroids = _centroids_df(
        idx.index.sparkSession, idx.centroids, id_col, vec_col
    )
    return ivf_serve(queries, idx.index, centroids, n_probe, k, id_col, vec_col)


def ivf_serve(
    queries: DataFrame,
    cells: DataFrame,
    centroids: DataFrame,
    n_probe: int = 6,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF serve phase over PREBUILT cell assignments (columns id, vec,
    cell): probe the n_probe nearest cells per query, score only their
    members. Split out of :func:`ivf_topk` so index build/serve can be
    separated (persisted cells, streamed ingest — e3_stream_ann_ingest).
    Because each vector's cell depends only on the frozen centroids,
    serve results over streamed-in cells are exactly those over a
    from-scratch batch build."""
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # probe-cell selection: per-query top-n_probe over the (tiny,
    # n_centroids-bounded) centroid scores — merge_topk alone suffices,
    # then reattach q_vec from the query frame
    probe_scored = q.join(F.broadcast(cent)).select(
        "query_id",
        "cell",
        F.round(cosine(F.col("q_vec"), F.col("cent_vec")), 4).alias("pcs"),
    )
    probes = (
        merge_topk(probe_scored, n_probe, "pcs", ascending=False, id_col="cell")
        .select("query_id", "cell")
        .join(q, "query_id")
    )
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col(vec_col)), 4).alias("sim"),
        )
    )
    return grouped_topk(scored, k, "sim", ascending=False).select(
        "query_id", "neighbor_id", "rnk", "sim"
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
    from .rank import attach_bounded_rank

    return attach_bounded_rank(top, order).select(
        "id_a", "id_b", "sim", "rnk"
    )


def binary_signatures(
    df: DataFrame,
    dim: int,
    word_bits: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """1-bit sign quantization: bit j of word w is (v[word_bits*w+j] > 0).

    The 32x footprint cut below int8 — a 100 TB float32 embedding corpus
    becomes ~3 TB of packed words, and Hamming distance (a proxy for
    cosine on roughly-centered vectors, Charikar 2002's hyperplane bound
    with axis-aligned planes) is XOR + popcount, entirely JVM-side
    integer ops inside whole-stage codegen. word_bits=32 keeps every
    packed word positive in both engines (no BIGINT sign-bit edge), so
    the DuckDB oracle mirrors bit-for-bit. Pure map-side expressions:
    no shuffle, no UDF."""
    n_words = (dim + word_bits - 1) // word_bits
    cols = [F.col(id_col)]
    for w in range(n_words):
        # one F.expr per word: building 32 bit terms as Column objects
        # costs ~400 py4j round-trips per word (measured 2.2-2.8 s of
        # DRIVER time per query build at dim=64); a single SQL string
        # parses JVM-side in one call and compiles to the same codegen
        terms = " + ".join(
            f"IF({vec_col}[{w * word_bits + j}] > 0, {1 << j}L, 0L)"
            for j in range(min(word_bits, dim - w * word_bits))
        )
        cols.append(F.expr(f"CAST({terms} AS BIGINT)").alias(f"w{w}"))
    return df.select(*cols)


def hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    word_bits: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest by Hamming distance over binary_signatures.

    Same scale shape as every E3 search: the bounded query side
    broadcasts, the corpus streams one pass through XOR+popcount (a few
    integer instructions per candidate — the cheapest whole-corpus scan
    of the quantization family), global per-query top-k via the
    mergeable partial top-k (grouped_topk — per-partition truncation,
    bounded merge, no Window: the shuffle after the scan carries at
    most n_partitions * n_query * k rows regardless of corpus size).
    Distance computation stays pure JVM codegen; only the k-row-per-
    group truncation runs through Arrow. Deterministic: distances are
    integers, ties break on id."""
    n_words = (dim + word_bits - 1) // word_bits
    q = binary_signatures(queries, dim, word_bits, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"w{w}").alias(f"qw{w}") for w in range(n_words)],
    )
    c = binary_signatures(corpus, dim, word_bits, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"w{w}") for w in range(n_words)],
    )
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"w{w}").bitwiseXOR(F.col(f"qw{w}")))
        ham = term if ham is None else ham + term
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ham.cast("int").alias("hamming"))
    )
    return grouped_topk(scored, k, "hamming", ascending=True).select(
        "query_id", "neighbor_id", "rnk", "hamming"
    )


def matryoshka_topk(
    queries: DataFrame,
    corpus: DataFrame,
    prefix_dim: int,
    shortlist: int = 20,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN over Matryoshka-style nested embeddings (Kusupati
    et al. 2022): score the cheap PREFIX of each vector (prefix_dim of
    dim dims — MRL training makes prefixes usable embeddings), keep a
    per-query shortlist, then re-rank only the shortlist with the full
    vector. The production trick that cuts full-dimension work by
    shortlist/corpus while keeping full-precision ranking.

    Scale shape: stage 1 is the standard broadcast-queries/one-corpus-
    pass scan but touching only prefix_dim floats per row (at 100 TB
    the prefix can be a separate narrow column/file so the scan reads
    prefix_dim/dim of the bytes), ranked by the mergeable partial top-k
    (no Window, shuffle flat in corpus size, and only the 3-column
    (query, neighbor, pre_sim) stream crosses Arrow — never the
    vectors); stage 2 fetches the shortlist's full vectors via a
    broadcast semi-join and re-scores shortlist * n_query rows —
    corpus-size-independent. Both stages rank on rounded sims with id
    tie-breaks, so the result is deterministic and fully
    DuckDB-oracle-verifiable."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.slice(F.col(vec_col), 1, prefix_dim).alias("q_pre"),
    )
    c_pre = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.slice(F.col(vec_col), 1, prefix_dim).alias("c_pre"),
    )
    pre_scored = c_pre.join(
        F.broadcast(q.select("query_id", "q_pre")),
        F.col("query_id") != F.col("neighbor_id"),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_pre"), F.col("c_pre")), 4).alias("pre_sim"),
    )
    short = grouped_topk(pre_scored, shortlist, "pre_sim", ascending=False).select(
        "query_id", "neighbor_id"
    )
    rescored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
        .join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(q.select("query_id", "q_vec")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
        )
    )
    return merge_topk(rescored, k, "sim", ascending=False).select(
        "query_id", "neighbor_id", "rnk", "sim"
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 quantization — the 4x footprint cut that makes a
    100 TB embedding corpus ANN-searchable in memory: each vector maps
    its [min, max] range onto [-128, 127] with its own scale.

    q_i = floor((x_i - min) / scale) - 128, scale = (max - min) / 256
    (floor, not round: identical semantics in Spark and DuckDB; the
    x = max edge clamps to 127). Emits per-vector summary columns
    (scale, quantized checksum/min/max/first, max reconstruction error)
    rather than the int8 array itself so the DuckDB oracle can
    hash-compare rows. Entirely map-side column expressions: no
    shuffle, no UDF.

    The explode(array(struct(...))) steps are Generate BARRIERS
    (HOF-CSE exclusion — see dedup.minhash_signatures_text): without
    them every transform element re-inlines array_min/array_max over
    the whole vector, turning an O(d) map into O(d^2) per row (5.1s ->
    0.6s warm at sf0.1)."""
    v0 = _to_double(F.col(vec_col))
    stats = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                F.struct(
                    v0.alias("v"),
                    F.array_min(v0).alias("mn"),
                    F.array_max(v0).alias("mx"),
                    ((F.array_max(v0) - F.array_min(v0)) / F.lit(256.0)).alias("scale"),
                )
            )
        ).alias("s"),
    ).select("id", "s.v", "s.mn", "s.mx", "s.scale")
    mn, mx, scale = F.col("mn"), F.col("mx"), F.col("scale")
    q_expr = F.transform(
        F.col("v"),
        lambda x: F.when(mx == mn, F.lit(0).cast("long")).otherwise(
            F.least(F.floor((x - mn) / scale), F.lit(255).cast("long")) - 128
        ),
    )
    qd = stats.select(
        "id", "v", "mn", "scale", F.explode(F.array(q_expr)).alias("q")
    )
    # dequantized midpoint of each bucket; worst-case error <= scale/2
    deq = F.transform(F.col("q"), lambda qi: mn + ((qi + 128).cast("double") + 0.5) * scale)
    err = F.array_max(F.zip_with(F.col("v"), deq, lambda x, d: F.abs(x - d)))
    # err gets its OWN Generate barrier: evaluated as a sibling of the
    # other lambda expressions below, Spark's interpreted-HOF path
    # returns a DIFFERENT (wrong, > scale/2) value — lambda-variable
    # reuse after subexpression elimination. Verified: err alone is
    # correct, err beside the q aggregates is not. The barrier puts the
    # transform/zip_with chain in a separate operator, one lambda
    # expression (aggregate) remains in the final projection.
    ed = qd.select(
        "id", "scale", "q", F.explode(F.array(err)).alias("_err")
    )
    return ed.select(
        "id",
        F.round(scale, 6).alias("scale"),
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.element_at(F.col("q"), 1).alias("q_first"),
        F.round(F.col("_err"), 6).alias("max_abs_err"),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_chunk: int = 4096,
) -> DataFrame:
    """Approximate cosine top-k over int8-QUANTIZED storage — what
    quantize_int8's 4x compression buys at search time: the corpus
    streams as int8 codes + per-vector (min, scale); each Arrow batch
    reconstructs float32 and matmuls against the broadcast query
    matrix. Ranking error is bounded by the scale/2 reconstruction
    error (recall floor asserted in tests vs brute_force_topk).

    Scale shape: identical to lsh/brute force — queries broadcast
    (tiny), corpus one pass, per-batch numpy work, global top-k via
    TakeOrderedAndProject. Never N x N. Query sides larger than
    ``query_chunk`` stream through pq._chunked_search in bounded
    chunks (per-chunk broadcast destroyed between chunks), so the
    driver never holds the full query set."""
    import numpy as np

    sc = corpus.sparkSession.sparkContext

    # int8 codes + per-vector range, computed map-side (quantize_int8's
    # scheme, but keeping the code array for search instead of summaries)
    v = _to_double(F.col(vec_col))
    mn, mx = F.array_min(v), F.array_max(v)
    scale = (mx - mn) / F.lit(256.0)
    stats = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                F.struct(v.alias("v"), mn.alias("mn"), mx.alias("mx"), scale.alias("scale"))
            )
        ).alias("s"),
    ).select("id", "s.v", "s.mn", "s.mx", "s.scale")
    codes = F.transform(
        F.col("v"),
        lambda x: F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
            F.least(F.floor((x - F.col("mn")) / F.col("scale")), F.lit(255).cast("long")) - 128
        ),
    )
    coded = stats.select("id", "mn", "scale", F.explode(F.array(codes)).alias("codes"))

    def score_chunk(q_rows):
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
        # epsilon like the corpus side: a zero query vector must yield
        # 0.0 similarities, not NaN (NaN would make ranking
        # nondeterministic)
        qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
        bq = sc.broadcast((q_ids, qm))

        def topk_batches(it):
            import pandas as pd

            ids_b, qmat = bq.value
            for pdf in it:
                if len(pdf) == 0:
                    continue  # np.stack raises on an empty Arrow batch
                ids = pdf["id"].to_numpy()
                # float64 end-to-end since round 8: the dequantize
                # expression mn + (code + 128.5) * scale is then the
                # SAME IEEE-double arithmetic a SQL engine evaluates, so
                # a DuckDB oracle reconstructs bit-identical values (the
                # storage artifact is still int8 codes — compute
                # precision is a kernel detail, not a compression claim)
                codes_m = np.stack(pdf["codes"].to_numpy()).astype(np.float64)  # n x d
                mn_c = pdf["mn"].to_numpy().astype(np.float64)[:, None]
                scale_c = pdf["scale"].to_numpy().astype(np.float64)[:, None]
                recon = mn_c + (codes_m + 128.5) * scale_c  # dequantized
                norms = np.linalg.norm(recon, axis=1, keepdims=True)
                recon = recon / np.maximum(norms, 1e-30)
                sims = np.round(recon @ qmat.T, 6)  # n x n_queries
                out = {"query_id": [], "neighbor_id": [], "sim": []}
                for qi in range(qmat.shape[0]):
                    col = sims[:, qi]
                    mask = ids != ids_b[qi]
                    take = min(int(mask.sum()), 64)  # per-batch candidate cap
                    if take == 0:
                        continue
                    # truncate by the exact downstream rank order
                    # (rounded sim desc, id asc) so a boundary tie can't
                    # be evicted in-batch while winning the global
                    # tie-break (lexsort: last key is primary)
                    col_m, ids_m = col[mask], ids[mask]
                    idx = np.lexsort((ids_m, -col_m))[:take]
                    out["query_id"].extend([ids_b[qi]] * take)
                    out["neighbor_id"].extend(ids_m[idx].tolist())
                    out["sim"].extend(col_m[idx].tolist())
                yield pd.DataFrame(out)

        cand = coded.mapInPandas(
            topk_batches, schema="query_id long, neighbor_id long, sim double"
        )
        out = grouped_topk(cand, k, "sim", ascending=False).select(
            "query_id", "neighbor_id", "rnk", F.round("sim", 4).alias("sim")
        )
        return out, bq

    from .pq import _chunked_search

    return _chunked_search(
        queries, corpus, coded, score_chunk,
        "query_id long, neighbor_id long, rnk int, sim double",
        id_col, vec_col, query_chunk,
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from each query's top-``pool`` cosine shortlist, greedily
    pick ``k`` results maximizing
    lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s) —
    relevance traded against redundancy, the standard diversified-
    retrieval step after any ANN search (near-duplicate hits collapse
    to one representative).

    Scale shape: the shortlist comes from the mergeable partial top-k
    (brute_force_topk — the corpus-safe path), so the greedy kernel
    only ever sees ``pool`` rows per query: an applyInPandas group of
    BOUNDED size doing an O(pool^2 * k) numpy loop — per-query work is
    corpus-independent by construction. Selection is deterministic:
    scores round to 6 decimals, ties break on neighbor_id ascending.
    Output: (query_id, position, neighbor_id, mmr_score)."""
    short = brute_force_topk(queries, corpus, k=pool, id_col=id_col, vec_col=vec_col)
    withvec = short.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
        ),
        "neighbor_id",
    ).select("query_id", "neighbor_id", "sim", "n_vec")
    return mmr_select(withvec, k=k, lam=lam)


def mmr_select(withvec: DataFrame, k: int, lam: float) -> DataFrame:
    """The greedy MMR selector over an ALREADY-BUILT shortlist frame
    (query_id, neighbor_id, sim, n_vec) — exposed separately so other
    retrieval pools (e.g. the RRF-fused hybrid pool, with sim =
    normalized fusion score) can be diversified with the same
    deterministic kernel. Per-query group size is the caller's pool
    bound; work is O(pool^2 * k) numpy per group."""
    import numpy as np
    import pandas as pd

    # EXACT-INTEGER scoring (round 8): lam must be a multiple of 0.1.
    # Float scoring round(lam*sim - (1-lam)*red, 6) sat ON a half
    # boundary systematically — sims carry 4 decimals, so 0.7*sim has
    # at most 5 and 0.3*red lands the 6th-decimal half every time
    # red's 6th decimal is odd; np.round (half-even) and SQL round
    # (half-away) then disagree CONSTANTLY, not measure-zero. In
    # tenth-exact units nothing ever rounds: sims/pair-sims lift to
    # their exact integer grids (k=sim*1e4, m=red*1e6), the score is
    # the int64 100*(10*lam)*k - (10-10*lam)*m in 1e-7 units, and the
    # emitted double score_units/1e7 is the same IEEE value in every
    # engine (functions/rounding.py's integer-ratio discipline).
    lam_num = int(round(lam * 10))
    assert abs(lam - lam_num / 10) < 1e-12, f"lam must be a tenth, got {lam}"
    mu_num = 10 - lam_num

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["neighbor_id"]).reset_index(drop=True)
        vecs = np.array(pdf["n_vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        pair_i = np.rint(np.round(unit @ unit.T, 6) * 1e6).astype(np.int64)
        qsim_i = np.rint(pdf["sim"].to_numpy(dtype=np.float64) * 1e4).astype(
            np.int64
        )
        ids = pdf["neighbor_id"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        out_rows = []
        avail = np.ones(n, dtype=bool)
        for pos in range(min(k, n)):
            if selected:
                red_i = pair_i[:, selected].max(axis=1)
            else:
                red_i = np.zeros(n, dtype=np.int64)
            score_u = 100 * lam_num * qsim_i - mu_num * red_i  # 1e-7 units
            # min+1, NOT min: -INT64_MIN wraps to itself, which would
            # sort masked entries FIRST after the negation below
            score_m = np.where(avail, score_u, np.iinfo(np.int64).min + 1)
            best = int(
                np.lexsort((ids, -score_m))[0]
            )  # max score, ties -> min neighbor_id
            selected.append(best)
            avail[best] = False
            out_rows.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    pos + 1,
                    int(ids[best]),
                    float(score_u[best] / 1e7),
                )
            )
        return pd.DataFrame(
            out_rows, columns=["query_id", "position", "neighbor_id", "mmr_score"]
        )

    return (
        withvec.groupBy("query_id")
        .applyInPandas(
            greedy,
            "query_id long, position int, neighbor_id long, mmr_score double",
        )
        .orderBy("query_id", "position")
    )
