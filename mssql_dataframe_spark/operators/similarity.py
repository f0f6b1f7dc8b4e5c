"""Similarity search over embedding columns (``array<float>``).

Two paths (SURVEY-extension per the driver's north star):
- brute-force cosine top-k — the exact baseline: a join between the
  (small) query set and the corpus, dot products computed with
  built-in ``zip_with``/``aggregate`` expressions in DOUBLE
  (JVM-side, no Python), ranked per query with a window;
- LSH-bucketed ANN — the scale path: deterministic integer random
  hyperplanes hash each vector to a bucket; candidates are generated
  by an equi-join on the bucket id (one shuffle on small keys) and
  only candidates get exact scoring. At 100 TB the bucket join
  replaces the O(N·Q) cross product with O(sum of bucket sizes).

Determinism note: hyperplane coefficients are small integers derived
from ``(i*31 + j*17) % 7 - 3`` so the same buckets are computable in
ANSI SQL for the correctness oracle — no RNG, no platform drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, left-to-right
    accumulation (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank). Excludes
    self-matches. Ties break on neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 8),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplane(j: int, dim: int) -> list[int]:
    """Deterministic pseudo-random integer hyperplane #j."""
    return [((i * 31 + j * 17) % 7) - 3 for i in range(dim)]


def lsh_bucket(vec: Column, dim: int, n_planes: int = 6) -> Column:
    """Sign-of-projection bucket id in [0, 2^n_planes)."""
    bucket = F.lit(0)
    for j in range(n_planes):
        plane = F.array(
            *[F.lit(float(w)) for w in hyperplane(j, dim)]
        )
        proj = dot(vec, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    ).withColumn("bucket", lsh_bucket(F.col("__cv"), dim, n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("bucket", lsh_bucket(F.col("__qv"), dim, n_planes))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 8)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_mod: int = 53,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: a deterministic subset of the corpus acts as the
    centroid codebook (ids ≡ 1 mod ``centroid_mod`` — reproducible in
    ANSI SQL, unlike k-means); every corpus vector is assigned to its
    nearest centroid (inverted lists), and each query scores only the
    lists of its ``nprobe`` nearest centroids.

    Scale shape: the codebook is tiny and broadcast; assignment is a
    broadcast nested-loop scored with JVM expressions, one pass over
    the corpus; the probe join is an equi-join on centroid id. At 100 TB
    the inverted lists would be written bucketed by centroid id so the
    probe join is shuffle-free.
    """
    cents = corpus.filter((F.col(id_col) % centroid_mod) == 1).select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("__cvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("__ccos", F.round(cosine(F.col("__cv"), F.col("__cvec")), 8))
        .withColumn("__r", F.row_number().over(w_assign))
        .filter(F.col("__r") == 1)
        .select("neighbor_id", "__cv", "cid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__qcos").desc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__qcos", F.round(cosine(F.col("__qv"), F.col("__cvec")), 8))
        .withColumn("__r", F.row_number().over(w_probe))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "__qv", "cid")
    )
    scored = (
        probes.join(assigned, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 8))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact
    verification (id1 < id2, cosine >= threshold)."""
    v = df.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("__v")
    ).withColumn("bucket", lsh_bucket(F.col("__v"), dim, n_planes))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("a.__v"), F.col("b.__v")), 8),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            "cosine_sim",
        )
    )
