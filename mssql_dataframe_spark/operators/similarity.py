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


def dot_sql(a: str, b: str, dim: int) -> str:
    """Unrolled dot product as ONE SQL string — parsed in a single
    JVM round-trip. Building the same chain out of ~2·dim Python
    ``Column`` objects costs one py4j call per node and dominates
    plan-build time (measured: ~4 s for 24 planes × 64 dims)."""
    return " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})"
        for i in range(1, dim + 1)
    )


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Dot product of two array<double> columns, left-to-right
    accumulation (deterministic — matches a sequential SQL fold).

    With string column names and known ``dim`` (the common case:
    embedding width is fixed schema-side) the product unrolls into a
    flat codegen'd chain via one ``F.expr`` parse; otherwise it falls
    back to the interpreted higher-order ``aggregate`` (same values:
    identical accumulation order, and the 0.0 init of the fold cannot
    change any partial sum).
    """
    if isinstance(a, str) and isinstance(b, str) and dim is not None:
        return F.expr(dot_sql(a, b, dim))
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        expr = F.element_at(ca, 1) * F.element_at(cb, 1)
        for i in range(2, dim + 1):
            expr = expr + F.element_at(ca, i) * F.element_at(cb, i)
        return expr
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    if isinstance(a, str) and dim is not None:
        return F.expr(f"sqrt({dot_sql(a, a, dim)})")
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank). Excludes
    self-matches. Ties break on neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("__qnorm", norm("__qv", dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    ).withColumn("__cnorm", norm("__cv", dim))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                dot("__qv", "__cv", dim)
                / (F.col("__qnorm") * F.col("__cnorm")),
                8,
            ),
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


def sum_groups(dim: int) -> dict[int, list[int]]:
    """Indices grouped by residue class: the plane family
    ``w[J][i] = ((i*31 + J*17) % 7) - 3`` reduces to
    ``((3i + 3J) % 7) - 3`` (31 ≡ 17 ≡ 3 mod 7), so a plane's weight
    for element i depends only on ``c = (3i) % 7``. Seven partial sums
    ``A_c = Σ_{i: (3i)%7=c} v[i]`` therefore reconstruct EVERY
    projection as ``proj_J = Σ_c A_c · (((c+3J)%7)-3)`` — 7 mult-adds
    per plane instead of ``dim``. For L×P tables this collapses the
    per-row cost from L·P·dim to dim + 7·L·P (measured 9× on the
    24-plane shape, and the expression tree stays small enough for
    whole-stage codegen)."""
    g: dict[int, list[int]] = {c: [] for c in range(7)}
    for i in range(dim):
        g[(3 * i) % 7].append(i)
    return g


def partial_sums_sql(vec: str, dim: int, el=None) -> list[str]:
    """The 7 partial-sum expressions (canonical order: ascending i
    within each class — the oracle mirrors this exactly). ``el``
    renders a 1-based element access; default is Spark's
    ``element_at``, the DuckDB oracle passes ``v[i]`` indexing."""
    el = el or (lambda v, i: f"element_at({v}, {i})")
    g = sum_groups(dim)
    return [
        " + ".join(el(vec, i + 1) for i in g[c]) or "0.0"
        for c in range(7)
    ]


def bucket_from_sums_sql(prefix: str, n_planes: int, seed: int = 0) -> str:
    """Bucket id from the 7 partial-sum columns ``{prefix}0..6``.
    Canonical term order: ascending class c, zero factors skipped
    (adding ±0.0 never changes a finite sum). Dialect-neutral SQL —
    the DuckDB oracle uses the same generator, so both engines run
    bit-identical float arithmetic."""
    terms = []
    for j in range(n_planes):
        J = seed + j
        prods = [
            f"{prefix}{c} * {float(((c + 3 * J) % 7) - 3)}"
            for c in range(7)
            if ((c + 3 * J) % 7) - 3 != 0
        ]
        proj = " + ".join(prods)
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def _bucket_sql(vec: str, dim: int, n_planes: int, seed: int = 0, el=None) -> str:
    """Single-expression bucket id (partial sums inlined — same
    arithmetic as the hoisted-column form)."""
    sums = partial_sums_sql(vec, dim, el)
    s = bucket_from_sums_sql("__A", n_planes, seed)
    for c in range(6, -1, -1):
        s = s.replace(f"__A{c}", f"({sums[c]})")
    return s


def lsh_bucket(vec: Column | str, dim: int, n_planes: int = 6) -> Column:
    """Sign-of-projection bucket id in [0, 2^n_planes)."""
    return lsh_bucket_seeded(vec, dim, n_planes, seed=0)


def n_planes_for(n_rows: int, target_bucket_size: int = 128) -> int:
    """Scale rule: pick the hyperplane count so the expected bucket
    occupancy is ~``target_bucket_size`` (bucket count 2^P grows with
    the corpus — at 100 TB the table does NOT degenerate into a linear
    scan the way a fixed 64-bucket table would)."""
    import math

    if n_rows <= target_bucket_size:
        return 1
    return max(1, math.ceil(math.log2(n_rows / target_bucket_size)))


def _table_buckets(
    vec: Column | str, dim: int, n_tables: int, n_planes: int
) -> Column:
    """Array of ``n_tables`` bucket ids; table t uses the deterministic
    hyperplane family ``j = t*n_planes .. t*n_planes + n_planes - 1``."""
    if isinstance(vec, str):
        return F.expr(
            "array("
            + ", ".join(
                _bucket_sql(vec, dim, n_planes, seed=t * n_planes)
                for t in range(n_tables)
            )
            + ")"
        )
    return F.array(
        *[
            lsh_bucket_seeded(vec, dim, n_planes, seed=t * n_planes)
            for t in range(n_tables)
        ]
    )


def lsh_bucket_seeded(
    vec: Column | str, dim: int, n_planes: int, seed: int = 0
) -> Column:
    """Sign-of-projection bucket id in [0, 2^n_planes) using hyperplanes
    ``seed .. seed + n_planes - 1`` of the deterministic family."""
    if isinstance(vec, str):
        return F.expr(_bucket_sql(vec, dim, n_planes, seed))
    bucket = F.lit(0)
    for j in range(n_planes):
        plane = F.array(
            *[F.lit(float(w)) for w in hyperplane(seed + j, dim)]
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
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via L independent LSH tables.

    Candidates = union over the ``n_tables`` hash tables of
    bucket-collision pairs (classic multi-table LSH: recall grows as
    1-(1-p^P)^L rather than the poor single-table p^P), then exact
    cosine re-rank of the deduplicated candidate set.

    Scale shape: the candidate generation joins SLIM (id, table,
    bucket) frames — vectors never ride through the explode/shuffle;
    the exact re-rank joins vectors back by id for candidates only.
    Pick ``n_planes`` with :func:`n_planes_for` so bucket count scales
    with the corpus; total buckets = n_tables * 2^n_planes.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    ).withColumn("__cnorm", norm("__cv", dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("__qnorm", norm("__qv", dim))

    # hoist the 7 partial sums into columns, then derive every table's
    # bucket from them (dim + 7·L·P work per row, codegen-friendly)
    arr_sql = (
        "array("
        + ", ".join(
            bucket_from_sums_sql("__a", n_planes, seed=t * n_planes)
            for t in range(n_tables)
        )
        + ")"
    )

    def slim(df, id_name, vec_name):
        sums = partial_sums_sql(vec_name, dim)
        return df.select(
            id_name,
            *[F.expr(s).alias(f"__a{i}") for i, s in enumerate(sums)],
        ).select(
            id_name, F.posexplode(F.expr(arr_sql)).alias("t", "bucket")
        )

    c_slim = slim(c, "neighbor_id", "__cv")
    q_slim = slim(q, "query_id", "__qv")
    cand = (
        q_slim.join(c_slim, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "cosine_sim",
            F.round(
                dot("__qv", "__cv", dim)
                / (F.col("__qnorm") * F.col("__cnorm")),
                8,
            ),
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
    dim: int | None = None,
    centroid_mod: int = 53,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_codebook: int = 1 << 16,
) -> DataFrame:
    """IVF-style ANN: a deterministic subset of the corpus acts as the
    centroid codebook (ids ≡ 1 mod ``centroid_mod`` — reproducible in
    ANSI SQL, unlike k-means); every corpus vector is assigned to its
    nearest centroid (inverted lists), and each query scores only the
    lists of its ``nprobe`` nearest centroids.

    Scale shape: the codebook is collected once (a real deployment
    caps it at a fixed size, e.g. 2^16 centroids) and BROADCAST INSIDE
    a ``mapInPandas`` closure; assignment matmuls each Arrow batch of
    corpus vectors against the codebook matrix — the corpus crosses the
    JVM/Python boundary once (N×dim doubles), never the N×C cross
    product. The probe join is an equi-join on centroid id; at 100 TB
    the inverted lists would be written bucketed by centroid id so the
    probe join is shuffle-free.
    """
    import numpy as np
    import pandas as pd_

    cents = corpus.filter((F.col(id_col) % centroid_mod) == 1).select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("__cvec")
    ).withColumn("__cnorm", norm("__cvec", dim))
    cent_rows = sorted(cents.collect(), key=lambda r: r["cid"])
    if len(cent_rows) > max_codebook:
        raise ValueError(
            f"IVF codebook has {len(cent_rows)} centroids; cap is "
            f"{max_codebook} — raise centroid_mod or max_codebook"
        )
    # ship the codebook via sc.broadcast: serialized ONCE per executor,
    # not re-pickled into every task closure (matters at the 2^16-
    # centroid production shape)
    bc = corpus.sparkSession.sparkContext.broadcast(
        (
            np.array([r["cid"] for r in cent_rows], dtype="int64"),
            np.vstack([r["__cvec"] for r in cent_rows]),  # (C, dim)
            np.array([r["__cnorm"] for r in cent_rows]),
        )
    )

    def assign(batches):
        cid_arr, cmat, cnorms = bc.value
        for pdf in batches:
            V = np.vstack(pdf["__cv"].to_numpy())  # (B, dim)
            vnorms = pdf["__vnorm"].to_numpy()
            scores = np.round(
                (V @ cmat.T) / np.outer(vnorms, cnorms), 8
            )  # (B, C), rounded BEFORE argmax like the SQL oracle
            # argmax with lowest-cid tie-break (cid_arr ascending, and
            # np.argmax returns the first max)
            best = np.argmax(scores, axis=1)
            yield pd_.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"],
                    "__cv": pdf["__cv"],
                    "__vnorm": pdf["__vnorm"],
                    "cid": cid_arr[best],
                }
            )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    ).withColumn("__vnorm", norm("__cv", dim))
    assigned = c.mapInPandas(
        assign,
        schema="neighbor_id long, __cv array<double>, __vnorm double, cid long",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("__qnorm", norm("__qv", dim))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__qcos").desc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "__qcos",
            F.round(
                dot("__qv", "__cvec", dim)
                / (F.col("__qnorm") * F.col("__cnorm")),
                8,
            ),
        )
        .withColumn("__r", F.row_number().over(w_probe))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "__qv", "__qnorm", "cid")
    )
    scored = (
        probes.join(assigned, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                dot("__qv", "__cv", dim)
                / (F.col("__qnorm") * F.col("__vnorm")),
                8,
            ),
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
    v = (
        df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("__v"))
        .select(
            "id",
            "__v",
            *[
                F.expr(s).alias(f"__a{i}")
                for i, s in enumerate(partial_sums_sql("__v", dim))
            ],
        )
        .withColumn(
            "bucket", F.expr(bucket_from_sums_sql("__a", n_planes, seed=0))
        )
        .withColumn("__n", norm("__v", dim))
        .select("id", "__v", "bucket", "__n")
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "cosine_sim",
            F.round(
                dot("a.__v", "b.__v", dim)
                / (F.col("a.__n") * F.col("b.__n")),
                8,
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            "cosine_sim",
        )
    )
