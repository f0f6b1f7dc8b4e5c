"""Join operators Spark lacks natively: as-of join and banded range join.

Both are built from compositions of existing DataFrame ops (SURVEY's
custom-operator rule (a): composition before UDFs).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: Optional[list[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_time <= left_time`` for the same key (``on``).

    Implementation (scale-first): union the two sides tagged by origin,
    ONE window pass per key ordered by (time, origin) carrying the
    latest right row forward AS ONE STRUCT, then keep left rows.
    This is a single shuffle on the key — no per-row subquery, no
    broadcast of the big side, no skew beyond the key distribution.
    An equality tie (right_time == left_time) matches, mirroring
    ASOF JOIN semantics in DuckDB/kdb (>= match).

    The carried values are a single struct per right row — NEVER
    per-column ``last(ignorenulls)`` carries, which would splice
    columns from DIFFERENT right rows whenever a right value is NULL
    (the attached row must be one that actually exists in ``right``,
    and a genuinely-NULL right value must surface as NULL). Right
    rows that share (key, time) are tie-broken by the struct's own
    ordering so results are engine-deterministic.

    NULL semantics match SQL comparison rules: a right row with a
    NULL key or NULL time can never satisfy ``key = key AND
    right_time <= left_time`` (both comparisons are UNKNOWN), so such
    rows are dropped before the union — without the filter, NULLs
    sort FIRST under the ascending window order, making a NULL-timed
    right row the silent fallback match for every left row that
    precedes the key's first real right row (and NULL-keyed rows
    would match each other through partitionBy, which groups NULLs).
    Left rows with NULL key/time keep LEFT semantics: they surface
    with NULL attached values.
    """
    if right_values is None:
        right_values = [
            c for c in right.columns if c not in (on, right_time)
        ]
    if not right_values:
        return left
    right = right.where(
        F.col(on).isNotNull() & F.col(right_time).isNotNull()
    )
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            T.StructType([
                T.StructField(c, right.schema[c].dataType)
                for c in right_values
            ])
        ).alias("__rv"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in right_values]).alias("__rv"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (__is_left=0) sort before left rows at equal time, so a
    # tie is visible to the left row -> inclusive (<=) semantics; the
    # trailing __rv makes equal-(time,origin) right rows deterministic
    # (the largest struct wins on any engine)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(),
                 F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rv_last"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__rv_last")[c].alias(f"{c}{suffix}") for c in right_values],
    )
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side's hot keys are spread over
    ``n_salts`` sub-partitions by a deterministic row-hash salt, and the
    small side is replicated once per salt — the shuffle key becomes
    (key, salt) so no single reducer owns a whole hot key. Results are
    identical to a plain join (the oracle relies on this).

    AQE's skew-join split handles this automatically for sort-merge
    joins; the explicit form is for cluster setups where AQE is off or
    the skew is in an aggregation-feeding join it can't split.

    Only big-side-preserving join types are legal: the small side is
    replicated ``n_salts`` times, so ``right``/``full`` would emit
    every unmatched small-side row once PER SALT — silently breaking
    the identical-results contract. Those types raise instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti",
                   "semi", "anti", "cross"):
        raise ValueError(
            f"salted_join cannot preserve unmatched small-side rows "
            f"(how={how!r}): the replicated small side would emit "
            "each of them n_salts times — use a plain join for "
            "right/full semantics"
        )
    # the salt must spread DUPLICATE big-side rows of a hot key too
    # (identical projected rows are common in event data); a pure
    # row-content hash would send them all to one salt, re-creating
    # the skew. The per-partition row position decorrelates them while
    # staying deterministic under task retry; the salt never reaches
    # the output, so results are independent of its exact values.
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(),
                   *[F.col(c) for c in big.columns]),
        F.lit(n_salts),
    )
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    band_width: float,
) -> DataFrame:
    """Interval join ``right_lo <= left_value < right_hi`` without a
    cartesian product: right intervals are exploded into the fixed-width
    bands they cover, the join is an equi-join on the band id, and the
    exact predicate filters afterwards.

    At scale this turns BroadcastNestedLoopJoin into a shuffled
    hash/sort-merge join keyed by band — the standard banded range-join
    technique.

    Right-side columns whose names collide with left columns are
    suffixed ``_r`` (the interval_overlap_join convention) so the
    post-join filter is never ambiguous; ``right_lo``/``right_hi``
    refer to the RIGHT frame's original names either way.
    """
    renames = {
        c: (f"{c}_r" if c in set(left.columns) else c)
        for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(renames[c]) for c in right.columns]
    )
    lo, hi = renames[right_lo], renames[right_hi]
    band = F.lit(band_width)
    # the interval is half-open (lo <= v < hi), but the band range must
    # stay CLOSED at floor(hi/band): subtracting an epsilon before the
    # floor silently drops true matches whenever hi sits within the
    # epsilon above a band boundary (values just below hi live in the
    # band the epsilon excluded). The at-most-one surplus band when hi
    # is an exact multiple joins no rows past the exact post-filter,
    # and each left row lives in exactly one band, so no dedup appears.
    r_banded = r.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / band),
                F.floor(F.col(hi) / band),
            )
        ),
    )
    l_banded = left.withColumn("__band", F.floor(F.col(left_value) / band))
    return (
        l_banded.join(r_banded, "__band")
        .filter(
            (F.col(left_value) >= F.col(lo))
            & (F.col(left_value) < F.col(hi))
        )
        .drop("__band")
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_time: str,
    valid_from: str = "_valid_from",
    valid_to: str = "_valid_to",
    dim_values: Optional[list[str]] = None,
    suffix: str = "_pit",
) -> DataFrame:
    """Point-in-time join against a type-2 dimension: every fact row
    attaches the dimension version valid AT ITS OWN timestamp —
    ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)`` — the
    as-reported view that makes backtests and training-data builds
    leakage-free (joining the CURRENT version would leak the future).
    LEFT semantics: a fact with no valid version at its timestamp
    (key absent, or fact_ts before the key's first valid_from)
    carries NULL dimension values rather than silently vanishing from
    the training set.

    Scale shape: one equi-join shuffle on the business key; the
    interval containment is a post-join filter that keeps at most ONE
    version per fact because SCD2 intervals partition the timeline per
    key (merge_scd2 closes the prior version at exactly the new
    version's valid_from). Pre-filter fan-out is bounded by a key's
    history length, never the table size; at 100 TB both sides shuffle
    once on the same key, or not at all if written bucketed by it.
    """
    dim_values = dim_values or [
        c for c in dim.columns
        if c not in set(on) | {valid_from, valid_to, "_is_current"}
    ]
    f, d = facts.alias("__f"), dim.alias("__d")
    t = F.col(f"__f.{fact_time}")
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(f"__f.{c}") == F.col(f"__d.{c}"))
    cond = (
        cond
        & (F.col(f"__d.{valid_from}") <= t)
        & (F.col(f"__d.{valid_to}").isNull()
           | (t < F.col(f"__d.{valid_to}")))
    )
    taken = set(facts.columns)
    out_cols = [F.col(f"__f.{c}") for c in facts.columns]
    for c in dim_values:
        name = c if c not in taken else f"{c}{suffix}"
        out_cols.append(F.col(f"__d.{c}").alias(name))
    return f.join(d, cond, "left").select(*out_cols)


def resample_forward_fill(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an irregular event stream onto a daily grid with
    forward fill — the gap-fill/resample operator time-series stores
    ship natively and Spark lacks: each key gets one row per calendar
    day spanning ITS OWN event range, carrying the latest value at or
    before that day's start (leading gap = NULL until the first
    event).

    Built on :func:`asof_join`, so the cost model is the same: one
    shuffle on the key for the grid aggregation and one for the as-of
    window pass — no per-grid-point subquery, no interval cross join.
    Equal-timestamp events are pre-collapsed with ``max`` so the fill
    is deterministic on any engine. Grid size = Σ per-key day spans,
    independent of event density (dense keys don't inflate it, sparse
    keys don't miss days).
    """
    day = F.date_trunc("DAY", F.col(time_col))
    grid = (
        events.groupBy(key_col)
        .agg(
            F.min(day).alias("__d0"),
            F.max(day).alias("__d1"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("__d0"), F.col("__d1"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("grid_ts"),
        )
    )
    dedup = events.groupBy(key_col, time_col).agg(
        F.max(value_col).alias(value_col)
    )
    return asof_join(
        grid, dedup, on=key_col,
        left_time="grid_ts", right_time=time_col,
        right_values=[value_col], suffix="_filled",
    ).select(key_col, "grid_ts", f"{value_col}_filled")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    band_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    min_overlap_us: int = 0,
) -> DataFrame:
    """Interval-overlap self/two-table join: pairs whose
    ``[start, end]`` ranges intersect, banded by an equi-key.

    The naive formulation is a pure theta-join (O(L*R) nested loop at
    any scale). The scalable shape joins on ``band_col`` FIRST — a
    coarse time bucket (day/hour) or tenant key that both sides carry
    — so Spark plans a hash equi-join and the overlap predicates
    become cheap post-join filters; cost is sum of band-pair sizes,
    never the cross product. Intervals that span bands must be
    exploded onto each band they touch and the output de-duplicated
    (same contract as the banded range join above).

    Emits every left x right pair in the same band with
    ``overlap_us = least(ends) - greatest(starts)`` (microseconds,
    exact integer arithmetic in any engine) ``>= min_overlap_us``.
    Column names on the right side get an ``_r`` suffix.
    """
    r = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    )
    cond = (
        (F.col(band_col) == F.col(f"{band_col}_r"))
        & (F.col(start_col) <= F.col(f"{end_col}_r"))
        & (F.col(f"{start_col}_r") <= F.col(end_col))
    )
    overlap = F.unix_micros(
        F.least(F.col(end_col), F.col(f"{end_col}_r"))
    ) - F.unix_micros(F.greatest(F.col(start_col), F.col(f"{start_col}_r")))
    return (
        left.join(r, cond)
        .withColumn("overlap_us", overlap)
        .filter(F.col("overlap_us") >= F.lit(min_overlap_us))
    )
