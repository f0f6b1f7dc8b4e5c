"""Incremental materialized-view maintenance from a CDC frame.

Beyond the reference surface (it has no history or views at all; its
MERGE at mssql_dataframe/core/write/merge.py:14-248 is the mutation
primitive this builds on). The warehouse pattern: instead of
recomputing ``SELECT key, count(*), sum(x) GROUP BY key`` over the full
fact table after every load, convert the load's change feed
(``read.table_changes``) into per-key aggregate DELTAS and apply them
to the stored aggregate with one join — cost proportional to the
CHANGED keys, not the table. At 100 TB fact scale with a
few-million-row daily load, that's the difference between a full-table
shuffle and a broadcast-sized merge.

Correct for the distributive aggregates (count, sum — and avg as
sum/count); min/max are NOT maintainable from deltas alone (a deleted
row that held the min needs a rescan) and are deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_delta(
    changes: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Per-key aggregate deltas from a ``table_changes`` frame.

    ``sum_cols`` maps each maintained sum's OUTPUT column to the fact
    column it sums (``{"sum_price": "o_totalprice"}`` reads the CDC
    frame's ``old_o_totalprice``/``new_o_totalprice`` pair).

    An update is modeled as delete(old row) + insert(new row), so a
    row whose GROUP KEY changed contributes -1/-old to its old group
    and +1/+new to its new one; a same-group update nets count 0 and
    sum (new - old). Group keys may be the table's match columns
    (unprefixed in the CDC frame) or tracked attributes (prefixed).

    One union + one hash aggregate over the change feed — map-side
    combinable, and the change feed is small by construction.
    """
    ct = F.col("change_type")

    def side(prefix: str) -> DataFrame:
        sign = 1 if prefix == "new" else -1
        part = changes.filter(
            ct != ("insert" if prefix == "old" else "delete")
        )
        cols = []
        for k in keys:
            src = f"{prefix}_{k}" if f"{prefix}_{k}" in changes.columns else k
            cols.append(F.col(src).alias(k))
        cols.append(F.lit(sign).alias("__cnt"))
        for out_name, src_col in sum_cols.items():
            # zero literal in the fact column's own type: with DECIMAL
            # fact columns the delta arithmetic stays exact (bit-equal
            # to a full recompute); DOUBLE facts would be subject to
            # summation-order drift — prefer decimal-cast facts.
            src = f"{prefix}_{src_col}"
            zero = F.lit(0).cast(changes.schema[src].dataType)
            val = F.coalesce(F.col(src), zero)
            cols.append((val if sign == 1 else -val).alias(f"__v_{out_name}"))
        return part.select(*cols)

    contrib = side("old").unionByName(side("new"))
    aggs = [F.sum("__cnt").cast("bigint").alias(f"d_{count_col}")]
    for out_name in sum_cols:
        aggs.append(F.sum(f"__v_{out_name}").alias(f"d_{out_name}"))
    return contrib.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Apply ``agg_delta`` output to the stored aggregate.

    A full-outer join would be the obvious shape, but Spark cannot
    broadcast a full-outer join — both sides would shuffle, i.e. the
    WHOLE MV repartitions for a handful of changed keys. Instead:

    - existing keys: ``mv LEFT JOIN broadcast(delta)`` — the MV side
      never moves; rows whose maintained count reaches 0 drop out;
    - brand-new keys: ``delta ANTI JOIN mv[keys]`` — the anti join
      shuffles only the delta and the MV's KEY COLUMNS (a narrow
      projection the scan prunes to), not the MV's payload;
    - union the two.

    Cost at 100 TB: one broadcast of the (small) delta + one shuffle
    of (delta + key-projection); the wide MV is scanned once in place.
    """
    # the delta plan feeds BOTH the left join and the anti join below;
    # a small frame by construction, so pin it rather than re-running
    # the CDC union + hash aggregate twice
    delta = delta.localCheckpoint(eager=True)
    d = delta.select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        f"d_{count_col}",
        *[F.col(f"d_{c}") for c in sum_cols],
    )
    cond = None
    for k in keys:
        # NULL-SAFE key equality: a nullable group key's NULL group is
        # a real group in the MV; plain == would silently drop its
        # deletes (stale count forever) and duplicate it on inserts
        c = mv[k].eqNullSafe(d[f"__d_{k}"])
        cond = c if cond is None else (cond & c)
    j = mv.join(F.broadcast(d), cond, "left")
    new_count = F.coalesce(mv[count_col], F.lit(0)) + F.coalesce(
        d[f"d_{count_col}"], F.lit(0)
    )
    out_cols = [mv[k] for k in keys] + [
        new_count.cast("bigint").alias(count_col)
    ]
    mv_types = {c: mv.schema[c].dataType for c in sum_cols}
    for c in sum_cols:
        zero_mv = F.lit(0).cast(mv_types[c])
        zero_d = F.lit(0).cast(delta.schema[f"d_{c}"].dataType)
        out_cols.append(
            (F.coalesce(mv[c], zero_mv) + F.coalesce(d[f"d_{c}"], zero_d))
            .cast(mv_types[c])
            .alias(c)
        )
    existing = j.select(*out_cols).filter(F.col(count_col) > 0)
    mvk = mv.select(*[F.col(k).alias(f"__m_{k}") for k in keys])
    anti_cond = None
    for k in keys:
        # same null-safe semantics as above: a delta to an EXISTING
        # NULL-key group must not be classified as a fresh group
        c = delta[k].eqNullSafe(mvk[f"__m_{k}"])
        anti_cond = c if anti_cond is None else (anti_cond & c)
    fresh = (
        delta.join(mvk, anti_cond, "left_anti")
        .select(
            *keys,
            F.col(f"d_{count_col}").cast("bigint").alias(count_col),
            *[
                F.col(f"d_{c}").cast(mv_types[c]).alias(c)
                for c in sum_cols
            ],
        )
        .filter(F.col(count_col) > 0)
    )
    return existing.unionByName(fresh)
