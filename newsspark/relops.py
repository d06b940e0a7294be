"""Relational operators Spark lacks natively, built as compositions of
DataFrame ops (the SURVEY custom-operator rule: composition first, Pandas
UDF only when semantics demand it).

``asof_join`` — point-in-time join: each left row picks the LATEST right row
with ``right.ts <= left.ts`` for the same key (the market-data /
feature-store lookup).  Spark has no ASOF JOIN; the naive encoding
(``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + row_number) explodes to
O(|L|·|R|) pairs per key before pruning — a non-starter on skewed keys.
This implementation is the merge-based shape instead:

  1. union left and right rows, tagged ``_is_left`` (right sorts BEFORE
     left at equal ts — inclusive <= semantics, matching DuckDB ASOF);
  2. one window per key ordered by (ts, _is_left): ``last(_r_col,
     ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW carries the
     most recent right values forward;
  3. keep the left rows.

Cost: ONE hash shuffle on the key + a per-partition sort — the same plan
Spark uses for any window aggregate; no pair explosion, linear in |L|+|R|.
At 100 TB the key (user/instrument) is high-cardinality so partitions stay
balanced; a single hot key degrades to its sorted run, never to a cross
product.  The DuckDB oracle runs its NATIVE ASOF JOIN over the same inputs
(contract_sql.py "asof_join") — two different physical strategies, one
result, which is the strongest kind of twin.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("rval",),
    tolerance: Optional[Column] = None,
) -> DataFrame:
    """All ``left`` columns plus ``asof_ts`` and ``asof_<c>`` for each
    ``right_cols`` entry — NULL when no right row is at-or-before the left
    row's timestamp (or when it is older than ``tolerance``, an optional
    INTERVAL column/literal, pandas ``merge_asof``'s lookback bound).

    ``right`` must be unique per (key, ts) — pre-aggregate if not (the
    contract entry reduces with max() first); with duplicates the carried
    value would depend on sort-tie order.

    Raises ValueError when ``left`` already contains one of the internal /
    output names this join synthesizes (``_is_left``, ``_r_ts``, ``_asof``,
    ``asof_ts``, ``_r_<c>``/``asof_<c>``) — without the guard a collision
    surfaces as a confusing analysis error or a silently wrong selection.
    """
    reserved = {"_is_left", "_r_ts", "_asof", "asof_ts"}
    reserved |= {f"_r_{c}" for c in right_cols}
    reserved |= {f"asof_{c}" for c in right_cols}
    clash = sorted(reserved.intersection(left.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves column names {clash}; rename them on the "
            "left DataFrame before joining"
        )
    left_cols = left.columns
    marked_left = left.select(
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
        F.lit(1).alias("_is_left"),
    )
    marked_right = right.select(
        *[
            F.col(key) if c == key
            else F.col(ts_col) if c == ts_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts_col).alias("_r_ts"),
        F.lit(0).alias("_is_left"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the matched right ROW as ONE struct, never per-column
    # independent last(ignorenulls) carries: a right row with a NULL value
    # column must yield (its ts, NULL) — exactly what DuckDB's native ASOF
    # returns — not a Frankenstein pairing of the newest ts with an older
    # row's value.  The struct is non-null whenever a right row exists,
    # even when its fields are null, so one ignorenulls carry moves the
    # whole row atomically.
    r_struct = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col("_r_ts").alias("_ts"),
            *[F.col(f"_r_{c}").alias(c) for c in right_cols],
        ),
    )
    carried = marked_left.unionByName(marked_right).select(
        "*", F.last(r_struct, ignorenulls=True).over(w).alias("_asof")
    )
    out = carried.where(F.col("_is_left") == 1)
    asof_ts = F.col("_asof._ts")
    if tolerance is not None:
        stale = asof_ts < (F.col(ts_col) - tolerance)
        sel_ts = F.when(stale, F.lit(None)).otherwise(asof_ts)
        sel_cols = [
            F.when(stale, F.lit(None)).otherwise(F.col(f"_asof.{c}"))
            .alias(f"asof_{c}")
            for c in right_cols
        ]
    else:
        sel_ts = asof_ts
        sel_cols = [F.col(f"_asof.{c}").alias(f"asof_{c}")
                    for c in right_cols]
    return out.select(*left_cols, sel_ts.alias("asof_ts"), *sel_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lower: str = "1 HOUR",
    upper: str = "1 HOUR",
    bucket_seconds: int = 3600,
    right_cols: Sequence[str] = ("rval",),
) -> DataFrame:
    """Interval join: every (left, right) pair sharing ``key`` with
    ``right.ts`` in ``[left.ts - lower, left.ts + upper]`` (inclusive both
    ends) — the event-correlation / feature-window shape.

    Spark's native plan for a pure inequality join is a broadcast
    nested-loop or a per-key cross product — O(|L|·|R|) on hot keys.  This
    is the BANDED strategy instead (the same idea as Databricks' range-join
    optimization, built from public primitives): bucket time into
    ``bucket_seconds`` bins, explode each left row over the bins its window
    touches (``sequence`` — span/bucket + 1 rows, a CONSTANT fan-out),
    equi-join on (key, bin), then filter the exact predicate.  Each right
    row lives in exactly one bin, so no pair is produced twice.  Cost: one
    hash shuffle on a (key, bin) key that is FINER than key alone — hot
    keys spread across time bins, which is the skew win.

    Right columns arrive prefixed ``r_`` (``r_ts`` plus ``r_<c>``).
    Raises ValueError when ``left`` already carries one of the synthesized
    names (``_bin``, ``r_ts``, ``r_<c>``) — same guard as asof_join.
    """
    reserved = {"_bin", "r_ts"} | {f"r_{c}" for c in right_cols}
    clash = sorted(reserved.intersection(left.columns))
    if clash:
        raise ValueError(
            f"range_join reserves column names {clash}; rename them on the "
            "left DataFrame before joining"
        )
    lo_i = F.expr(f"INTERVAL {lower}")
    up_i = F.expr(f"INTERVAL {upper}")
    win_lo = F.col(ts_col) - lo_i
    win_up = F.col(ts_col) + up_i
    lb = F.floor(F.unix_timestamp(win_lo) / bucket_seconds)
    ub = F.floor(F.unix_timestamp(win_up) / bucket_seconds)
    l = left.withColumn("_bin", F.explode(F.sequence(lb, ub)))
    r = right.select(
        F.col(key),
        F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    ).withColumn(
        "_bin", F.floor(F.unix_timestamp("r_ts") / bucket_seconds)
    )
    return (
        l.join(r, [key, "_bin"])
        .where((F.col("r_ts") >= win_lo) & (F.col("r_ts") <= win_up))
        .drop("_bin")
    )
