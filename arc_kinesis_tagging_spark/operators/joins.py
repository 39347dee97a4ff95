"""Join operators Spark lacks as single primitives: as-of and interval joins.

Both are built as compositions of shuffle-friendly DataFrame ops chosen
for 100 TB behavior:

- ``asof_join`` uses the union-then-window formulation: ONE shuffle on
  the join key (plus sort within partitions), no row explosion, no
  re-join. The naive alternative (equi-join on key with ``r.ts <= l.ts``
  then take max) explodes to |L|x|matching R| intermediate rows; the
  union form is linear and AQE-skew-splittable.
- ``interval_join`` buckets intervals over a fixed grid and turns a
  non-equi (theta) join into an equi join on bucket + residual predicate,
  avoiding the broadcast-nested-loop plan Spark would otherwise pick —
  BNL is quadratic and is the first thing to die at scale.

The reference's nearest analog is its external point lookup
(reference utility/tag.py:12-17): a per-record keyed fetch, i.e. an
index nested-loop join executed over HTTP. These operators are the
engine-internal generalizations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of,
    inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    Plan shape: union(left, right) -> single hash shuffle on ``on`` ->
    in-partition sort by (ts, side) -> running ``last(ignorenulls)``.
    ``right_tiebreak`` (a right column name) makes the winner among
    equal-timestamp right rows deterministic.
    """
    on = list(on)
    sort_keys = ["__asof_ts", "__asof_side"] + (
        ["__asof_tb"] if right_tiebreak else []
    )

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).cast("timestamp").alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *([F.col(right_tiebreak).alias("__asof_tb")] if right_tiebreak else []),
    )
    l = left.withColumn("__asof_ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__asof_side", F.lit(1)
    )

    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(*[F.col(k).asc_nulls_first() for k in sort_keys])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        unioned = unioned.withColumn(
            f"__r_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("__asof_side") == 1)
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"__r_{c}"))
    drop = ["__asof_ts", "__asof_side"] + [f"__r_{c}" for c in right_cols]
    if right_tiebreak:
        drop.append("__asof_tb")
    return out.drop(*drop)


def interval_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width_seconds: int = 86400,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Join points to intervals with ``start <= point < end`` (optionally
    also equal on ``extra_on``), via grid bucketing.

    Each interval is exploded to the grid buckets it covers; points map
    to exactly one bucket; the join becomes equi on (bucket, *extra_on)
    with the range predicate as residual. Pick ``bucket_width_seconds``
    near the median interval length so explosion stays O(1) per interval.
    """
    bw = F.lit(bucket_width_seconds)
    p = points.withColumn(
        "__bkt", F.floor(F.unix_timestamp(F.col(point_col)) / bw)
    )
    i = intervals.withColumn(
        "__bkts",
        F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / bw),
            F.floor(F.unix_timestamp(F.col(end_col)) / bw),
        ),
    ).withColumn("__bkt", F.explode("__bkts")).drop("__bkts")

    cond = (
        (p["__bkt"] == i["__bkt"])
        & (p[point_col] >= i[start_col])
        & (p[point_col] < i[end_col])
    )
    for c in extra_on:
        cond = cond & (p[c] == i[c])
    joined = p.join(i, cond, "inner").drop(i["__bkt"])
    for c in extra_on:
        joined = joined.drop(i[c])
    return joined.drop("__bkt")
