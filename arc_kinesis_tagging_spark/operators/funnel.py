"""Ordered funnel analysis over an event stream, generalized to k
stages.

Semantics: for each user, stage 0's timestamp is the earliest stage-0
event; stage i's timestamp is the earliest stage-i event STRICTLY
after the user's stage-(i-1) timestamp. A user appears in the output
iff they completed stage 0; ``stage_reached`` counts completed stages.

Plan shape (the reason this is not a per-user sort window): each stage
is one conditional min-aggregate — filter to the stage's event type,
join to the previous stage's (user, ts) aggregate, keep strictly-later
events, groupBy-min. Every stage SHRINKS the data to one row per
qualifying user before the next join, all shuffles are on ``user_col``
(AQE co-partitions them), and a user with millions of events costs a
partial aggregate, not a sort buffer. k stages = k aggregates + k-1
inner joins + k-1 left joins for assembly, each over per-user rows.

Mirrors the event-sequence semantics a funnel over the reference's
Kinesis stream would need (reference app.py consumes ordered per-shard
records; here order is recovered from the timestamp column, so late /
out-of-order arrival within a shard does not change the result).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    out_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(user, ts per stage, stage_reached) for the ordered ``stages``
    chain. ``out_cols`` overrides the per-stage output column names
    (default ``s{i}_{stage}_ts`` — positional, so repeated stage names
    like view -> click -> view are expressible)."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    if out_cols is None:
        out_cols = [f"s{i}_{s}_ts" for i, s in enumerate(stages)]
    if len(out_cols) != len(stages):
        raise ValueError("out_cols must match stages 1:1")

    def stage_events(name: str) -> DataFrame:
        return events.filter(F.col(event_col) == name).select(
            user_col, F.col(ts_col).alias("__ts")
        )

    aggs: list[DataFrame] = []
    for i, (name, col) in enumerate(zip(stages, out_cols)):
        e = stage_events(name)
        if i == 0:
            agg = e.groupBy(user_col).agg(F.min("__ts").alias(col))
        else:
            prev_col = out_cols[i - 1]
            agg = (
                e.join(aggs[-1].select(user_col, prev_col), user_col)
                .filter(F.col("__ts") > F.col(prev_col))
                .groupBy(user_col)
                .agg(F.min("__ts").alias(col))
            )
        aggs.append(agg)

    out = aggs[0]
    for agg in aggs[1:]:
        out = out.join(agg, user_col, "left")
    reached = F.lit(1)
    for col in out_cols[1:]:
        reached = reached + F.when(F.col(col).isNotNull(), 1).otherwise(0)
    return out.select(user_col, *out_cols, reached.cast("int").alias("stage_reached"))


def funnel_model(rows, stages):
    """Driver-side reference model for property tests: per user, scan
    their time-sorted events once and greedily take the earliest event
    of each stage after the previous stage's time. rows = iterable of
    (user, event_type, ts)."""
    by_user: dict = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        times, last = [], None
        for want in stages:
            nxt = min(
                (ts for ts, et in evs if et == want and (last is None or ts > last)),
                default=None,
            )
            times.append(nxt)
            if nxt is None:
                break
            last = nxt
        if times[0] is None:
            continue
        times += [None] * (len(stages) - len(times))
        out[u] = (tuple(times), sum(1 for t in times if t is not None))
    return out
