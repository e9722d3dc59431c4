"""J4b: pure interval join — match point rows to covering intervals with NO
equi key (SURVEY.md §2.3 J4).

The equi-keyed range join (J4: equi columns + range residual) is a plain
shuffle join for Catalyst — the range predicate rides as a post-join filter
on the equi-key match. The PURE form (`start <= ts < end` and nothing else)
is the one Spark has no good physical plan for: it falls back to
BroadcastNestedLoopJoin (or CartesianProduct), O(n x m) row visits — a
scale-killer the moment either side is large.

Spark mapping — GRID BUCKETING, the standard distributed interval-join
construction (what Databricks' range-join hints and every spatial 1-D grid
join do): pick a bucket width W; each point belongs to exactly ONE bucket
(``floor(ts / W)``); each interval EXPLODES to the buckets it overlaps; an
equi shuffle join on the bucket id meets every (point, interval) candidate
pair in exactly one task, and the exact predicate filters inside. No pair
dedup is needed: a candidate pair can only meet in the point's own bucket.
Cost is one shuffle + per-bucket products — bounded by grid granularity
instead of |left| x |right| — and interval replication is
``ceil(span / W) + 1`` rows, so W should be chosen near the typical
interval span (W much smaller than spans inflates replication; W much
larger inflates per-bucket candidates). Very long intervals are the skew
hazard: ``max_span_buckets`` fails fast with guidance instead of silently
exploding one interval into millions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "iv_start",
    end: str = "iv_end",
    bucket_width_s: float = 3600.0,
    extra_on: list[str] | None = None,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Inner-join ``points`` to every interval with ``start <= ts < end``
    (half-open, the standard validity-window convention), optionally ANDed
    with ``extra_on`` equi columns. Returns all point columns + all
    interval columns. Rows with null ``ts`` / null or inverted bounds never
    match (an unknown time is in no window). Exactly one output row per
    matching (point, interval) pair — the grid join introduces no
    duplicates by construction (a pair meets only in the point's bucket).

    For the equi-keyed case prefer a plain ``join`` with the range as a
    residual predicate (Catalyst handles it); this operator exists for the
    keyless shape, where the naive plan is BroadcastNestedLoopJoin.
    """
    if bucket_width_s <= 0:
        raise ValueError(f"interval_join: bucket_width_s must be > 0, got {bucket_width_s}")
    extra_on = list(extra_on or [])
    collide = (set(points.columns) & set(intervals.columns)) - set(extra_on)
    if collide:
        raise ValueError(
            f"interval_join: column collision {sorted(collide)}; rename first"
        )
    # the grid machinery owns __bkt/__span; an input already carrying them
    # would be silently overwritten by withColumn and then dropped (ADVICE r6)
    reserved = {"__bkt", "__span"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(
            f"interval_join: column(s) {sorted(reserved)} are reserved for "
            "the internal bucket grid; rename them first"
        )
    w_us = int(bucket_width_s * 1_000_000)
    if w_us < 1:
        raise ValueError(
            f"interval_join: bucket_width_s={bucket_width_s} is below 1 "
            "microsecond (timestamp resolution)"
        )

    p = points.withColumn(
        "__bkt", F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(w_us))
    )
    s_us = F.unix_micros(F.col(start).cast("timestamp"))
    # end is EXCLUSIVE: an interval ending exactly on a bucket boundary
    # does not cover that bucket — explode to floor((end - 1us) / W)
    e_us = F.unix_micros(F.col(end).cast("timestamp")) - F.lit(1)
    b0, b1 = F.floor(s_us / F.lit(w_us)), F.floor(e_us / F.lit(w_us))
    iv = intervals.where(
        F.col(start).isNotNull() & F.col(end).isNotNull() & (F.col(end) > F.col(start))
    )
    iv = iv.withColumn("__span", (b1 - b0 + 1))
    # fail fast on a grid-hostile interval instead of materializing it
    iv = iv.withColumn(
        "__bkt",
        F.explode(
            F.when(
                F.col("__span") <= F.lit(max_span_buckets), F.sequence(b0, b1)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "interval_join: an interval spans more than "
                            f"{max_span_buckets} buckets at bucket_width_s="
                            f"{bucket_width_s} — raise bucket_width_s (or "
                            "max_span_buckets) so replication stays bounded; "
                            "offending span buckets: "
                        ),
                        F.col("__span").cast("string"),
                    )
                ).cast("array<bigint>")
            )
        ),
    ).drop("__span")

    cond = (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    out = p.join(iv, ["__bkt"] + extra_on, "inner").where(cond).drop("__bkt")
    return out.select(*points.columns, *[c for c in intervals.columns if c not in extra_on])
