"""Windowed feature operators (SURVEY.md §2.5 W1-W10, §2.4 A7).

All pure Catalyst window expressions — JVM-side, whole-stage-codegen'd, zero
Python. Every window partitions by ``conv_id``, so all of these ops reuse ONE
shuffle: Spark plans consecutive windows over the same partitioning/ordering
as a single Exchange followed by stacked Window nodes (asserted by the
plan-shape tests). Deterministic because (conv_id, turn_idx) is a total order
per conversation.

Leakage discipline: every operator here looks only backward in turn order
except ``backfill`` (W6 bfill leg), which is leakage-unsafe by construction and
therefore gated behind ``allow_leakage=True`` and excluded from PIT feature
vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = "conv_id"
ORD = "turn_idx"
TS = "ts"


def _w(key: str = KEY, order: str = ORD) -> Window:
    return Window.partitionBy(key).orderBy(order)


def with_lags(
    df: DataFrame,
    cols: list[str],
    offsets: list[int] = (1,),
    leads: bool = False,
    key: str = KEY,
    order: str = ORD,
) -> DataFrame:
    """W1: lag (and optionally lead) copies of ``cols`` at each offset."""
    w = _w(key, order)
    out = df
    for c in cols:
        for k in offsets:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            if leads:
                out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return out


def with_gap(df: DataFrame, key: str = KEY, order: str = ORD, ts: str = TS) -> DataFrame:
    """W2: inter-turn gap in seconds (null on first turn of each conv)."""
    w = _w(key, order)
    return df.withColumn(
        "gap_s",
        (F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)),
    )


_ROLLFN = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev,
    "count": F.count,
}


def rolling(
    df: DataFrame,
    col: str,
    fns: list[str] = ("mean",),
    window: int = 5,
    key: str = KEY,
    order: str = ORD,
) -> DataFrame:
    """W3: row-frame rolling aggregates over the last ``window`` turns (incl. current)."""
    w = _w(key, order).rowsBetween(-(window - 1), 0)
    out = df
    for fn in fns:
        out = out.withColumn(f"{col}_roll{window}_{fn}", _ROLLFN[fn](col).over(w))
    return out


def rolling_time(
    df: DataFrame,
    col: str,
    fns: list[str] = ("mean",),
    range_s: int = 3600,
    key: str = KEY,
    ts: str = TS,
) -> DataFrame:
    """W4: time-range rolling aggregates over the trailing ``range_s`` seconds."""
    w = Window.partitionBy(key).orderBy(F.col(ts).cast("long")).rangeBetween(-range_s, 0)
    out = df
    for fn in fns:
        out = out.withColumn(f"{col}_last{range_s}s_{fn}", _ROLLFN[fn](col).over(w))
    return out


def cumulative_tool_calls(
    df: DataFrame, tool_col: str = "tool", key: str = KEY, order: str = ORD
) -> DataFrame:
    """W5: running count of tool calls within the conversation."""
    w = _w(key, order).rowsBetween(Window.unboundedPreceding, 0)
    is_tool = F.when(
        F.col(tool_col).isNotNull() & (F.col(tool_col) != ""), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("tool_calls_cum", F.sum(is_tool).over(w))


def forward_fill(
    df: DataFrame, cols: list[str], key: str = KEY, order: str = ORD
) -> DataFrame:
    """W6 ffill: carry last non-null observation forward within conv (PIT-safe)."""
    w = _w(key, order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return out


def backfill(
    df: DataFrame,
    cols: list[str],
    key: str = KEY,
    order: str = ORD,
    allow_leakage: bool = False,
) -> DataFrame:
    """W6 bfill: first following non-null. Reads the FUTURE — leakage-unsafe,
    never allowed into PIT feature vectors; gated explicitly."""
    if not allow_leakage:
        raise ValueError(
            "backfill() looks forward in time; pass allow_leakage=True to "
            "acknowledge it must not feed point-in-time features"
        )
    w = _w(key, order).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_bfill", F.first(c, ignorenulls=True).over(w))
    return out


def role_ngrams(
    df: DataFrame,
    n: int = 2,
    role_col: str = "role",
    key: str = KEY,
    order: str = ORD,
    count_window: int | None = None,
    vocab: list[str] | None = None,
) -> DataFrame:
    """W7: trailing role-transition n-gram per turn + optional rolling counts
    of each vocab transition (fixed vocab => fixed-width features)."""
    w = _w(key, order)
    parts = [F.lag(role_col, n - 1 - i).over(w) for i in range(n - 1)] + [F.col(role_col)]
    out = df.withColumn(f"role_{n}gram", F.concat_ws("->", *parts))
    # concat_ws skips nulls, so the first n-1 turns get short grams; null them
    # out for fixed semantics (a trailing n-gram needs n turns of history)
    out = out.withColumn(
        f"role_{n}gram",
        F.when(F.row_number().over(w) >= n, F.col(f"role_{n}gram")),
    )
    if count_window and vocab:
        cw = _w(key, order).rowsBetween(-(count_window - 1), 0)
        for g in vocab:
            safe = g.replace("->", "_to_")
            out = out.withColumn(
                f"ng_{safe}_cnt",
                F.sum(
                    F.when(F.col(f"role_{n}gram") == g, F.lit(1)).otherwise(F.lit(0))
                ).over(cw),
            )
    return out


def _det_tiebreak(df: DataFrame, exclude: tuple[str, ...]):
    """Deterministic last-resort sort key: xxhash64 over every remaining
    hashable column. Without it, row_number over a non-total order picks a
    winner by shuffle arrival order — different runs (or parallelism levels)
    keep different rows, breaking the cross-parallelism determinism checksum.
    Columns containing a map at ANY nesting depth are excluded — Spark's
    xxhash64 raises DATATYPE_MISMATCH.HASH_MAP_TYPE on nested maps too, not
    just top-level ones (same recursive rule as asof._orderable; duplicates
    differing ONLY in such a column resolve by the remaining keys)."""
    from pitfeat.ops.asof import _orderable

    cols = [
        f.name
        for f in df.schema.fields
        if f.name not in exclude and _orderable(f.dataType)
    ]
    return F.xxhash64(*[F.col(c) for c in cols]) if cols else F.lit(0)


def dedup_turns(df: DataFrame, key: str = KEY, order: str = ORD, ts: str = TS) -> DataFrame:
    """W8: enforce (conv_id, turn_idx) uniqueness — keep the earliest-ts row;
    equal-ts duplicates resolve by a content hash so the winner is the same
    at any parallelism."""
    w = Window.partitionBy(key, order).orderBy(
        F.col(ts).asc(), _det_tiebreak(df, (key, order, ts)).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    key: str = KEY,
    order: str = ORD,
    ts: str = TS,
) -> DataFrame:
    """W9: gap-based sessionization. New session when the inter-turn gap
    exceeds ``gap_s`` (or at the first turn); monotonic session number via
    running sum of the new-session indicator; id = conv_id#k."""
    w = _w(key, order)
    wc = _w(key, order).rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), F.lit(1)).otherwise(F.lit(0))
    out = df.withColumn("session_no", F.sum(is_new).over(wc))
    return out.withColumn(
        "session_id", F.concat_ws("#", F.col(key), F.col("session_no"))
    )


def session_summaries(
    df: DataFrame, key: str = KEY, ts: str = TS, tool_col: str = "tool"
) -> DataFrame:
    """A7: per-session aggregates (requires sessionize() first)."""
    is_tool = F.when(
        F.col(tool_col).isNotNull() & (F.col(tool_col) != ""), F.lit(1)
    ).otherwise(F.lit(0))
    return df.groupBy(key, "session_id").agg(
        F.count("*").alias("n_turns"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(F.col(ts).cast("double")) - F.min(F.col(ts).cast("double"))).alias(
            "duration_s"
        ),
        F.sum(is_tool).alias("tool_calls"),
    )


def prev_session_features(
    df: DataFrame,
    gap_s: int = 1800,
    key: str = KEY,
    order: str = ORD,
    ts: str = TS,
    tool_col: str = "tool",
) -> DataFrame:
    """J6 self as-of: attach the PREVIOUS session's summary to every turn.

    Composition of W9 + A7 + J1: sessionize, summarize per session, then a
    STRICT backward as-of join of the turns against session end times. Strict
    (``allow_exact=False``) is the leakage guard: the current session's own
    end time is >= every turn in it (== for the last turn), so the latest
    session end strictly before a turn's ts is always a *completed previous*
    session — a turn can never see its own session's summary.
    """
    from pitfeat.ops.asof import asof_join

    s = sessionize(df, gap_s, key, order, ts)
    summ = session_summaries(s, key, ts, tool_col).select(
        F.col(key),
        F.col("session_end").alias("prev_session_end"),
        F.col("n_turns").alias("prev_n_turns"),
        F.col("duration_s").alias("prev_duration_s"),
        F.col("tool_calls").alias("prev_tool_calls"),
    )
    return asof_join(
        df, summ, on=key, left_ts=ts, right_ts="prev_session_end", allow_exact=False
    )


def top_k_per_group(
    df: DataFrame, order_col: str, k: int, desc: bool = True, key: str = KEY
) -> DataFrame:
    """W10: k rows per group by order_col; ties resolve by a content hash so
    the selected k are identical at any parallelism."""
    o = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(key).orderBy(o, _det_tiebreak(df, (key, order_col)).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
