"""Structured Streaming analogues of the batch operators (SURVEY.md §2.10).

The batch engine is the contract; these keep the design streaming-compatible:

- ``stream_sessionize``  — W9's gap-based sessions via ``session_window``
  (Spark's native gap-merge session operator) with a watermark bounding state.
- ``stream_dedup``       — W8 via ``dropDuplicatesWithinWatermark``.
- ``stream_rolling``     — W3/W4 analogue: watermarked sliding-window aggs.
- ``stream_asof_features`` — J1's streaming analogue: per-conv running
  latest-snapshot state via ``transformWithStateInPandas`` is the full design;
  here implemented with ``applyInPandasWithState``-free composition (union +
  stateless window inside a foreachBatch is the pragmatic production pattern),
  exposed as a micro-batch transformation usable under ``foreachBatch``.

All functions take/return DataFrames so they compose with ``readStream`` ->
``writeStream`` pipelines; tests drive them with file sources and the
``availableNow`` trigger (no always-on cluster needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-(conv, session) aggregates over gap-merged session windows.

    State is bounded by the watermark: sessions older than it are finalized
    and emitted; late rows beyond it are dropped (documented lateness bound).
    """
    return (
        df.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("session"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(
                F.when((F.col("tool").isNotNull()) & (F.col("tool") != ""), 1).otherwise(0)
            ).alias("tool_calls"),
        )
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "tool_calls",
        )
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str] = ("conv_id", "turn_idx"),
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """Stateful exact dedup on (conv_id, turn_idx) with watermark-bounded state."""
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(list(keys))


def stream_rolling(
    df: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
    key: str = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Sliding-window per-conv aggregates (W3/W4 streaming analogue)."""
    return (
        df.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.window(F.col(ts), window, slide).alias("w"))
        .agg(F.count("*").alias("n_turns"))
        .select(key, F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n_turns")
    )


def asof_features_microbatch(snapshots: DataFrame):
    """Returns a foreachBatch-compatible transformation: each micro-batch of
    transcript turns is as-of joined (window strategy, zero leakage) against
    the snapshot table. Production shape for 'enrich a turn stream with the
    latest preceding features' when snapshots live in a slowly-changing table.

        q = (turns_stream.writeStream
              .foreachBatch(lambda b, _: sink(asof(b)))...)
    """
    from pitfeat.ops.asof import asof_join

    def transform(batch_df: DataFrame) -> DataFrame:
        return asof_join(batch_df, snapshots)

    return transform
