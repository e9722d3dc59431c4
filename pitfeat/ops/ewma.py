"""W11: exponentially-weighted moving average — a recursive temporal feature
(SURVEY.md §2.5 W11).

EWMA is the one common windowed feature Catalyst cannot express: the
recurrence ``y_i = (1-alpha) * y_{i-1} + alpha * x_i`` depends on its own
previous output, so no frame-based window function computes it, and the
closed form ``y_i = sum_j alpha (1-alpha)^(i-j) x_j`` — while fine as a
small-scale SQL oracle — is numerically unusable as an engine plan:
``(1-alpha)^-j`` overflows float64 after ~1000 steps at any realistic alpha,
so a cumsum reformulation cannot survive a long conversation.

Spark mapping — the same sorted-stream shape as the merge as-of strategy
(pitfeat/ops/asof.py:651): ``repartitionByRange(key)`` makes each key's rows
land in one partition, ``sortWithinPartitions(key, ts, *order_extra)`` makes
the partition stream key-contiguous and time-ordered, and ONE ``mapInPandas``
pass runs the recurrence per key run (pandas ``ewm(adjust=False)``,
C-vectorized) carrying each partition-boundary key's last state across Arrow
batches. State is evicted down to the single key that can span a batch
boundary, so worker memory is O(Arrow batch + 1 carried scalar) — independent
of key cardinality and key heat, the same bounded-memory story proven for the
merge kernel at 100M turns (BASELINE.md hot-key stress).

Null semantics: a null/NaN input yields a null output and leaves the state
untouched (the next valid row continues from the last valid EWMA). This is
the semantics with a clean point-in-time reading — an absent observation
neither perturbs the feature nor leaks anything — and the one with an exact
closed-form oracle over the non-null subsequence.

Determinism: callers must pass ``order_extra`` tie-break columns sufficient
to totally order rows within (key, ts); with a total order the output is
identical at any parallelism (the recurrence order is the sort order).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ewma_continue(xv: pd.Series, seed: float | None, alpha: float) -> np.ndarray:
    """adjust=False EWMA of ``xv`` continued from ``seed`` (a prior EWMA
    value) — prepending the seed and dropping it reproduces the recurrence
    ``y_1 = (1-a)*seed + a*x_1`` bit-for-bit (pinned by the batch-boundary
    test). Shared by the batch kernel and the streaming state op."""
    if seed is not None:
        return (
            pd.concat([pd.Series([seed]), xv], ignore_index=True)
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .iloc[1:]
            .to_numpy()
        )
    return xv.ewm(alpha=alpha, adjust=False).mean().to_numpy()


def ewma(
    df: DataFrame,
    col: str,
    alpha: float,
    key: str = "conv_id",
    ts: str = "ts",
    order_extra: tuple[str, ...] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` (default ``<col>_ewma``) = per-``key`` EWMA of
    ``col`` in (``ts``, ``*order_extra``) order, ``adjust=False`` recurrence
    seeded by each key's first valid value."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    if col not in df.columns:
        raise ValueError(f"ewma: no such column {col!r}")
    out_col = out_col or f"{col}_ewma"
    if out_col in df.columns:
        raise ValueError(f"ewma: output column {out_col!r} already exists")

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )
    out_names = [f.name for f in out_schema.fields]

    staged = df.repartitionByRange(F.col(key)).sortWithinPartitions(
        F.col(key).asc(),
        F.col(ts).asc(),
        *[F.col(c).asc() for c in order_extra],
    )

    def stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # key -> last valid EWMA value. The sorted stream is key-contiguous,
        # so only each batch's FINAL key can continue into the next batch:
        # state shrinks to one scalar at every batch boundary.
        state: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            x = pd.to_numeric(pdf[col], errors="coerce").astype(float)
            y = np.full(len(pdf), np.nan)
            for k, idx in pdf.groupby(key, sort=False).indices.items():
                xs = x.iloc[idx]
                valid = xs.notna().to_numpy()
                if not valid.any():
                    continue  # state (if any) persists untouched
                yv = _ewma_continue(xs[valid], state.get(k), alpha)
                y[idx[valid]] = yv
                state[k] = float(yv[-1])
            last_key = pdf[key].iloc[-1]
            state = {last_key: state[last_key]} if last_key in state else {}
            res = pdf.copy()
            res[out_col] = y
            yield res[out_names]

    return staged.mapInPandas(stream, schema=out_schema)
