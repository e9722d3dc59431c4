"""Min-max normalization with degenerate-column pruning (SURVEY.md §2.4 A2-A4).

Reproduces the reference's semantics (BASELINE.json:6): one stats pass computes
per-feature min/max; every column whose max == min — including all-null columns,
where both stats are null — is "degenerate" and pruned before normalization;
survivors are scaled ``x' = (x - min) / (max - min)`` into [0, 1]. NaN inputs
pass through as NaN.

Spark mapping: the stats pass is a SINGLE ``agg`` job (Catalyst partial+final
hash aggregation — one shuffle of one row per partition); pruning is a
driver-side projection decision recorded in the lineage manifest; normalization
is pure column arithmetic (whole-stage codegen, no UDF).

Scale note: min/max are algebraic aggregates, so the map-side partial
aggregation reduces 10^12 rows to (num_partitions x 1) rows before the shuffle.
The collect() here is one row of 2F doubles — O(F), never O(rows).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MinMaxStats:
    mins: dict  # col -> float|None
    maxs: dict  # col -> float|None

    def degenerate(self) -> list[str]:
        out = []
        for c in self.mins:
            mn, mx = self.mins[c], self.maxs[c]
            if mn is None or mx is None or mn == mx:
                out.append(c)
            elif isinstance(mn, float) and math.isnan(mn) and math.isnan(mx):
                out.append(c)
        return out

    def survivors(self) -> list[str]:
        deg = set(self.degenerate())
        return [c for c in self.mins if c not in deg]

    def to_manifest(self) -> dict:
        return {
            "mins": self.mins,
            "maxs": self.maxs,
            "degenerate": self.degenerate(),
            "survivors": self.survivors(),
        }


def compute_minmax(df: DataFrame, cols: list[str]) -> MinMaxStats:
    """A2: global per-column min/max in ONE job. min/max ignore NULL and NaN
    (Spark semantics: NaN sorts greater than any value — exclude it explicitly
    so a single NaN doesn't become the max)."""
    aggs = []
    for c in cols:
        clean = F.when(~F.isnan(F.col(c)), F.col(c))
        aggs.append(F.min(clean).alias(f"__mn_{c}"))
        aggs.append(F.max(clean).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    return MinMaxStats(
        mins={c: row[f"__mn_{c}"] for c in cols},
        maxs={c: row[f"__mx_{c}"] for c in cols},
    )


def prune_degenerate(df: DataFrame, stats: MinMaxStats) -> tuple[DataFrame, list[str]]:
    """A3: drop degenerate feature columns; returns (df, surviving feature cols)."""
    deg = set(stats.degenerate())
    keep = [c for c in df.columns if c not in deg]
    return df.select(*keep), stats.survivors()


def normalize_minmax(df: DataFrame, stats: MinMaxStats, cols: list[str] | None = None) -> DataFrame:
    """A4: x' = (x - min) / (max - min) per surviving column; NaN passes through.

    Pure column expressions — stats are literals folded into the plan, so the
    whole transform stays inside one whole-stage-codegen'd Project.
    """
    cols = cols if cols is not None else stats.survivors()
    out = df
    for c in cols:
        mn, mx = stats.mins[c], stats.maxs[c]
        if mn is None or mx is None or mx == mn:
            raise ValueError(f"normalize_minmax: column {c!r} is degenerate; prune first")
        out = out.withColumn(c, (F.col(c) - F.lit(float(mn))) / F.lit(float(mx - mn)))
    return out
