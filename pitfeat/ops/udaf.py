"""Vectorized pandas UDAFs (SURVEY.md §2.4 A8 / §2.11).

Per-group statistics that built-in aggregates can't express go through
``pandas_udf`` GROUPED_AGG: Arrow ships each group's column as one pandas
Series to Python and the kernel is a single numpy reduction — never a per-row
Python loop. Tradeoff vs built-ins (documented): an opaque UDAF gets no
map-side partial aggregation, so the group's values all travel the shuffle.
Prefer built-ins when they exist (A8's percentile uses the builtin); use
these only for genuinely custom statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def grouped_rms():
    """Root-mean-square UDAF: sqrt(mean(x^2)) per group, NaN-ignoring."""

    def rms(v):
        a = v.to_numpy(dtype=float)
        a = a[~np.isnan(a)]
        if len(a) == 0:
            return float("nan")
        return float(np.sqrt(np.mean(np.square(a))))

    # this module could use postponed annotations someday; set hints
    # explicitly so pandas_udf's inspection never breaks
    rms.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(rms, "double")


def grouped_gap_iqr():
    """Interquartile range UDAF — the 'arbitrary vectorized per-group stats'
    example from SURVEY §2.4 (gap percentiles)."""

    def iqr(v):
        a = v.to_numpy(dtype=float)
        a = a[~np.isnan(a)]
        if len(a) == 0:
            return float("nan")
        q75, q25 = np.percentile(a, [75.0, 25.0])
        return float(q75 - q25)

    iqr.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(iqr, "double")
