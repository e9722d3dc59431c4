"""W11 EWMA: recurrence vs pandas oracle, Arrow-batch-boundary state carry,
parallelism invariance, null semantics (SURVEY.md §2.5 W11)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pitfeat.ops.ewma import ewma

ALPHA = 0.3


def _oracle(pdf: pd.DataFrame, alpha: float) -> pd.Series:
    """Per-key adjust=False recurrence over the non-null subsequence; null
    inputs yield null and leave state untouched."""
    out = pd.Series(np.nan, index=pdf.index)
    for _, g in pdf.sort_values(["k", "ts", "i"]).groupby("k", sort=False):
        valid = g["x"].notna()
        out.loc[g.index[valid]] = (
            g.loc[valid, "x"].ewm(alpha=alpha, adjust=False).mean()
        )
    return out


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "k": rng.choice(list("abcde"), n),
            "ts": rng.integers(0, 50, n),
            "i": np.arange(n),  # tie-break: (k, ts) collides on purpose
            "x": rng.normal(size=n),
        }
    )
    pdf.loc[rng.choice(n, 60, replace=False), "x"] = np.nan
    return pdf


def test_matches_pandas_oracle(spark, frame):
    df = spark.createDataFrame(frame)
    got = (
        ewma(df, "x", ALPHA, key="k", ts="ts", order_extra=("i",))
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    want = _oracle(frame, ALPHA).sort_index().reset_index(drop=True)
    np.testing.assert_allclose(got["x_ewma"], want, equal_nan=True)


def test_batch_boundary_carry(spark, frame):
    """Tiny Arrow batches force the carried-state path on every key; result
    must be bit-identical to the one-batch run."""
    df = spark.createDataFrame(frame)
    big = (
        ewma(df, "x", ALPHA, key="k", ts="ts", order_extra=("i",))
        .toPandas()
        .sort_values("i")["x_ewma"]
        .to_numpy()
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = (
            ewma(df, "x", ALPHA, key="k", ts="ts", order_extra=("i",))
            .toPandas()
            .sort_values("i")["x_ewma"]
            .to_numpy()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    nan = np.isnan(big)
    assert (np.isnan(small) == nan).all()
    assert (small[~nan] == big[~nan]).all()  # bit-exact, not just close


def test_parallelism_invariance(spark, frame):
    df = spark.createDataFrame(frame)
    a = (
        ewma(df.repartition(13), "x", ALPHA, key="k", ts="ts", order_extra=("i",))
        .toPandas()
        .sort_values("i")["x_ewma"]
        .to_numpy()
    )
    b = (
        ewma(df.coalesce(1), "x", ALPHA, key="k", ts="ts", order_extra=("i",))
        .toPandas()
        .sort_values("i")["x_ewma"]
        .to_numpy()
    )
    nan = np.isnan(a)
    assert (np.isnan(b) == nan).all()
    assert (a[~nan] == b[~nan]).all()


def test_all_null_key_and_seed_survival(spark):
    """A key whose later rows are all null keeps emitting null without
    disturbing the carried state of the surrounding stream."""
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "ts": [0, 1, 2, 0],
            "i": [0, 1, 2, 3],
            "x": [2.0, np.nan, np.nan, 5.0],
        }
    )
    out = (
        ewma(spark.createDataFrame(pdf), "x", 0.5, key="k", ts="ts", order_extra=("i",))
        .toPandas()
        .sort_values("i")["x_ewma"]
        .tolist()
    )
    assert out[0] == 2.0
    assert np.isnan(out[1]) and np.isnan(out[2])
    assert out[3] == 5.0


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["a"], "ts": [0], "x": [1.0]}))
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "x", 0.0, key="k", ts="ts")
    with pytest.raises(ValueError, match="no such column"):
        ewma(df, "nope", 0.5, key="k", ts="ts")
    with pytest.raises(ValueError, match="already exists"):
        ewma(df, "x", 0.5, key="k", ts="ts", out_col="ts")
