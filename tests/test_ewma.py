"""W11 EWMA: recurrence vs pandas oracle, Arrow-batch-boundary state carry,
parallelism invariance, null semantics (SURVEY.md §2.5 W11); W12 event-time
EWMA (r6): bitwise pandas ewm(halflife, times) parity incl. the scalar
continuation kernel."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pitfeat.ops.ewma import ewma, ewma_time

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


# ---------- W12: event-time (irregular-spacing) EWMA (r6) ----------

HL_S = 120.0


def _time_oracle(pdf: pd.DataFrame, hl_s: float) -> pd.Series:
    """Per-key pandas ewm(halflife=Timedelta, times=...) over the valid
    (non-null value AND non-null ts) subsequence; inert rows stay null."""
    out = pd.Series(np.nan, index=pdf.index)
    for _, g in pdf.sort_values(["k", "ts", "i"]).groupby("k", sort=False):
        gv = g[g["x"].notna() & g["ts"].notna()]
        if len(gv) == 0:
            continue
        out.loc[gv.index] = (
            gv["x"]
            .reset_index(drop=True)
            .ewm(
                halflife=pd.Timedelta(seconds=hl_s),
                times=gv["ts"].values.astype("datetime64[ns]"),
                adjust=True,
            )
            .mean()
            .to_numpy()
        )
    return out


@pytest.fixture(scope="module")
def time_frame():
    rng = np.random.default_rng(17)
    n = 400
    base = pd.Timestamp("2026-03-01")
    # irregular gaps incl. zero (duplicate timestamps — order_extra decides)
    # and multi-halflife jumps (near-total forgetting)
    gaps = rng.choice([0, 1, 30, 90, 600, 3600], size=n).astype("int64")
    pdf = pd.DataFrame(
        {
            "k": rng.choice(list("abcde"), n),
            "i": np.arange(n),
            "x": rng.normal(50, 20, n),
        }
    )
    pdf["ts"] = [base + pd.Timedelta(seconds=int(s)) for s in np.cumsum(gaps) % 86400]
    pdf.loc[rng.choice(n, 40, replace=False), "x"] = np.nan
    pdf.loc[rng.choice(n, 10, replace=False), "ts"] = pd.NaT
    # constant stretch: hits pandas' equal-value short-circuit branch
    pdf.loc[100:120, "x"] = 42.0
    return pdf


def test_time_matches_pandas_bitwise(spark, time_frame):
    got = (
        ewma_time(
            spark.createDataFrame(time_frame), "x", HL_S,
            key="k", ts="ts", order_extra=("i",),
        )
        .toPandas()
        .sort_values("i")["x_ewma"]
        .to_numpy()
    )
    want = _time_oracle(time_frame, HL_S).sort_index().to_numpy()
    nan = np.isnan(want)
    assert (np.isnan(got) == nan).all()
    assert (got[~nan] == want[~nan]).all()  # bit-exact, not allclose


def test_time_batch_boundary_carry_bitwise(spark, time_frame):
    """Tiny Arrow batches force the scalar continuation kernel on every
    key; it must be bit-identical to the vectorized one-batch path."""
    df = spark.createDataFrame(time_frame)
    big = (
        ewma_time(df, "x", HL_S, key="k", ts="ts", order_extra=("i",))
        .toPandas().sort_values("i")["x_ewma"].to_numpy()
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = (
            ewma_time(df, "x", HL_S, key="k", ts="ts", order_extra=("i",))
            .toPandas().sort_values("i")["x_ewma"].to_numpy()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    nan = np.isnan(big)
    assert (np.isnan(small) == nan).all()
    assert (small[~nan] == big[~nan]).all()


def test_time_parallelism_invariance(spark, time_frame):
    df = spark.createDataFrame(time_frame)
    a = (
        ewma_time(df.repartition(13), "x", HL_S, key="k", ts="ts", order_extra=("i",))
        .toPandas().sort_values("i")["x_ewma"].to_numpy()
    )
    b = (
        ewma_time(df.coalesce(1), "x", HL_S, key="k", ts="ts", order_extra=("i",))
        .toPandas().sort_values("i")["x_ewma"].to_numpy()
    )
    nan = np.isnan(a)
    assert (np.isnan(b) == nan).all()
    assert (a[~nan] == b[~nan]).all()


def test_time_decay_semantics(spark):
    """A huge gap nearly forgets the past; a zero gap weights old and new
    nearly equally; inert rows (null x / null ts) leave state untouched."""
    base = pd.Timestamp("2026-03-01")
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 5,
            "i": range(5),
            "ts": [
                base,
                base + pd.Timedelta(seconds=1_000_000),  # ~8333 halflives
                base + pd.Timedelta(seconds=1_000_000),  # zero gap
                pd.NaT,                                   # inert
                base + pd.Timedelta(seconds=1_000_120),  # 1 halflife later
            ],
            "x": [100.0, 10.0, 20.0, np.nan, 30.0],
        }
    )
    out = (
        ewma_time(spark.createDataFrame(pdf), "x", HL_S, key="k", ts="ts",
                  order_extra=("i",))
        .toPandas().sort_values("i")["x_ewma"].to_numpy()
    )
    assert out[0] == 100.0
    assert abs(out[1] - 10.0) < 1e-6          # past decayed to ~nothing
    assert abs(out[2] - 15.0) < 1e-6          # equal weights at zero gap
    assert np.isnan(out[3])
    # one halflife after rows 1/2: weights [~0, 0.5, 0.5, 1] on
    # [100, 10, 20, 30] -> (5 + 10 + 30) / 2 = 22.5
    assert abs(out[4] - 22.5) < 1e-4


def test_time_validation(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [pd.Timestamp("2026-01-01")], "x": [1.0]})
    )
    with pytest.raises(ValueError, match="halflife"):
        ewma_time(df, "x", 0.0, key="k", ts="ts")
    with pytest.raises(ValueError, match="no such column"):
        ewma_time(df, "nope", 10.0, key="k", ts="ts")
    with pytest.raises(ValueError, match="already exists"):
        ewma_time(df, "x", 10.0, key="k", ts="ts", out_col="ts")
