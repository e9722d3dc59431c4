"""Pure (keyless) interval join: grid bucketing vs the naive cross oracle,
half-open boundary semantics, the long-interval guard, and the plan pin
that justifies the operator's existence (no BroadcastNestedLoopJoin)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pitfeat.ops.intervals import interval_join


def _mk(spark, n_pts=300, n_iv=40, seed=23, width_min=(5, 90)):
    rs = np.random.RandomState(seed)
    base = pd.Timestamp("2026-04-01")
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts),
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rs.randint(0, 86400, n_pts)],
        }
    )
    starts = rs.randint(0, 86400, n_iv)
    spans = rs.randint(width_min[0] * 60, width_min[1] * 60, n_iv)
    ivs = pd.DataFrame(
        {
            "iv_id": np.arange(n_iv),
            "iv_start": [base + pd.Timedelta(seconds=int(s)) for s in starts],
            "iv_end": [base + pd.Timedelta(seconds=int(s + d)) for s, d in zip(starts, spans)],
        }
    )
    return pts, ivs


def _naive(pts: pd.DataFrame, ivs: pd.DataFrame) -> set:
    out = set()
    for _, p in pts.iterrows():
        if pd.isna(p["ts"]):
            continue
        for _, v in ivs.iterrows():
            if pd.isna(v["iv_start"]) or pd.isna(v["iv_end"]):
                continue
            if v["iv_start"] <= p["ts"] < v["iv_end"]:
                out.add((int(p["pid"]), int(v["iv_id"])))
    return out


@pytest.mark.parametrize("bucket_width_s", [60.0, 3600.0, 86400.0 * 7])
def test_interval_join_matches_naive_at_any_grid(spark, bucket_width_s):
    """Output is grid-invariant: W far below, near, and far above the
    interval spans must all produce the exact naive pair set (pair
    uniqueness by construction — no dedup step exists to mask doubles)."""
    pts, ivs = _mk(spark)
    got = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        bucket_width_s=bucket_width_s,
    ).toPandas()
    pairs = list(map(tuple, got[["pid", "iv_id"]].to_numpy()))
    assert len(pairs) == len(set(pairs))  # no duplicate pair rows
    assert set(pairs) == _naive(pts, ivs)


def test_interval_join_boundaries_and_hygiene(spark):
    base = pd.Timestamp("2026-04-01")
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [0, 1, 2, 3],
                "ts": [base, base + pd.Timedelta("10min"), pd.NaT,
                       base + pd.Timedelta("1h")],
            }
        )
    )
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {
                "iv_id": [0, 1, 2],
                # iv 0: [base, base+10min) — pid 0 in (ts == start), pid 1
                # OUT (ts == end, exclusive). iv 1: inverted -> dropped.
                # iv 2: ends exactly on a bucket boundary (the -1us explode
                # edge): [30min, 60min) with W=1800s — pid 3 at 60min OUT.
                "iv_start": [base, base + pd.Timedelta("2h"),
                             base + pd.Timedelta("30min")],
                "iv_end": [base + pd.Timedelta("10min"), base + pd.Timedelta("1h"),
                           base + pd.Timedelta("60min")],
            }
        )
    )
    got = interval_join(pts, ivs, bucket_width_s=1800.0).toPandas()
    assert set(map(tuple, got[["pid", "iv_id"]].to_numpy())) == {(0, 0)}


def test_interval_join_span_guard_and_validation(spark):
    base = pd.Timestamp("2026-04-01")
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [0], "ts": [base]})
    )
    long_iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "iv_id": [0],
                "iv_start": [base - pd.Timedelta("365d")],
                "iv_end": [base + pd.Timedelta("365d")],
            }
        )
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_join(pts, long_iv, bucket_width_s=60.0, max_span_buckets=100).count()
    # same interval is fine with an adequate grid
    ok = interval_join(pts, long_iv, bucket_width_s=86400.0 * 30).toPandas()
    assert len(ok) == 1
    with pytest.raises(ValueError, match="collision"):
        interval_join(pts, pts.withColumnRenamed("ts", "iv_start")
                      .withColumn("iv_end", F.col("iv_start")))
    with pytest.raises(ValueError, match="bucket_width_s"):
        interval_join(pts, long_iv, bucket_width_s=0)
    # ADVICE r6: the internal grid names are reserved — an input already
    # carrying __bkt was silently overwritten, then dropped, producing an
    # unresolved-column failure at the final select instead of a clear error
    with pytest.raises(ValueError, match="reserved"):
        interval_join(pts.withColumn("__bkt", F.lit(0)), long_iv)
    with pytest.raises(ValueError, match="reserved"):
        interval_join(pts, long_iv.withColumn("__span", F.lit(0)))


def test_interval_join_extra_on_key(spark):
    base = pd.Timestamp("2026-04-01")
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [0, 1],
                "k": ["a", "b"],
                "ts": [base + pd.Timedelta("5min")] * 2,
            }
        )
    )
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {
                "iv_id": [0],
                "k": ["a"],
                "iv_start": [base],
                "iv_end": [base + pd.Timedelta("10min")],
            }
        )
    )
    got = interval_join(pts, ivs, extra_on=["k"]).toPandas()
    assert set(got["pid"]) == {0}
    assert set(got.columns) == {"pid", "k", "ts", "iv_id", "iv_start", "iv_end"}


def test_interval_join_plan_has_no_nested_loop(spark):
    """The operator's reason to exist: the naive keyless range join plans
    BroadcastNestedLoopJoin; the grid join must plan a plain equi join."""
    pts, ivs = _mk(spark)
    p, v = spark.createDataFrame(pts), spark.createDataFrame(ivs)
    naive = p.join(v, (v.iv_start <= p.ts) & (p.ts < v.iv_end))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan
    grid_plan = (
        interval_join(p, v)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in grid_plan
    assert "CartesianProduct" not in grid_plan


def test_interval_join_subresolution_width_rejected(spark):
    base = pd.Timestamp("2026-04-01")
    pts = spark.createDataFrame(pd.DataFrame({"pid": [0], "ts": [base]}))
    ivs = spark.createDataFrame(
        pd.DataFrame({"iv_id": [0], "iv_start": [base],
                      "iv_end": [base + pd.Timedelta("1min")]})
    )
    with pytest.raises(ValueError, match="microsecond"):
        interval_join(pts, ivs, bucket_width_s=1e-7)
