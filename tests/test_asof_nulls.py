"""Regression: as-of fill must be row-ATOMIC. A newer snapshot's legitimate
NULL must not be overwritten by an older snapshot's value (per-column ffill
would do exactly that)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pitfeat.ops.asof import asof_join
from tests.oracle_pandas import asof_oracle


@pytest.fixture(scope="module")
def mixed_null_snapshots(spark, transcripts):
    """Snapshots where each feature column is null on a hash-selected ~40% of
    ROWS (not whole columns), so row-atomicity is actually exercised."""
    from pitfeat.synth import gen_snapshots

    s = gen_snapshots(transcripts, seed=42)
    out = s
    for i in (0, 1, 2, 3):
        c = f"f_{i}"
        out = out.withColumn(
            c,
            F.when(
                F.pmod(F.xxhash64("conv_id", F.col("snap_ts").cast("long"), F.lit(900 + i)), F.lit(5)) >= 2,
                F.col(c),
            ),
        )
    return out.cache()


@pytest.mark.parametrize("strategy", ["window", "cogroup", "merge"])
def test_row_atomic_fill(transcripts, transcripts_pd, mixed_null_snapshots, strategy):
    out = (
        asof_join(transcripts, mixed_null_snapshots, strategy=strategy)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    snaps_pd = (
        mixed_null_snapshots.toPandas().sort_values(["conv_id", "snap_ts"]).reset_index(drop=True)
    )
    oracle = asof_oracle(transcripts_pd, snaps_pd)
    assert len(out) == len(oracle)
    pd.testing.assert_series_equal(out["snap_ts"], oracle["snap_ts"], check_names=False)
    for i in range(16):
        c = f"f_{i}"
        np.testing.assert_allclose(
            out[c].to_numpy(float), oracle[c].to_numpy(float), equal_nan=True, err_msg=(strategy, c)
        )


def test_explicit_null_resurrection_case(spark):
    """Minimal reproducer: S1(f=1.0) then S2(f=null); a turn after S2 must see
    null, not 1.0."""
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a"],
                "turn_idx": [0],
                "ts": [pd.Timestamp("2024-01-01 10:00:00")],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a"],
                "snap_ts": [
                    pd.Timestamp("2024-01-01 08:00:00"),
                    pd.Timestamp("2024-01-01 09:00:00"),
                ],
                "f": [1.0, None],
            }
        )
    )
    for strategy in ("window", "cogroup", "merge"):
        row = asof_join(left, right, strategy=strategy).collect()[0]
        assert row["snap_ts"] == pd.Timestamp("2024-01-01 09:00:00"), strategy
        assert row["f"] is None or (isinstance(row["f"], float) and np.isnan(row["f"])), strategy
