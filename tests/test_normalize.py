"""A2-A4 normalization + degenerate pruning vs numpy oracle (SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pitfeat.ops.normalize import compute_minmax, normalize_minmax, prune_degenerate
from pitfeat.ops.vectors import allclose_compare, assemble
from pitfeat.schema import snapshot_feature_cols
from tests.oracle_pandas import minmax_oracle

FEATS = snapshot_feature_cols()


def test_minmax_stats_and_degenerates(snapshots, snapshots_pd):
    stats = compute_minmax(snapshots, FEATS)
    _, survivors, mins, maxs = minmax_oracle(snapshots_pd, FEATS)
    # fixture guarantees: f_13 constant, f_14 all-null => degenerate;
    # f_15 constant-within-conv but varying across => NOT degenerate
    deg = set(stats.degenerate())
    assert "f_13" in deg and "f_14" in deg
    assert "f_15" not in deg
    assert stats.survivors() == survivors
    for c in survivors:
        assert stats.mins[c] == pytest.approx(mins[c])
        assert stats.maxs[c] == pytest.approx(maxs[c])


def test_normalize_matches_numpy(snapshots, snapshots_pd):
    stats = compute_minmax(snapshots, FEATS)
    pruned, cols = prune_degenerate(snapshots, stats)
    out = (
        normalize_minmax(pruned, stats, cols)
        .toPandas()
        .sort_values(["conv_id", "snap_ts"])
        .reset_index(drop=True)
    )
    oracle, survivors, _, _ = minmax_oracle(snapshots_pd, FEATS)
    assert cols == survivors
    for c in cols:
        np.testing.assert_allclose(
            out[c].to_numpy(float), oracle[c].to_numpy(float), equal_nan=True
        )
        assert np.nanmin(out[c]) >= 0.0 and np.nanmax(out[c]) <= 1.0


def test_nan_passthrough(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [0.0, 1.0, 2.0, np.nan], "k": list("aabb")})
    )
    stats = compute_minmax(df, ["x"])
    assert stats.mins["x"] == 0.0 and stats.maxs["x"] == 2.0  # NaN excluded
    out = normalize_minmax(df, stats, ["x"]).toPandas().sort_values("x")
    np.testing.assert_allclose(
        sorted(out["x"].to_numpy(float), key=lambda v: (np.isnan(v), v)),
        [0.0, 0.5, 1.0, np.nan],
        equal_nan=True,
    )


def test_normalize_rejects_degenerate():
    from pitfeat.ops.normalize import MinMaxStats

    stats = MinMaxStats(mins={"x": 1.0}, maxs={"x": 1.0})
    with pytest.raises(ValueError, match="degenerate"):
        normalize_minmax(None, stats, ["x"])


def test_assemble_and_allclose(spark, snapshots):
    stats = compute_minmax(snapshots, FEATS)
    pruned, cols = prune_degenerate(snapshots, stats)
    v = assemble(normalize_minmax(pruned, stats, cols), cols)
    v = v.withColumn("turn_idx", F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("conv_id").orderBy("snap_ts")
    ))
    res = allclose_compare(v, v, keys=["conv_id", "turn_idx"]).agg(F.min("allclose")).collect()[0][0]
    assert res is True
    # perturb one slot beyond tolerance -> allclose False somewhere
    v2 = v.withColumn(
        "features", F.transform("features", lambda x, i: F.when(i == 0, x + 0.5).otherwise(x))
    )
    res2 = allclose_compare(v, v2, keys=["conv_id", "turn_idx"]).agg(F.min("allclose")).collect()[0][0]
    assert res2 is False


def test_vector_width_fixed(snapshots):
    stats = compute_minmax(snapshots, FEATS)
    pruned, cols = prune_degenerate(snapshots, stats)
    v = assemble(pruned, cols)
    widths = v.select(F.size("features").alias("w")).distinct().collect()
    assert len(widths) == 1 and widths[0][0] == len(cols)


# ---------------------------------------------------------------------------
# A9 z-score / A10 quantile binning
# ---------------------------------------------------------------------------


def test_zscore_matches_numpy(spark):
    from pitfeat.ops.normalize import compute_moments, normalize_zscore

    rng = np.random.default_rng(11)
    xs = rng.normal(3.0, 2.0, 500)
    pdf = pd.DataFrame({"x": xs, "c": np.full(500, 7.0), "n": np.nan})
    df = spark.createDataFrame(pdf)
    stats = compute_moments(df, ["x", "c", "n"])
    # constant and all-NaN columns are degenerate; x survives
    assert set(stats.degenerate()) == {"c", "n"}
    assert stats.survivors() == ["x"]
    out = normalize_zscore(df, stats).toPandas()["x"].to_numpy()
    np.testing.assert_allclose(
        np.sort(out), np.sort((xs - xs.mean()) / xs.std(ddof=1)), rtol=1e-12
    )
    with pytest.raises(ValueError, match="degenerate"):
        normalize_zscore(df, stats, ["c"])


def test_zscore_nan_excluded_from_stats(spark):
    from pitfeat.ops.normalize import compute_moments

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, np.nan]})
    stats = compute_moments(spark.createDataFrame(pdf), ["x"])
    assert stats.counts["x"] == 3
    assert stats.means["x"] == pytest.approx(2.0)
    assert stats.stds["x"] == pytest.approx(1.0)


def test_quantile_bin_edges_and_nulls(spark):
    from pitfeat.ops.normalize import compute_quantiles, quantile_bin

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, None, np.nan, 10.0, 7.3, 2.2, 8.8, 0.1, 5.5, 6.6]})
    df = spark.createDataFrame(pdf)
    cuts = compute_quantiles(df, "x", [0.25, 0.5, 0.75])
    # NaN/null excluded: matches numpy over the 11 valid values
    valid = pdf["x"].dropna().to_numpy()
    np.testing.assert_allclose(cuts, np.percentile(valid, [25, 50, 75]))
    out = quantile_bin(df, "x", cuts).toPandas()
    b = dict(zip(out["x"], out["x_bin"]))
    # a value exactly ON a cutpoint lands in the HIGHER bin
    on_cut = float(cuts[1])
    got = quantile_bin(
        spark.createDataFrame(pd.DataFrame({"x": [on_cut]})), "x", cuts
    ).toPandas()["x_bin"][0]
    assert got == 3
    assert out["x_bin"].min() == 1 and out["x_bin"].max() == 4
    # null and NaN inputs -> null bin
    assert out.loc[out["x"].isna(), "x_bin"].isna().all()
    # bins are monotone in x
    v = out.dropna(subset=["x"]).sort_values("x")
    assert v["x_bin"].is_monotonic_increasing


def test_quantile_validation_and_approx_leg(spark):
    from pitfeat.ops.normalize import compute_quantiles, quantile_bin

    df = spark.createDataFrame(pd.DataFrame({"x": np.arange(100, dtype=float)}))
    with pytest.raises(ValueError, match="interior"):
        compute_quantiles(df, "x", [0.0, 0.5])
    with pytest.raises(ValueError, match="ascending"):
        quantile_bin(df, "x", [3.0, 1.0])
    with pytest.raises(ValueError, match="no non-null"):
        compute_quantiles(
            spark.createDataFrame(pd.DataFrame({"x": [None, None]}), "x double"),
            "x",
            [0.5],
        )
    approx = compute_quantiles(df, "x", [0.5], exact=False)
    assert 45.0 <= approx[0] <= 55.0


def test_quantile_approx_leg_at_scale(spark):
    """VERDICT r5 #8: the exact=False approx_percentile path is the 100-TB
    path (bounded-memory mergeable sketch vs exact's per-partition distinct
    buffer) but had no dedicated evidence. On a 1M-row deterministic
    uniform column: (a) approx cutpoints sit within sketch tolerance of the
    exact ones (default accuracy 10000 => ~1e-4 rank error; uniform data
    maps rank error ~ value error), (b) two runs on the same layout are
    identical, and (c) backticked column names work on this SQL-built path
    (the ADVICE r5 identifier-quoting fix)."""
    from pitfeat.ops.normalize import compute_quantiles

    n = 1_000_000
    df = spark.range(n).select(
        (F.pmod(F.xxhash64(F.lit(11), F.col("id")), F.lit(1_000_000_000)) / 1e9)
        .alias("v v.1")  # space + dot: needs backtick quoting
    )
    probs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    exact = compute_quantiles(df, "v v.1", probs)
    a1 = compute_quantiles(df, "v v.1", probs, exact=False)
    a2 = compute_quantiles(df, "v v.1", probs, exact=False)
    assert a1 == a2  # sketch is deterministic for a fixed layout
    for p, e, a in zip(probs, exact, a1):
        assert abs(a - e) < 2e-3, (p, e, a)
    assert all(x < y for x, y in zip(a1, a1[1:]))  # monotone cutpoints


def test_quantiles_multi_one_job_parity(spark):
    """compute_quantiles_multi == per-column compute_quantiles on every
    column (incl. a NaN-bearing one), in ONE agg job instead of N."""
    from pitfeat.ops.normalize import compute_quantiles, compute_quantiles_multi

    pdf = pd.DataFrame(
        {
            "a": np.arange(100, dtype=float),
            "b": np.arange(100, dtype=float) ** 2,
            "c": [np.nan if i % 7 == 0 else float(i) for i in range(100)],
        }
    )
    df = spark.createDataFrame(pdf)
    probs = [0.25, 0.5, 0.75]
    multi = compute_quantiles_multi(df, ["a", "b", "c"], probs)
    for c in ("a", "b", "c"):
        assert multi[c] == compute_quantiles(df, c, probs), c
    with pytest.raises(ValueError, match="non-empty"):
        compute_quantiles_multi(df, [], probs)
    with pytest.raises(ValueError, match="no non-null"):
        compute_quantiles_multi(
            spark.createDataFrame(pd.DataFrame({"a": [1.0], "z": [None]}),
                                  "a double, z double"),
            ["a", "z"], probs,
        )


def test_grouped_minmax_matches_pandas(spark):
    """Per-group min-max vs a pandas per-group transform, incl. NaN
    passthrough, null passthrough, and a degenerate group (constant values
    -> null, the per-group analog of the global degenerate PRUNE)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from pitfeat.ops.normalize import normalize_minmax_grouped

    pdf = pd.DataFrame(
        {
            "id": range(12),
            "g": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
            "x": [1.0, 3.0, np.nan, None, 2.0,  # a: stats over {1,3,2}
                  10.0, 10.0, 10.0, 10.0,       # b: degenerate (max==min)
                  -1.0, 0.0, 1.0],              # c
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        normalize_minmax_grouped(df, ["x"], "g")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = []
    for _, r in pdf.iterrows():
        grp = pdf[pdf["g"] == r["g"]]["x"]
        clean = grp.dropna()
        clean = clean[~np.isnan(clean)]
        mn, mx = clean.min(), clean.max()
        x = r["x"]
        if x is None or (isinstance(x, float) and pd.isna(x) and x is not np.nan):
            want.append(None)
        elif mx == mn:
            want.append(None)
        elif isinstance(x, float) and np.isnan(x):
            want.append(np.nan)
        else:
            want.append((x - mn) / (mx - mn))
    w = pd.Series(want, dtype="float64")
    gx = got["x"]
    # group a: scaled into [0,1]; NaN stays NaN; None stays null
    assert gx[0] == 0.0 and gx[1] == 1.0 and gx[4] == 0.5
    assert np.isnan(gx[2])
    assert pd.isna(gx[3])
    # group b: every row null (degenerate). ADVICE r7: the old clause
    # `not np.isnan(...).all() is None` parsed to always-True and never
    # checked NULL-vs-NaN; assert at the Spark row level, where SQL NULL
    # comes back as Python None while a NaN double stays a float
    assert gx[5:9].isna().all()
    raw = {
        r["id"]: r["x"]
        for r in normalize_minmax_grouped(df, ["x"], "g").collect()
    }
    assert all(raw[i] is None for i in range(5, 9))
    # group c
    assert gx[9] == 0.0 and gx[10] == 0.5 and gx[11] == 1.0
    # non-feature columns untouched, schema preserved
    assert list(got.columns) == ["id", "g", "x"]


def test_grouped_zscore_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from pitfeat.ops.normalize import normalize_zscore_grouped

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "id": range(300),
            "g": [f"g{i % 7}" for i in range(300)],
            "x": rng.normal(10, 3, 300),
        }
    )
    # g6 made degenerate: constant
    pdf.loc[pdf["g"] == "g6", "x"] = 5.0
    # one singleton group
    pdf.loc[299, "g"] = "solo"
    df = spark.createDataFrame(pdf)
    got = (
        normalize_zscore_grouped(df, ["x"], "g")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for g, grp in pdf.groupby("g"):
        sub = got[pdf["g"].to_numpy() == g]["x"]
        if g in ("g6", "solo"):
            assert sub.isna().all(), g
        else:
            mu, sd = grp["x"].mean(), grp["x"].std(ddof=1)
            w = (grp["x"] - mu) / sd
            np.testing.assert_allclose(
                sub.to_numpy(), w.to_numpy(), rtol=1e-9, atol=1e-12
            )


def test_grouped_normalize_validation_and_plan(spark):
    """Bad args fail loudly; the plan shuffles the BIG side zero times —
    grouped stats ride back on a broadcast join (one Exchange for the stats
    agg only), everything codegen, no UDF."""
    import pyspark.sql.functions as F
    import pytest

    from pitfeat.ops.normalize import (
        normalize_minmax_grouped,
        normalize_zscore_grouped,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).alias("g"), (F.col("id") * 1.5).alias("x")
    )
    for fn in (normalize_minmax_grouped, normalize_zscore_grouped):
        with pytest.raises(ValueError, match="missing column"):
            fn(df, ["nope"], "g")
        with pytest.raises(ValueError, match="both cols and by"):
            fn(df, ["x"], ["x"])
    plan = (
        normalize_minmax_grouped(df, ["x"], "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan
    # exactly ONE hash exchange: the grouped-stats agg; the probe side of
    # the broadcast join must not be shuffled
    assert plan.count("Exchange hashpartitioning") == 1, plan
