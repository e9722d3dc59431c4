"""W1-W10 vs pandas oracles (SURVEY.md §5 item 1)."""

import numpy as np
import pandas as pd
import pytest

from pitfeat.ops import windows as W
from tests.oracle_pandas import gap_oracle, rolling_oracle, sessionize_oracle

KEYS = ["conv_id", "turn_idx"]


def _sorted_pd(df):
    return df.toPandas().sort_values(KEYS).reset_index(drop=True)


def test_gap(transcripts, transcripts_pd):
    out = _sorted_pd(W.with_gap(transcripts))
    oracle = gap_oracle(transcripts_pd)
    np.testing.assert_allclose(
        out["gap_s"].to_numpy(float), oracle.to_numpy(float), equal_nan=True
    )


def test_lags(transcripts, transcripts_pd):
    out = _sorted_pd(W.with_lags(transcripts, ["role", "ts"], offsets=[1, 2], leads=True))
    g = transcripts_pd.groupby("conv_id")
    for k in (1, 2):
        pd.testing.assert_series_equal(
            out[f"role_lag{k}"], g["role"].shift(k).reset_index(drop=True), check_names=False
        )
        pd.testing.assert_series_equal(
            out[f"role_lead{k}"], g["role"].shift(-k).reset_index(drop=True), check_names=False
        )
        pd.testing.assert_series_equal(
            out[f"ts_lag{k}"], g["ts"].shift(k).reset_index(drop=True), check_names=False
        )


@pytest.mark.parametrize("fn", ["mean", "sum", "min", "max"])
def test_rolling(transcripts, transcripts_pd, fn):
    t = W.with_gap(transcripts)
    out = _sorted_pd(W.rolling(t, "gap_s", [fn], window=5))
    tp = transcripts_pd.copy()
    tp["gap_s"] = gap_oracle(tp)
    oracle = rolling_oracle(tp, "gap_s", fn, 5)
    np.testing.assert_allclose(
        out[f"gap_s_roll5_{fn}"].to_numpy(float),
        oracle.to_numpy(float),
        equal_nan=True,
    )


def test_rolling_time_range(transcripts, transcripts_pd):
    out = _sorted_pd(W.rolling_time(transcripts.withColumn("one", W.F.lit(1.0)), "one", ["sum"], range_s=600))
    # oracle: count of turns in trailing 600s inclusive
    tp = transcripts_pd
    vals = []
    for _, g in tp.groupby("conv_id", sort=True):
        ts = g["ts"].astype("int64").to_numpy() / 1e9
        for t in ts:
            vals.append(((ts >= t - 600) & (ts <= t)).sum())
    np.testing.assert_allclose(out["one_last600s_sum"].to_numpy(float), np.array(vals, float))


def test_cumulative_tools(transcripts, transcripts_pd):
    out = _sorted_pd(W.cumulative_tool_calls(transcripts))
    oracle = (
        (transcripts_pd["tool"].fillna("") != "")
        .astype(int)
        .groupby(transcripts_pd["conv_id"])
        .cumsum()
    )
    np.testing.assert_array_equal(out["tool_calls_cum"].to_numpy(), oracle.to_numpy())


def test_ffill_and_bfill_gate(spark, transcripts):
    from pyspark.sql import functions as F

    t = transcripts.withColumn(
        "sparse", F.when(F.pmod(F.col("turn_idx"), F.lit(3)) == 0, F.col("turn_idx").cast("double"))
    )
    # oracle built from the INPUT frame, never from the op's own output: an
    # implementation that also overwrote the source column would make an
    # output-derived ffill an identity (self-compare tautology)
    inp = _sorted_pd(t)
    out = _sorted_pd(W.forward_fill(t, ["sparse"]))
    np.testing.assert_allclose(
        out["sparse"].to_numpy(float), inp["sparse"].to_numpy(float), equal_nan=True
    )  # source column untouched
    oracle = inp.groupby("conv_id")["sparse"].ffill()
    np.testing.assert_allclose(
        out["sparse_ffill"].to_numpy(float), oracle.to_numpy(float), equal_nan=True
    )
    with pytest.raises(ValueError, match="leakage"):
        W.backfill(t, ["sparse"])
    out2 = _sorted_pd(W.backfill(t, ["sparse"], allow_leakage=True))
    oracle2 = inp.groupby("conv_id")["sparse"].bfill()
    np.testing.assert_allclose(
        out2["sparse_bfill"].to_numpy(float), oracle2.to_numpy(float), equal_nan=True
    )


def test_sessionize(transcripts, transcripts_pd):
    out = _sorted_pd(W.sessionize(transcripts, gap_s=1800))
    oracle = sessionize_oracle(transcripts_pd, 1800)
    np.testing.assert_array_equal(out["session_no"].to_numpy(), oracle["session_no"].to_numpy())
    assert (out["session_id"] == oracle["session_id"]).all()
    # forced gaps every ~20 turns must create multi-session convs
    assert out.groupby("conv_id")["session_no"].max().max() > 1


def test_session_summaries(transcripts):
    s = W.sessionize(transcripts, gap_s=1800)
    summ = W.session_summaries(s).toPandas()
    sp = s.toPandas()
    assert summ["n_turns"].sum() == len(sp)
    g = sp.groupby("session_id")
    one = summ.set_index("session_id").sort_index()
    np.testing.assert_array_equal(one["n_turns"].to_numpy(), g.size().sort_index().to_numpy())


def test_role_ngrams(transcripts, transcripts_pd):
    vocab = ["user->assistant", "assistant->tool"]
    out = _sorted_pd(W.role_ngrams(transcripts, n=2, count_window=10, vocab=vocab))
    g = transcripts_pd.groupby("conv_id")["role"]
    expected = (g.shift(1) + "->" + transcripts_pd["role"]).where(
        g.cumcount() >= 1
    )
    pd.testing.assert_series_equal(out["role_2gram"], expected.reset_index(drop=True), check_names=False)
    # rolling count oracle for one vocab entry
    ind = (expected == vocab[0]).astype(float)
    roll = (
        ind.groupby(transcripts_pd["conv_id"]).rolling(10, min_periods=1).sum().reset_index(level=0, drop=True).sort_index()
    )
    np.testing.assert_allclose(out["ng_user_to_assistant_cnt"].to_numpy(float), roll.to_numpy(float))


def test_dedup_turns(spark, transcripts):
    doubled = transcripts.unionByName(transcripts)
    out = W.dedup_turns(doubled)
    assert out.count() == transcripts.count()


def test_top_k(transcripts):
    out = W.top_k_per_group(transcripts, "turn_idx", 3).toPandas()
    src = transcripts.toPandas()
    # EXACT top-k per group: right count (min(k, group size), so an off-by-one
    # returning k-1 rows fails) and exactly the k largest values — not merely
    # "at most k rows containing the max"
    for conv, grp in src.groupby("conv_id"):
        want = sorted(grp["turn_idx"].nlargest(3).tolist(), reverse=True)
        got = sorted(
            out[out["conv_id"] == conv]["turn_idx"].tolist(), reverse=True
        )
        assert got == want, conv


def test_single_window_exchange(transcripts):
    """Plan-shape: consecutive same-partitioning window ops share ONE shuffle."""
    import re

    def n_ex(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Exchange hashpartitioning\(conv_id", plan))

    base = n_ex(transcripts)
    t = W.with_gap(transcripts)
    t = W.cumulative_tool_calls(t)
    t = W.sessionize(t)
    assert n_ex(t) - base <= 1


def test_prev_session_features(transcripts):
    """J6 self as-of: every turn carries the PREVIOUS session's summary —
    never its own session's (strict-inequality leakage guard)."""
    import pandas as pd

    from pitfeat.ops.windows import prev_session_features, sessionize

    out = prev_session_features(transcripts, gap_s=1800).toPandas()
    lab = sessionize(transcripts, gap_s=1800).toPandas()
    out = out.merge(
        lab[["conv_id", "turn_idx", "session_no"]], on=["conv_id", "turn_idx"]
    )
    summ = (
        lab.groupby(["conv_id", "session_no"])
        .agg(n_turns=("turn_idx", "size"), end=("ts", "max"))
        .reset_index()
    )
    exp = summ.rename(columns={"session_no": "prev_no"})
    exp["session_no"] = exp["prev_no"] + 1
    merged = out.merge(exp, on=["conv_id", "session_no"], how="left")

    first = merged["session_no"] == 1
    assert first.any() and merged.loc[first, "prev_n_turns"].isna().all()
    later = ~first
    assert later.any()
    pd.testing.assert_series_equal(
        merged.loc[later, "prev_n_turns"].astype("int64"),
        merged.loc[later, "n_turns"].astype("int64"),
        check_names=False,
    )
    # leakage: the attached summary always ends strictly before the turn
    m = merged["prev_session_end"].notna()
    assert (merged.loc[m, "prev_session_end"] < merged.loc[m, "ts"]).all()


def test_dedup_turns_equal_ts_deterministic(spark):
    """Equal-(key, turn_idx, ts) duplicates must pick the SAME winner at any
    parallelism: the content-hash tie-break makes the order total (previously
    shuffle arrival order decided, so runs could disagree)."""
    import datetime as dt

    import pandas as pd

    from pitfeat.ops.windows import dedup_turns

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [("c", 0, t, txt) for txt in ("zz", "aa", "mm")]
    base = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, text string")
    winners = set()
    for parts in (1, 7):
        out = dedup_turns(base.repartition(parts)).collect()
        assert len(out) == 1
        winners.add(out[0]["text"])
    assert len(winners) == 1


def test_dedup_turns_nested_map_schema(spark):
    """Tie-break hashing must skip columns containing a map at ANY depth:
    Spark's xxhash64 raises DATATYPE_MISMATCH.HASH_MAP_TYPE on nested maps
    too, so a struct- or array-nested map used to crash dedup_turns /
    top_k_per_group even though a top-level map worked (ADVICE r3). The map
    column is excluded from the SORT KEY only — it still flows through."""
    import datetime as dt

    from pitfeat.ops.windows import dedup_turns, top_k_per_group

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("c", 0, t, ("x", {"k": 1}), [{"m": 2}], 1.0),
        ("c", 0, t, ("y", {"k": 2}), [{"m": 3}], 2.0),
        ("c", 1, t, ("z", {"k": 3}), None, 3.0),
    ]
    schema = (
        "conv_id string, turn_idx int, ts timestamp, "
        "s struct<a:string, m:map<string,int>>, am array<map<string,int>>, v double"
    )
    base = spark.createDataFrame(rows, schema)
    out = dedup_turns(base).collect()
    assert sorted(r["turn_idx"] for r in out) == [0, 1]
    # winner among the (c, 0) duplicates is consistent across parallelism
    winners = set()
    for parts in (1, 7):
        got = {r["turn_idx"]: r["v"] for r in dedup_turns(base.repartition(parts)).collect()}
        winners.add(got[0])
    assert len(winners) == 1
    topk = top_k_per_group(base, "v", k=1).collect()
    assert len(topk) == 1 and topk[0]["v"] == 3.0
