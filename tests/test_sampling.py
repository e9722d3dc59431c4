"""hash_split: deterministic train/val/test splitting (pitfeat/ops/sampling.py)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from pitfeat.ops.sampling import hash_split

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_disjoint_exhaustive_and_fractions(spark):
    n = 100_000
    df = spark.range(n).select(F.col("id"))
    for method in ("xxhash64", "portable"):
        out = hash_split(df, WEIGHTS, method=method)
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == set(WEIGHTS), method  # exhaustive, no nulls
        assert sum(counts.values()) == n  # disjoint (each row exactly once)
        for name, w in WEIGHTS.items():
            frac = counts[name] / n
            assert abs(frac - w) < 0.01, (method, name, frac)


def test_split_is_pure_function_of_id(spark):
    """Same id -> same split at ANY partitioning and row order — the
    property randomSplit lacks. Also: different seeds genuinely reassign."""
    df1 = spark.range(5_000).select(F.col("id"))
    df2 = df1.repartition(17).sortWithinPartitions(F.col("id").desc())
    a = {r["id"]: r["split"] for r in hash_split(df1, WEIGHTS).collect()}
    b = {r["id"]: r["split"] for r in hash_split(df2, WEIGHTS).collect()}
    assert a == b
    c = {r["id"]: r["split"] for r in hash_split(df1, WEIGHTS, seed=7).collect()}
    moved = sum(a[i] != c[i] for i in a) / len(a)
    assert moved > 0.2, f"seed change moved only {moved:.1%} of rows"


def test_portable_matches_pure_python(spark):
    """The portable method's arithmetic replayed in plain Python — the same
    replay the DuckDB oracle does (f_hash_split contract entry)."""
    M, A, B = 2_147_483_647, 48_271, 69_621
    seed = 7

    def py_split(i):
        x = ((i + seed) % M) * A % M * B % M
        return "train" if x < int(0.8 * M) else ("val" if x < int(0.9 * M) else "test")

    df = spark.range(-1000, 1000).select(F.col("id"))
    got = hash_split(df, WEIGHTS, seed=seed, method="portable").collect()
    for r in got:
        assert r["split"] == py_split(r["id"]), r["id"]


def test_null_id_and_validation(spark):
    df = spark.range(10).select(
        F.when(F.col("id") < 5, F.col("id")).alias("id")
    )
    out = hash_split(df, WEIGHTS).collect()
    assert sum(r["split"] is None for r in out) == 5
    base = spark.range(3).select(F.col("id"))
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(base, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="non-positive"):
        hash_split(base, {"a": 1.2, "b": -0.2})
    with pytest.raises(ValueError, match="already exists"):
        hash_split(base.withColumn("split", F.lit("x")), WEIGHTS)
    with pytest.raises(ValueError, match="unknown method"):
        hash_split(base, WEIGHTS, method="md5")
    with pytest.raises(ValueError, match="no such column"):
        hash_split(base, WEIGHTS, id_col="nope")


def test_split_stays_codegen(spark):
    """The split is a pure projection: no shuffle, no UDF, scan + project."""
    df = spark.range(10_000).select(F.col("id"))
    plan = hash_split(df, WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
