"""Small shared plan utilities (r8 optimization round).

``widen_partitions``: a single-file / single-row-group input (the common
shape of a freshly generated or compacted table) gives the whole scan ONE
task, and every per-row Arrow kernel or interpreted expression chained onto
it then runs on ONE core. Parquet byte-range splitting cannot help — a file
with one row group yields one non-empty split no matter what
``maxPartitionBytes`` says — so the fix has to be a repartition in the plan.

The helper is a strict no-op (zero added exchanges) when the input is
already at least ``defaultParallelism`` partitions wide, which is the normal
case at scale (many input splits); it only fires on narrow inputs, where one
small shuffle buys a cores-wide downstream stage. With a ``key`` column the
repartition hashes on it (deterministic, no sort prepass); otherwise
round-robin (deterministic via Spark's sort-before-repartition,
SPARK-23207). Consumers must be per-row / partitioning-invariant — true for
every kernel this repo applies it to (text hash kernels, per-row Catalyst
projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen_partitions(df: DataFrame, key: str | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
