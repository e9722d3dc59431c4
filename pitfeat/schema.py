"""Declared schemas (SURVEY.md §1.2): fixed, never inferred.

Schema inference at 10^12 rows is a full scan; every reader asserts against
these StructTypes instead.
"""

from __future__ import annotations

from pyspark.sql import types as T

SNAPSHOT_WIDTH = 16  # fixed feature width F (FIXTURES.md §A2)

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def snapshot_feature_cols(width: int = SNAPSHOT_WIDTH) -> list[str]:
    return [f"f_{i}" for i in range(width)]


def snapshots_schema(width: int = SNAPSHOT_WIDTH) -> T.StructType:
    fields = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("snap_ts", T.TimestampType(), False),
    ] + [T.StructField(c, T.DoubleType(), True) for c in snapshot_feature_cols(width)]
    return T.StructType(fields)


FEATURE_VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def assert_schema(df, expected: T.StructType, name: str) -> None:
    """Cheap structural assertion: required columns exist with expected types.

    Extra columns are allowed (projection prunes them); missing or mistyped
    ones fail fast on the driver before any job launches.
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    for f in expected.fields:
        if f.name not in actual:
            raise ValueError(f"{name}: missing column {f.name!r}; has {sorted(actual)}")
        if actual[f.name] != f.dataType:
            raise ValueError(
                f"{name}: column {f.name!r} is {actual[f.name]}, expected {f.dataType}"
            )
