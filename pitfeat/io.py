"""Sources / sinks (SURVEY.md §2.1 S1/S2/S6).

Iceberg is treated as a pluggable catalog layer with a Parquet fallback: this
sandbox has no Iceberg runtime jar (verified in SURVEY.md §0), so
``table_format="iceberg"`` is honored only when a Spark catalog is configured;
all local tests/benches use Parquet. On a real cluster the same call sites
read/write Iceberg tables and get hidden-partitioning + snapshot isolation for
free — nothing else in the engine changes, because every operator consumes
plain DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pitfeat.schema import TRANSCRIPTS_SCHEMA, assert_schema, snapshots_schema


def _read(spark: SparkSession, path_or_table: str, fmt: str, schema=None) -> DataFrame:
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_table)
    if fmt == "parquet":
        return spark.read.parquet(path_or_table)
    if fmt == "orc":
        # self-describing like parquet: footer schema + predicate pushdown
        return spark.read.orc(path_or_table)
    if fmt == "csv":
        # text formats require a DECLARED schema (inference = a full extra
        # scan, banned at 10^12 rows); timestampFormat covers the ISO-8601
        # micros our writers emit
        if schema is None:
            raise ValueError("csv reads require a declared schema")
        # FAILFAST: with a declared schema, PERMISSIVE would silently null or
        # misalign every column when the file's real width/types differ —
        # violating the declared-schema discipline. Fail loudly instead.
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", "FAILFAST")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
            .csv(path_or_table)
        )
    if fmt == "json":
        if schema is None:
            raise ValueError("json reads require a declared schema")
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path_or_table)
    raise ValueError(f"unknown table format {fmt!r}")


def read_transcripts(spark: SparkSession, path_or_table: str, fmt: str = "parquet") -> DataFrame:
    df = _read(spark, path_or_table, fmt, TRANSCRIPTS_SCHEMA)
    assert_schema(df, TRANSCRIPTS_SCHEMA, "transcripts")
    return df


def read_snapshots(
    spark: SparkSession, path_or_table: str, fmt: str = "parquet", width: int | None = None
) -> DataFrame:
    from pitfeat.schema import SNAPSHOT_WIDTH

    if width is None and fmt in ("csv", "json"):
        # text formats have NO footer schema — reading them with a guessed
        # 16-wide schema would silently null/misalign columns
        raise ValueError(
            f"read_snapshots(fmt={fmt!r}) requires an explicit width= — text "
            "formats carry no schema to validate a default against"
        )
    df = _read(spark, path_or_table, fmt, snapshots_schema(width or SNAPSHOT_WIDTH))
    # ALWAYS validate, default width included: parquet/iceberg footers make
    # the file's real schema visible, and a snapshots table with mistyped
    # snap_ts or zero f_* columns should fail HERE on the driver, not as an
    # obscure type error (or empty feature vectors) deep in the join
    assert_schema(df, snapshots_schema(width or SNAPSHOT_WIDTH), "feature_snapshots")
    return df


def write_features(
    df: DataFrame, path_or_table: str, fmt: str = "parquet", mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if fmt == "iceberg":
        from pyspark.sql import functions as F

        wt = df.writeTo(path_or_table)
        if mode == "append":
            # append follows the TABLE's partition spec; a partition_by here
            # would be silently ignored by the v2 writer — refuse instead
            if partition_by:
                raise ValueError(
                    "partition_by applies only when (re)creating an iceberg "
                    "table; append follows the existing table's spec"
                )
            wt.append()
        elif mode == "overwrite":
            if partition_by:
                wt = wt.partitionedBy(*[F.col(c) for c in partition_by])
            wt.createOrReplace()
        else:
            raise ValueError(f"iceberg write supports append|overwrite, got {mode!r}")
        return
    if fmt not in ("parquet", "orc", "csv", "json"):
        # mirror the read path: a typo'd format must not silently fall
        # through to parquet
        raise ValueError(f"unknown table format {fmt!r}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).csv(path_or_table)
    elif fmt == "json":
        w.json(path_or_table)
    elif fmt == "orc":
        w.orc(path_or_table)
    else:
        w.parquet(path_or_table)
