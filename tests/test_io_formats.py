"""S1 source-format variants (csv/json with declared schemas) and A8 UDAFs."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from pitfeat.io import read_transcripts


def _roundtrip(spark, transcripts, tmp_path, fmt):
    p = str(tmp_path / f"t_{fmt}")
    w = transcripts.coalesce(2).write.mode("overwrite")
    if fmt == "csv":
        w.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).csv(p)
    else:
        w.json(p)
    return read_transcripts(spark, p, fmt=fmt)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_format_roundtrip(spark, transcripts, tmp_path, fmt):
    got = (
        _roundtrip(spark, transcripts, tmp_path, fmt)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    # text byte-equality under stable ordering (the BASELINE.json invariant);
    # empty-string vs null differs by format (csv has no empty/null
    # distinction without extra options) — normalize like a real ingest would
    for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        a, b = got[c].fillna(""), want[c].fillna("")
        assert (a == b).all(), c


def test_schema_never_inferred(spark, transcripts, tmp_path):
    """Declared-schema discipline: reading csv without the engine (plain
    spark.read.csv, no schema) would give all-strings; ours gives the
    contract types."""
    df = _roundtrip(spark, transcripts, tmp_path, "csv")
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_grouped_rms_udaf(spark, transcripts):
    from pitfeat.ops.udaf import grouped_gap_iqr, grouped_rms

    df = transcripts.withColumn("val", F.length("text").cast("double"))
    got = {
        r["role"]: r["rms"]
        for r in df.groupBy("role").agg(grouped_rms()(F.col("val")).alias("rms")).collect()
    }
    pdf = df.select("role", "val").toPandas()
    for role, grp in pdf.groupby("role"):
        want = float(np.sqrt(np.mean(np.square(grp["val"].to_numpy(dtype=float)))))
        assert abs(got[role] - want) < 1e-9, role

    iqr = df.groupBy("role").agg(grouped_gap_iqr()(F.col("val")).alias("iqr")).collect()
    for r in iqr:
        grp = pdf[pdf["role"] == r["role"]]["val"].to_numpy(dtype=float)
        q75, q25 = np.percentile(grp, [75.0, 25.0])
        assert abs(r["iqr"] - (q75 - q25)) < 1e-9


def test_write_features_partitioned_roundtrip(spark, transcripts, tmp_path):
    """S6: partitioned feature sink writes hive-style dirs and roundtrips."""
    import os

    from pitfeat.io import write_features

    df = transcripts.select("conv_id", "turn_idx", "ts", "role")
    p = str(tmp_path / "features_out")
    write_features(df, p, partition_by=["role"])
    subdirs = {d for d in os.listdir(p) if d.startswith("role=")}
    assert subdirs == {"role=user", "role=assistant", "role=tool"}
    back = (
        spark.read.parquet(p)
        .select("conv_id", "turn_idx", "role")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        df.select("conv_id", "turn_idx", "role")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (back == want).all().all()


def test_snapshot_text_formats_require_width(spark, tmp_path):
    """ADVICE r2: csv/json snapshots with width=None used to read silently
    with the default 16-wide schema (PERMISSIVE => nulled/misaligned columns
    on any real width mismatch). Text formats now demand an explicit width."""
    from pitfeat.io import read_snapshots

    for fmt in ("csv", "json"):
        with pytest.raises(ValueError, match="width"):
            read_snapshots(spark, str(tmp_path / "x"), fmt=fmt)


def test_csv_width_mismatch_fails_fast(spark, tmp_path):
    """FAILFAST discipline: a 4-wide snapshot file read with a declared
    8-wide schema must raise, not yield silently-null feature columns."""
    import datetime as dt

    from pitfeat.io import read_snapshots
    from pitfeat.schema import snapshots_schema

    rows = [("c1", dt.datetime(2024, 1, 1)) + tuple(float(i) for i in range(4))]
    df = spark.createDataFrame(rows, snapshots_schema(4))
    p = str(tmp_path / "snaps4.csv")
    df.coalesce(1).write.mode("overwrite").option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).csv(p)
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_snapshots(spark, p, fmt="csv", width=8).collect()


def test_iceberg_paths_reach_v2_writer(spark, transcripts, monkeypatch):
    """Structural coverage for the Iceberg read/write paths (no runtime jar in
    this sandbox — SURVEY.md §0): fmt='iceberg' must route to the DataFrameV2
    writeTo(...).createOrReplace() and spark.read.format('iceberg') APIs, and
    error helpfully (not silently) when no catalog is configured."""
    from pitfeat.io import read_transcripts, write_features

    calls = {}

    class FakeV2Writer:
        def __init__(self, table):
            calls["table"] = table

        def createOrReplace(self):
            calls["created"] = True

    # patch the CONCRETE class: pyspark 4's pyspark.sql.DataFrame is an ABC
    # whose classic subclass overrides writeTo, shadowing a base-class patch
    monkeypatch.setattr(
        type(transcripts), "writeTo", lambda self, t: FakeV2Writer(t), raising=True
    )
    write_features(transcripts, "cat.db.features", fmt="iceberg")
    assert calls == {"table": "cat.db.features", "created": True}

    # unpatched write path on a catalog-less session: loud failure, not a
    # silent parquet fallback
    monkeypatch.undo()
    with pytest.raises(Exception):
        write_features(transcripts.limit(1), "nocat.db.t", fmt="iceberg")

    reads = {}

    class FakeReader:
        def format(self, f):
            reads["fmt"] = f
            return self

        def load(self, p):
            reads["path"] = p
            return transcripts  # schema-compatible stand-in

    monkeypatch.setattr(
        type(spark), "read", property(lambda self: FakeReader()), raising=True
    )
    out = read_transcripts(spark, "cat.db.transcripts", fmt="iceberg")
    assert reads == {"fmt": "iceberg", "path": "cat.db.transcripts"}
    assert out.columns == transcripts.columns


def test_pipeline_csv_snapshots_default_width(spark, transcripts, snapshots, tmp_path):
    """Pipeline.asof_snapshots must still read text-format snapshots at the
    engine's default width (read_snapshots requires width for csv/json; the
    Pipeline supplies SNAPSHOT_WIDTH when the caller doesn't)."""
    from pitfeat.config import PitfeatConfig
    from pitfeat.pipeline import Pipeline

    p = str(tmp_path / "snaps_csv")
    snapshots.coalesce(1).write.mode("overwrite").option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).csv(p)
    cfg = PitfeatConfig(table_format="csv")
    out = Pipeline.from_df(spark, transcripts, cfg).asof_snapshots(p).df
    assert out.count() == transcripts.count()


def test_write_features_rejects_unknown_format_and_iceberg_modes(spark, transcripts):
    """The write path must mirror the read path's strictness: a typo'd format
    cannot silently produce parquet, and iceberg append must not be satisfied
    by createOrReplace (which would replace the table with one increment)."""
    from pitfeat.io import write_features

    with pytest.raises(ValueError, match="unknown table format"):
        write_features(transcripts, "/tmp/never", fmt="parqet")

    calls = []

    class FakeV2Writer:
        def __init__(self, t):
            pass

        def append(self):
            calls.append("append")

        def createOrReplace(self):
            calls.append("createOrReplace")

    orig = type(transcripts).writeTo
    type(transcripts).writeTo = lambda self, t: FakeV2Writer(t)
    try:
        write_features(transcripts, "cat.db.t", fmt="iceberg", mode="append")
        write_features(transcripts, "cat.db.t", fmt="iceberg", mode="overwrite")
        with pytest.raises(ValueError, match="append|overwrite"):
            write_features(transcripts, "cat.db.t", fmt="iceberg", mode="errorifexists")
        with pytest.raises(ValueError, match="partition_by"):
            write_features(
                transcripts, "cat.db.t", fmt="iceberg", mode="append", partition_by=["role"]
            )
    finally:
        type(transcripts).writeTo = orig
    assert calls == ["append", "createOrReplace"]


def test_orc_roundtrip(spark, transcripts, tmp_path):
    """ORC source/sink: self-describing like parquet (footer schema,
    pushdown) — write_features + read_transcripts roundtrip byte-exact."""
    from pitfeat.io import read_transcripts, write_features

    p = str(tmp_path / "t_orc")
    write_features(transcripts.coalesce(2), p, fmt="orc")
    got = (
        read_transcripts(spark, p, fmt="orc")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
