"""Streaming analogues (SURVEY.md §2.10): file source + availableNow trigger."""

import pytest

from pitfeat.streaming import (
    asof_features_microbatch,
    stream_dedup,
    stream_rolling,
    stream_sessionize,
)


@pytest.fixture(scope="module")
def stream_src(spark, transcripts, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "turns")
    transcripts.write.mode("overwrite").parquet(p)
    schema = spark.read.parquet(p).schema
    return spark.readStream.schema(schema).parquet(p)


def _run(df, name, mode="append"):
    # aggregation tests use complete mode: in append mode the final watermark
    # of an availableNow run does not flush still-open session windows, so the
    # tail sessions would be withheld (the documented lateness/finalization
    # semantics, not a bug)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_sessionize_matches_batch(spark, transcripts, stream_src):
    from pitfeat.ops import windows as W

    out = stream_sessionize(stream_src, gap="30 minutes", watermark="10 seconds")
    _run(out, "sessions", mode="complete")
    got = spark.sql("select * from sessions").toPandas()
    # batch oracle: W9 with the same 1800s gap
    batch = (
        W.session_summaries(W.sessionize(transcripts, gap_s=1800))
        .toPandas()
    )
    # session_window merges by gap exactly like W9: same session count per conv
    g_got = got.groupby("conv_id").size().sort_index()
    g_batch = batch.groupby("conv_id").size().sort_index()
    assert (g_got == g_batch).all()
    assert got["n_turns"].sum() == len(transcripts.toPandas())
    # tool-call totals agree
    assert got["tool_calls"].sum() == batch["tool_calls"].sum()


def test_stream_dedup(spark, transcripts, tmp_path):
    p = str(tmp_path / "dup")
    doubled = transcripts.unionByName(transcripts)
    doubled.write.mode("overwrite").parquet(p)
    schema = spark.read.parquet(p).schema
    src = spark.readStream.schema(schema).parquet(p)
    out = stream_dedup(src, keys=["conv_id", "turn_idx"], watermark="1 hour")
    _run(out, "dedup")
    got = spark.sql("select count(*) c from dedup").collect()[0]["c"]
    assert got == transcripts.count()


def test_stream_rolling_counts(spark, transcripts, stream_src):
    out = stream_rolling(stream_src, window="1 hour", slide="30 minutes", watermark="10 seconds")
    _run(out, "rolling", mode="complete")
    got = spark.sql("select sum(n_turns) s from rolling").collect()[0]["s"]
    # each row lands in exactly window/slide = 2 sliding windows
    assert got == 2 * transcripts.count()


def test_asof_microbatch_equals_batch(spark, transcripts, snapshots, stream_src):
    from pitfeat.ops.asof import asof_join

    transform = asof_features_microbatch(snapshots)
    rows = {}

    def sink(batch_df, batch_id):
        out = transform(batch_df)
        rows[batch_id] = out.toPandas()

    q = stream_src.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    import pandas as pd

    got = (
        pd.concat(rows.values())
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        asof_join(transcripts, snapshots)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
