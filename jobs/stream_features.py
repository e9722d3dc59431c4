"""spark-submit entry point: streaming point-in-time features.

    spark-submit jobs/stream_features.py \
        --turns-dir TURNS_STREAM_DIR --snapshots-dir SNAPS_STREAM_DIR \
        --out OUT_DIR --checkpoint CKPT_DIR [--features f_0 f_1 ...] \
        [--available-now]

Both inputs are file-source STREAMS of parquet drops (new files appear over
time); output is a parquet sink of per-turn PIT feature rows produced by the
custom stateful operator (pitfeat.streaming.stream_pit_features: per-conv
snapshot history + binary search — batch-J1 semantics under any micro-batch
interleaving, zero temporal leakage).

``--available-now`` processes everything currently in the input dirs and
exits (Trigger.AvailableNow) — batch-like runs and tests; omit it for a
continuous query. Prints one JSON line with rows written on termination
(available-now mode only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from pitfeat.schema import TRANSCRIPTS_SCHEMA, snapshot_feature_cols, snapshots_schema
from pitfeat.streaming import stream_pit_features


def run(spark: SparkSession, args) -> dict:
    feats = args.features or snapshot_feature_cols(args.width)
    turns = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(args.turns_dir)
    )
    snaps = (
        spark.readStream.schema(snapshots_schema(args.width))
        .parquet(args.snapshots_dir)
    )
    out = stream_pit_features(turns, snaps, feature_cols=feats)
    writer = (
        out.writeStream.format("parquet")
        .option("path", args.out)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
    )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        n = spark.read.parquet(args.out).count()
        return {"rows": n, "out": args.out, "mode": "available_now"}
    q = writer.start()
    q.awaitTermination()
    return {"out": args.out, "mode": "continuous"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns-dir", required=True)
    ap.add_argument("--snapshots-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--features", nargs="*", default=None)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--available-now", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pitfeat-stream-features").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.sparkContext.setLogLevel("WARN")
    res = run(spark, args)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
