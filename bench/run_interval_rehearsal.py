"""Interval-join scale rehearsal: grid-bucketed keyless join at a size the
naive BroadcastNestedLoopJoin plan cannot touch (1M x ~100k = 10^11 pair
visits), with a CLOSED-FORM expected output so correctness is exact.

Fixture: points every 10 s over [0, 10^7 s); intervals [k*100, k*100+250)
for k in 0..n_iv. Every interval covers exactly 25 points (250/10, exact
alignment), so the expected pair count is n_iv * 25 — no sampling, no
tolerance. Usage:
    python bench/run_interval_rehearsal.py [--points 1000000] [--intervals 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pitfeat.ops.intervals import interval_join


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--intervals", type=int, default=99_900)
    ap.add_argument("--bucket-width-s", type=float, default=3600.0)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("pitfeat-interval-rehearsal")
        .master(f"local[{args.cpus}]")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    base_us = 1_700_000_000_000_000  # fixed epoch base, deterministic
    pts = spark.range(args.points).select(
        F.col("id").alias("pid"),
        F.timestamp_micros(F.lit(base_us) + F.col("id") * 10_000_000).alias("ts"),
    )
    ivs = spark.range(args.intervals).select(
        F.col("id").alias("iv_id"),
        F.timestamp_micros(F.lit(base_us) + F.col("id") * 100_000_000).alias("iv_start"),
        F.timestamp_micros(
            F.lit(base_us) + F.col("id") * 100_000_000 + 250_000_000
        ).alias("iv_end"),
    )
    # expected: interval k covers points with ts in [k*100s, k*100s+250s) at
    # 10 s spacing = exactly 25 points, provided the interval lies inside
    # the point range (enforce by construction: intervals * 100 + 250 <=
    # points * 10)
    assert args.intervals * 100 + 250 <= args.points * 10, "intervals overrun points"
    expected = args.intervals * 25

    t0 = time.perf_counter()
    out = interval_join(pts, ivs, ts="ts", bucket_width_s=args.bucket_width_s)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.lit(3), "pid", "iv_id")).alias("chk"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "points": args.points,
                "intervals": args.intervals,
                "bucket_width_s": args.bucket_width_s,
                "pairs": int(row["n"]),
                "expected_pairs": expected,
                "exact_match": bool(row["n"] == expected),
                "wall_s": round(wall, 2),
                "pairs_per_sec": round(row["n"] / wall, 1),
                "out_checksum": int(row["chk"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
