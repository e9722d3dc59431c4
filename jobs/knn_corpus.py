"""spark-submit entry point: corpus-wide KNN / semantic dedup as a batch job.

    spark-submit --master local[8] jobs/knn_corpus.py \
        --input embeddings.parquet --out OUT_DIR --k 10 --method ivf
    spark-submit ... --method lsh --nbits 4 --tables 8
    spark-submit ... --semantic-dedup --threshold 0.97

Runs pitfeat.ops.similarity.knn_join over an embedding table (default
columns vec_id / embedding) and writes the neighbor table
(id, nbr_id, cosine, rank). With ``--semantic-dedup`` it instead writes
the SURVIVOR corpus: any row whose top-1 neighbor has cosine >= threshold
and a LOWER id is dropped — the same min-id-keeper rule as the text dedup
job, driven by embedding similarity (the standard semantic-dedup pass of a
training-data pipeline).

``--resume RUN_ID`` checkpoints the neighbor table (the expensive stage)
through pitfeat.checkpoint.resume_or_compute: a re-run after a crash reads
the committed table; any parameter or input change invalidates it via the
lineage hash. Prints one JSON line: rows in/out, seconds.
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

from pitfeat.checkpoint import resume_or_compute
from pitfeat.ops.similarity import knn_join


def _config_hash(args) -> str:
    import hashlib

    key = json.dumps(
        {
            k: getattr(args, k)
            for k in (
                "method", "k", "id_col", "vec_col",
                "nbits", "tables", "nlist", "nprobe", "max_bucket",
                "max_probers",
            )
        },
        sort_keys=True,
    )
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def run(spark: SparkSession, args) -> dict:
    df = spark.read.parquet(args.input)
    n_in = df.count()
    t0 = time.perf_counter()

    def compute():
        return knn_join(
            df,
            k=args.k,
            id_col=args.id_col,
            vec_col=args.vec_col,
            method=args.method,
            nbits=args.nbits,
            tables=args.tables,
            nlist=args.nlist,
            nprobe=args.nprobe,
            max_bucket=args.max_bucket,
            max_probers=args.max_probers,
        )

    resumed = False
    if args.resume:
        ckpt = os.path.join(args.ckpt_root, args.resume, "knn")
        nbrs, resumed = resume_or_compute(
            spark, ckpt, "knn", _config_hash(args), compute, inputs=[args.input]
        )
    else:
        nbrs = compute()

    if args.semantic_dedup:
        # drop rows whose top-1 neighbor is a LOWER id at/above the cosine
        # threshold (min-id keeper; asymmetric on id so one of each
        # near-dup pair always survives)
        losers = (
            nbrs.where(
                (F.col("rank") == 1)
                & (F.col("cosine") >= args.threshold)
                & (F.col("nbr_id") < F.col(args.id_col))
            )
            .select(args.id_col)
            .distinct()
        )
        out = df.join(losers, args.id_col, "left_anti")
    else:
        out = nbrs

    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
    else:
        n_out = out.count()
    return {
        "method": args.method,
        "rows_in": n_in,
        "rows_out": n_out,
        "semantic_dedup": bool(args.semantic_dedup),
        "resumed": resumed,
        "sec": round(time.perf_counter() - t0, 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", default=None, help="output parquet dir; omit to only count")
    ap.add_argument("--method", choices=["lsh", "ivf", "exact"], default="ivf")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--nbits", type=int, default=2)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--nlist", type=int, default=16)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--max-bucket", type=int, default=4096)
    ap.add_argument("--max-probers", type=int, default=16384,
                    help="ivf only: grid-split lists above this many probers")
    ap.add_argument("--semantic-dedup", action="store_true",
                    help="write the survivor corpus instead of the neighbor table")
    ap.add_argument("--threshold", type=float, default=0.97,
                    help="semantic-dedup cosine cutoff on the top-1 neighbor")
    ap.add_argument("--resume", default=None, help="run id: checkpoint/resume the neighbor stage")
    ap.add_argument("--ckpt-root", default="/tmp/pitfeat_ckpt")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pitfeat-knn").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")
    res = run(spark, args)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
