"""spark-submit entry point: cluster a feature/embedding table and score
the clusters against labels — the reference pipeline's final stage
(SURVEY.md §1.2 clustering row; pitfeat.ops.cluster) as a batch-job surface.

    spark-submit --master local[8] jobs/cluster_corpus.py \
        --input embeddings.parquet --k 16 --out OUT_DIR
    spark-submit ... --label-col label --scores-out SCORES_DIR --n-init 3

Reads a parquet table with an ``array<numeric>`` vector column (default
vec_id / embedding), fits KMeans (``cluster_features`` — sklearn-style
``--n-init`` best-of-N by training cost), writes the cluster-assigned table
to ``--out``, and, when ``--label-col`` is given, writes the per-(cluster,
label) contingency/lift table (``score_clusters``) to ``--scores-out`` (or
prints its row count). Prints one JSON line: rows, k, chosen model's
training cost, seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from pitfeat.ops.cluster import cluster_features, score_clusters


def run(spark: SparkSession, args) -> dict:
    df = spark.read.parquet(args.input)
    n_in = df.count()
    t0 = time.perf_counter()
    assigned, model = cluster_features(
        df,
        args.k,
        vec_col=args.vec_col,
        out_col=args.cluster_col,
        seed=args.seed,
        max_iter=args.max_iter,
        n_init=args.n_init,
    )
    if args.out:
        assigned.write.mode("overwrite").parquet(args.out)
        assigned = spark.read.parquet(args.out)
    res = {
        "rows": n_in,
        "k": args.k,
        "n_init": args.n_init,
        "training_cost": round(float(model.summary.trainingCost), 3),
    }
    if args.label_col:
        scores = score_clusters(
            assigned, label_col=args.label_col, cluster_col=args.cluster_col
        )
        if args.scores_out:
            scores.write.mode("overwrite").parquet(args.scores_out)
            res["score_rows"] = spark.read.parquet(args.scores_out).count()
        else:
            res["score_rows"] = scores.count()
    elif not args.out:
        # no sink at all: still force the fit's assignment projection once
        res["assigned_rows"] = assigned.count()
    res["sec"] = round(time.perf_counter() - t0, 3)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", default=None, help="parquet dir for the cluster-assigned table; omit to only count")
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--cluster-col", default="cluster")
    ap.add_argument("--label-col", default=None,
                    help="score clusters against this label column (score_clusters)")
    ap.add_argument("--scores-out", default=None, help="parquet dir for the contingency/lift table")
    ap.add_argument("--n-init", type=int, default=1,
                    help="fit N models at seeds seed..seed+N-1, keep lowest training cost")
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pitfeat-cluster").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")
    res = run(spark, args)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
