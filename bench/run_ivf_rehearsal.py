"""IVF recall rehearsal at realistic list counts (VERDICT r4 #6).

All prior recall evidence ran at nlist=16; real IVF deployments run
hundreds-to-thousands of inverted lists. This rehearsal measures, at a
corpus size where nlist=256 is a sane configuration (default 1M x dim-64
clustered vectors), recall@10 and the candidate fraction (the probed share
of the corpus — the cost knob) across an nprobe sweep, plus wall-clock for
the full top-k query. Results land in BASELINE.md's rehearsal table.

    python bench/run_ivf_rehearsal.py [--n 1000000] [--nlist 256] \
        [--nprobe 8 16 32] [--centers 256] [--queries 32]

Deterministic end to end: the fixture is a pure function of vec_id
(gen_clustered_embeddings), training is the hash-cut sample k-means, and
the engine is bit-stable across partitionings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pitfeat.ops.similarity import (
    _ivf_lists_udf,
    _kmeans_centroids,
    cosine_topk,
    ivf_topk,
)
from pitfeat.session import get_spark
from pitfeat.synth import gen_clustered_embeddings


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--nprobe", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args(argv)

    spark = get_spark("ivf-rehearsal", master=f"local[{args.cpus}]")
    d = tempfile.mkdtemp(prefix="pitfeat_ivf_rehearsal_")
    gen_clustered_embeddings(
        spark, args.n, dim=args.dim, n_centers=args.centers, seed=42
    ).write.mode("overwrite").parquet(d)
    e = spark.read.parquet(d)
    qset = e.where(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # warm the Python worker pool (one-time startup is not per-query cost)
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(int(args.cpus)).select(warm("id")).collect()

    # train once; reuse the codebook across the nprobe sweep (the
    # deployment shape: train daily, probe per query)
    t0 = time.perf_counter()
    C = _kmeans_centroids(e, "embedding", "vec_id", args.nlist, args.dim, seed=42)
    train_s = time.perf_counter() - t0

    exact_sets: dict[int, set] = {}
    t0 = time.perf_counter()
    for r in cosine_topk(e, qset, k=10).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    exact_s = time.perf_counter() - t0

    # list sizes once (for candidate fractions)
    sizes = {
        r.list_id: r.n
        for r in e.select(
            F.element_at(_ivf_lists_udf(C, args.dim, 1)("embedding"), 1).alias(
                "list_id"
            )
        )
        .groupBy("list_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    rows = []
    for nprobe in args.nprobe:
        t0 = time.perf_counter()
        got: dict[int, set] = {}
        for r in ivf_topk(
            e, qset, k=10, nlist=args.nlist, nprobe=nprobe, dim=args.dim, centroids=C
        ).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        wall = time.perf_counter() - t0
        recall = sum(
            len(exact_sets[q] & got.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ) / len(exact_sets)
        probes = qset.select(
            F.explode(_ivf_lists_udf(C, args.dim, nprobe)("embedding")).alias("l")
        ).collect()
        frac = sum(sizes.get(r.l, 0) for r in probes) / (len(exact_sets) * args.n)
        rows.append(
            {
                "nprobe": nprobe,
                "recall_at10": round(recall, 4),
                "cand_fraction": round(frac, 4),
                "wall_s": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(
        json.dumps(
            {
                "n": args.n,
                "dim": args.dim,
                "centers": args.centers,
                "nlist": args.nlist,
                "train_s": round(train_s, 2),
                "exact_wall_s": round(exact_s, 2),
                "sweep": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
