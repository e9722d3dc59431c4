"""Corpus-wide KNN rehearsal at engine scale (round 5).

Runs knn_join over a large clustered corpus (default 1M x dim-64,
256 components) at the rehearsal-evidenced IVF probe shape and reports
wall-clock plus planted-twin top-1 accuracy — the semantic-dedup signal:
the corpus carries ``--twins`` exact duplicates (vec_id + 10^9), and every
twin pair must find its partner at rank 1 with cosine 1.0 (identical
vectors share an inverted list, so the ANN miss probability is exactly
zero — this checks the kernel/dedup/rank pipeline at scale, not recall
luck).

    python bench/run_knn_rehearsal.py [--n 1000000] [--nlist 256] \
        [--nprobe 8] [--k 10] [--twins 1000]
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

from pitfeat.ops.similarity import knn_join
from pitfeat.session import get_spark
from pitfeat.synth import gen_clustered_embeddings


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--twins", type=int, default=1000)
    ap.add_argument("--max-bucket", type=int, default=16384)
    ap.add_argument("--max-probers", type=int, default=16384)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args(argv)

    spark = get_spark("knn-rehearsal", master=f"local[{args.cpus}]")
    d = tempfile.mkdtemp(prefix="pitfeat_knn_rehearsal_")
    base = gen_clustered_embeddings(
        spark, args.n, dim=args.dim, n_centers=args.centers, seed=42
    )
    twins = base.where(F.col("vec_id") < args.twins).select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding"
    )
    base.unionByName(twins).write.mode("overwrite").parquet(d)
    e = spark.read.parquet(d)

    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(int(args.cpus)).select(warm("id")).collect()

    t0 = time.perf_counter()
    out = knn_join(
        e, k=args.k, method="ivf", nlist=args.nlist, nprobe=args.nprobe,
        dim=args.dim, max_bucket=args.max_bucket,
        max_probers=args.max_probers,
    )
    agg_row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(struct(vec_id, nbr_id, cosine, rank)))").alias("chk"),
    ).collect()[0]
    n_rows, out_chk = agg_row["n"], agg_row["chk"]
    wall = time.perf_counter() - t0

    # planted-twin check: top-1 neighbor of each twin/original is its partner
    top1 = {
        r.vec_id: (r.nbr_id, r.cosine)
        for r in out.where(
            (F.col("rank") == 1)
            & ((F.col("vec_id") < args.twins) | (F.col("vec_id") >= 1_000_000_000))
        ).collect()
    }
    hits = sum(
        1
        for i in range(args.twins)
        if top1.get(i, (None,))[0] == i + 1_000_000_000
        and top1.get(i + 1_000_000_000, (None,))[0] == i
    )
    print(
        json.dumps(
            {
                "n": args.n + args.twins,
                "dim": args.dim,
                "nlist": args.nlist,
                "nprobe": args.nprobe,
                "k": args.k,
                "wall_s": round(wall, 2),
                "rows_out": n_rows,
                # determinism evidence (ADVICE r5: was computed but never
                # reported): identical config + fixture => identical chk
                "out_checksum": int(out_chk),
                "rows_per_sec": round((args.n + args.twins) / wall, 1),
                "twin_pairs": args.twins,
                "twin_pairs_top1_both_ways": hits,
            }
        )
    )


if __name__ == "__main__":
    main()
