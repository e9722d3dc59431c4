"""Extra benchmark harness for the r8 optimization round (guide §1.4).

NOT the driver-timed bench (bench.py is frozen); this file exists to
isolate and iterate on individual queries: same data dir / core-count env
contract, same force-full-evaluation methodology as bench.py, plus
optional .explain("formatted") capture to plans/r08/.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py s6 d2 t3
    ... python bench_extra.py --plans --trials 1 s6      # also dump plans
    ... python bench_extra.py all
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pitfeat.session import get_spark
from pyspark.sql import functions as F


def force_eval(df) -> int:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64(struct({', '.join(df.columns)})))").alias("chk"),
    ).collect()[0]
    return row["n"]


SHORT = {
    "s6": "s6_knn_corpus",
    "s4c": "s4_ivf_clustered",
    "d2": "d2_minhash_lsh",
    "t3": "t3_quality",
    "fl": "flagship_pit_features",
    "j1m": "j1_asof_merge",
    "j1n": "j1_merge_nearest",
    "j1b": "j1_asof_backward",
    "j2": "j2_asof_salted",
    "j6": "j6_prev_session",
    "w3": "w3_rolling",
    "w9": "w9_sessionize",
    "w11": "w11_ewma",
    "w12": "w12_ewma_time",
    "a1": "a1_grouped_agg",
    "a4": "a4_minmax_normalize",
    "s1": "s1_cosine_topk",
    "s2": "s2_lsh_topk",
    "s4": "s4_ivf_topk",
}


def main():
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    args = [a for a in args if not a.startswith("--plans")]
    trials = 2
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]
    names = args or ["s6"]
    if names == ["all"]:
        names = list(SHORT)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("pitfeat-bench-extra", master=f"local[{cpus}]")
    qs = dict(entrymod.queries())

    # reproduce bench.py's fixture + pretrained codebook for the s6/s4c rows
    need_fixture = any(SHORT.get(n, n) in ("s6_knn_corpus", "s4_ivf_clustered") for n in names)
    if need_fixture:
        import atexit
        import shutil
        import tempfile

        from pitfeat.ops.similarity import _kmeans_centroids, ivf_topk, knn_join
        from pitfeat.synth import gen_clustered_embeddings

        sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        sf_num = float(sf_tag) if sf_tag.replace(".", "").isdigit() else 0.1
        n_clustered = max(6_000, int(500_000 * sf_num))
        clustered_dir = tempfile.mkdtemp(prefix="pitfeat_benchx_clustered_")
        atexit.register(shutil.rmtree, clustered_dir, ignore_errors=True)
        gen_clustered_embeddings(spark, n_clustered, dim=64, n_centers=32, seed=42).write.mode(
            "overwrite"
        ).parquet(clustered_dir)
        t0 = time.perf_counter()
        s6_centroids = _kmeans_centroids(
            spark.read.parquet(clustered_dir), "embedding", "vec_id", 64, 64, seed=42
        )
        print(f"# codebook train {time.perf_counter() - t0:.2f}s", file=sys.stderr)

        def s6_knn_corpus(spark_, _sf):
            e = spark_.read.parquet(clustered_dir)
            return knn_join(e, k=10, method="ivf", nlist=64, nprobe=8, centroids=s6_centroids)

        def s4_clustered(spark_, _sf):
            e = spark_.read.parquet(clustered_dir)
            qset = e.where(F.col("vec_id") < 32).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            return ivf_topk(e, qset, k=10, nlist=16, nprobe=4)

        qs["s6_knn_corpus"] = s6_knn_corpus
        qs["s4_ivf_clustered"] = s4_clustered

    # worker-pool warmup, same as bench.py
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(int(cpus) if str(cpus).isdigit() else 32).select(warm("id")).collect()

    os.makedirs("plans/r08", exist_ok=True)
    out = {}
    for n in names:
        name = SHORT.get(n, n)
        fn = qs[name]
        if dump_plans:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"plans/r08/{name}_current.txt", "w") as f:
                f.write(plan)
        ts = []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            rows = force_eval(fn(spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"times": ts, "min": min(ts), "rows": rows}
        print(f"{name:24s} min={min(ts):8.3f}  {ts} rows={rows}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
