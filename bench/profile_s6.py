"""Stage-level profile of s6_knn_corpus (r8): run once with the UI enabled
and dump per-stage executor metrics from the REST API."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pitfeat.session import get_spark
from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile-s6", master=f"local[{cpus}]", extra_conf={"spark.ui.enabled": "true"}
    )

    import atexit
    import shutil
    import tempfile

    from pitfeat.ops.similarity import _kmeans_centroids, knn_join
    from pitfeat.synth import gen_clustered_embeddings

    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_num = float(sf_tag) if sf_tag.replace(".", "").isdigit() else 0.1
    n_clustered = max(6_000, int(500_000 * sf_num))
    clustered_dir = tempfile.mkdtemp(prefix="pitfeat_prof_clustered_")
    atexit.register(shutil.rmtree, clustered_dir, ignore_errors=True)
    gen_clustered_embeddings(spark, n_clustered, dim=64, n_centers=32, seed=42).write.mode(
        "overwrite"
    ).parquet(clustered_dir)
    C = _kmeans_centroids(
        spark.read.parquet(clustered_dir), "embedding", "vec_id", 64, 64, seed=42
    )

    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(32).select(warm("id")).collect()

    e = spark.read.parquet(clustered_dir)
    out = knn_join(e, k=10, method="ivf", nlist=64, nprobe=8, centroids=C)
    t0 = time.perf_counter()
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64(struct({', '.join(out.columns)})))").alias("chk"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(f"# wall {wall:.2f}s rows {row['n']}", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = []
    for s in stages:
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "exec_run_s": round(s["executorRunTime"] / 1000, 1),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "out_rows": s.get("outputRecords", 0),
                "submit": s.get("submissionTime", ""),
                "complete": s.get("completionTime", ""),
            }
        )
    rows.sort(key=lambda r: -r["exec_run_s"])
    for r in rows[:18]:
        print(
            f"stage {r['stage']:>3} run={r['exec_run_s']:>7}s cpu={r['cpu_s']:>7}s "
            f"tasks={r['tasks']:>3} shR={r['sh_read_mb']:>8} shW={r['sh_write_mb']:>8} "
            f"in={r['in_mb']:>8}  {r['name']}"
        )
    print(json.dumps({"wall_s": round(wall, 2)}))


if __name__ == "__main__":
    main()
