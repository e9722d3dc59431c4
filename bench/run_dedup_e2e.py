"""End-to-end component-survivor dedup rehearsal (VERDICT r6 #5).

The CC rehearsal (run_cc_rehearsal.py) and the r4 200k-doc d2 written-path
run proved the stages separately; this drives the FULL CLI surface —
``python jobs/dedup_corpus.py --method minhash --survivor component`` — over
a 200k-doc planted corpus and verifies the composed
pairs -> components -> survivors pipeline against a CLOSED FORM.

Planted corpus (pure function of doc_id — deterministic at any parallelism):

- 20,000 "wedge" clusters occupying doc_ids [3g, 3g+2]: three 42-token
  windows over one seeded token stream, laid out so the BRIDGE window gets
  the highest id —
      A = 3g   -> stream[0:42],   C = 3g+1 -> stream[10:52],
      B = 3g+2 -> stream[5:47]
  Shared contiguous runs give shingle-Jaccard A~B = B~C = 35/45 = 0.778
  (>= threshold 0.7) and A~C = 30/50 = 0.600 (< 0.7): the pair graph is
  exactly the wedge (A,B), (C,B).
- 140,000 word-salad singletons (ids 60,000..199,999, disjoint streams).

Closed form: pairs = 2/cluster = 40,000; components = 20,000 wedges;
``--survivor component`` keeps min-id per wedge + singletons = 160,000 docs
(ids: every id >= 60,000, plus every id % 3 == 0 below);
``--survivor edge`` keeps BOTH A and C (they are not near-dups of each
other) = 180,000 — the measured discriminating gap between the two rules.

Banding at rows-per-band 1 (num-hashes 32 = bands 32) makes candidate-miss
probability (1 - 0.778)^32 ~ 4e-21: the LSH stage is exact here by
construction, so EXACT set equality is the pass criterion, not recall.

Usage:
    python bench/run_dedup_e2e.py [--docs 200000] [--out-json PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SEED = 20260817


def gen_corpus(spark: SparkSession, n_docs: int):
    """(doc_id, text) with the wedge/singleton layout above; n_docs must be
    >= 60000 and the first 60000 ids form the 20000 wedges."""
    if n_docs < 60_000:
        raise ValueError("need >= 60000 docs for the planted wedge block")
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    g = (F.col("doc_id") / 3).cast("long")
    slot = F.col("doc_id") % 3  # 0 = A, 1 = C, 2 = B
    start = F.when(slot == 0, 0).when(slot == 1, 10).otherwise(5)
    # singletons draw from per-doc streams far above the cluster streams
    stream = F.when(F.col("doc_id") < 60_000, g).otherwise(
        F.col("doc_id") + F.lit(10_000_000)
    )
    sstart = F.when(F.col("doc_id") < 60_000, start).otherwise(F.lit(0))
    # token(p) = hex of a seeded hash of (stream, p); seed FIRST (the r2
    # xxhash64 left-fold lesson), stream spaced so positions never collide
    tok = lambda p: F.lower(
        F.hex(F.xxhash64(F.lit(SEED), stream * F.lit(1_000_003) + p))
    )
    toks = F.transform(F.sequence(sstart, sstart + F.lit(41)), tok)
    return ids.select("doc_id", F.array_join(toks, " ").alias("text"))


def run_cli(input_dir: str, out_dir: str, survivor: str, pairs_only: bool = False):
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "jobs", "dedup_corpus.py"),
        "--input", input_dir,
        "--out", out_dir,
        "--method", "minhash",
        "--threshold", "0.7",
        "--num-hashes", "32",
        "--bands", "32",
        "--survivor", survivor,
    ]
    if pairs_only:
        cmd.append("--pairs-only")
    # the CLI builds its own SparkSession (getOrCreate, no memory config);
    # at the default 1g heap the 32-band signature job OOMs — size the child
    # JVM the way a spark-submit deployment would
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 32g pyspark-shell"
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1800, env=env
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"CLI failed rc={proc.returncode}:\n{proc.stderr[-3000:]}")
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    return stats, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dedup-e2e")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    import atexit
    import shutil

    work = tempfile.mkdtemp(prefix="pitfeat_dedup_e2e_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    corpus = os.path.join(work, "corpus")
    gen_corpus(spark, args.docs).write.mode("overwrite").parquet(corpus)

    n_clusters = 20_000
    singles = args.docs - 60_000
    expected = {
        "pairs": 2 * n_clusters,
        "component_survivors": singles + n_clusters,
        "edge_survivors": singles + 2 * n_clusters,
    }

    results = {"docs": args.docs, "expected": expected}

    # the headline timed run: full CLI, component survivor
    out_comp = os.path.join(work, "out_component")
    stats, wall = run_cli(corpus, out_comp, "component")
    surv = spark.read.parquet(out_comp)
    ok_set = surv.where(
        (F.col("doc_id") >= 60_000) | (F.col("doc_id") % 3 == 0)
    ).count()
    n_surv = surv.count()
    chk = surv.agg(F.bit_xor(F.xxhash64("doc_id")).alias("c")).collect()[0]["c"]
    results["component"] = {
        "survivors": n_surv,
        "survivors_in_closed_form_set": ok_set,
        "exact": n_surv == expected["component_survivors"] == ok_set,
        "survivor_id_checksum": chk,
        "cli_wall_sec": round(wall, 1),
        "cli_reported_sec": stats["sec"],
        "docs_per_sec": round(args.docs / stats["sec"], 1),
    }

    # untimed cross-checks: pair count and the edge-rule discriminating gap
    out_pairs = os.path.join(work, "out_pairs")
    pstats, _ = run_cli(corpus, out_pairs, "edge", pairs_only=True)
    results["pairs"] = {
        "n": pstats["rows_out"],
        "exact": pstats["rows_out"] == expected["pairs"],
    }
    out_edge = os.path.join(work, "out_edge")
    estats, _ = run_cli(corpus, out_edge, "edge")
    results["edge"] = {
        "survivors": estats["rows_out"],
        "exact": estats["rows_out"] == expected["edge_survivors"],
    }
    results["rules_differ_by"] = estats["rows_out"] - n_surv

    print(json.dumps(results, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)
    ok = (
        results["component"]["exact"]
        and results["pairs"]["exact"]
        and results["edge"]["exact"]
    )
    print("E2E", "EXACT" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
