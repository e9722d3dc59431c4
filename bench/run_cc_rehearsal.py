"""Connected-components scale rehearsal: alternating-star over a graph with
KNOWN structure, so correctness is exact (no sampling) and the round count
verifies the O(log n) convergence claim against the worst realistic shape.

Graph (deterministic, generated in Spark):
- ``--cliques`` disjoint 4-cliques (nodes 4i..4i+3, 6 edges each) — the
  dense tiny-cluster shape real near-dup graphs are made of;
- ONE ``--chain``-node path appended after the cliques — the adversarial
  diameter case (naive min-label propagation would need ``chain`` rounds;
  alternating star needs ~log2).

Validates: exact component count (cliques + 1), exact chain label, and
wall/rounds. Usage:
    python bench/run_cc_rehearsal.py [--cliques 500000] [--chain 200000]
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

from pitfeat.ops.dedup import connected_components


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cliques", type=int, default=500_000)
    ap.add_argument("--chain", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("pitfeat-cc-rehearsal")
        .master(f"local[{args.cpus}]")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # 4-cliques: for clique i, nodes (4i..4i+3) — all 6 unordered pairs
    cl = spark.range(args.cliques).select(
        F.explode(
            F.expr(
                "transform(array(struct(0 AS a, 1 AS b), struct(0 AS a, 2 AS b), "
                "struct(0 AS a, 3 AS b), struct(1 AS a, 2 AS b), "
                "struct(1 AS a, 3 AS b), struct(2 AS a, 3 AS b)), "
                "s -> struct(id * 4 + s.a AS id_a, id * 4 + s.b AS id_b))"
            )
        ).alias("e")
    ).select("e.id_a", "e.id_b")
    chain_base = args.cliques * 4
    ch = spark.range(args.chain - 1).select(
        (F.col("id") + chain_base).alias("id_a"),
        (F.col("id") + chain_base + 1).alias("id_b"),
    )
    edges = cl.unionByName(ch)
    n_edges = edges.count()  # materialize input outside the timed region

    stats: dict = {}
    t0 = time.perf_counter()
    cc = connected_components(edges, stats=stats)
    row = cc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("component").alias("n_components"),
        F.bit_xor(F.xxhash64(F.lit(7), "id", "component")).alias("chk"),
    ).collect()[0]
    wall = time.perf_counter() - t0

    chain_ok = (
        cc.where(F.col("id") >= chain_base)
        .where(F.col("component") != chain_base)
        .count()
        == 0
    )
    expected_nodes = args.cliques * 4 + args.chain
    expected_components = args.cliques + 1
    print(
        json.dumps(
            {
                "edges": n_edges,
                "nodes": int(row["n_nodes"]),
                "components": int(row["n_components"]),
                "expected_nodes": expected_nodes,
                "expected_components": expected_components,
                "exact_match": bool(
                    row["n_nodes"] == expected_nodes
                    and row["n_components"] == expected_components
                    and chain_ok
                ),
                "chain_label_ok": bool(chain_ok),
                "rounds": stats.get("rounds"),
                "wall_s": round(wall, 2),
                "edges_per_sec": round(n_edges / wall, 1),
                "out_checksum": int(row["chk"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
