"""spark-submit entry point: corpus deduplication as a batch job.

    spark-submit --master local[8] jobs/dedup_corpus.py \
        --input docs.parquet --out OUT_DIR --method exact
    spark-submit ... --method minhash --threshold 0.7 --sig-path s3://...  \
        [--pairs-only]
    spark-submit ... --method simhash --max-hamming 3 [--pairs-only]

Methods (pitfeat.ops.dedup):
- ``exact``   — 128-bit normalized-text fingerprint groupBy, min-id keeper;
                writes the deduplicated corpus.
- ``minhash`` — MinHash+LSH banded candidates, exact-Jaccard verify; with
                ``--pairs-only`` writes the near-dup pair table, else drops
                every doc that near-duplicates a lower id and writes the
                surviving corpus.
- ``simhash`` — SimHash + pigeonhole segment LSH at ``--max-hamming``; same
                output modes.

On a real cluster pass ``--sig-path`` pointing at shared storage (the
signature/bucket tables are written tables; see dedup._scratch_dir).
``--resume RUN_ID`` checkpoints the near-dup PAIR table (the expensive
LSH candidate+verify stage) through pitfeat.checkpoint.resume_or_compute —
same staged-resume discipline as jobs/build_features.py: a re-run after a
crash reads the committed pair table instead of recomputing it, and a
param/input change invalidates the checkpoint via the lineage hash.
Prints one JSON line: rows in, rows out (or pairs), seconds.
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
from pitfeat.ops.dedup import exact_dedup, minhash_lsh_pairs, simhash_near_pairs


def _config_hash(args) -> str:
    """Per-run config fingerprint for checkpoint lineage: any change to the
    dedup-relevant parameters must invalidate a resumed pair table."""
    import hashlib

    key = json.dumps(
        {
            k: getattr(args, k)
            for k in ("method", "text_col", "id_col", "threshold", "max_hamming",
                      "num_hashes", "bands")
        },
        sort_keys=True,
    )
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def run(spark: SparkSession, args) -> dict:
    df = spark.read.parquet(args.input)
    n_in = df.count()
    t0 = time.perf_counter()
    resumed_pairs = False
    if args.method == "exact":
        out = exact_dedup(df, text_col=args.text_col, id_col=args.id_col)
        pairs = None
    else:
        def compute_pairs():
            if args.method == "minhash":
                return minhash_lsh_pairs(
                    df,
                    text_col=args.text_col,
                    id_col=args.id_col,
                    num_hashes=args.num_hashes,
                    bands=args.bands,
                    threshold=args.threshold,
                    sig_path=args.sig_path,
                )
            return simhash_near_pairs(
                df,
                text_col=args.text_col,
                id_col=args.id_col,
                max_hamming=args.max_hamming,
                sig_path=args.sig_path,
            )

        if args.resume:
            ckpt = os.path.join(args.ckpt_root, args.resume, "pairs")
            pairs, resumed_pairs = resume_or_compute(
                spark,
                ckpt,
                "pairs",
                _config_hash(args),
                compute_pairs,
                inputs=[args.input],
            )
        else:
            pairs = compute_pairs()
        if args.pairs_only:
            out = pairs
        elif args.survivor == "component":
            # cluster-level rule (r6): connected components over the pair
            # graph, keep exactly the min-id doc of every component — the
            # published-standard MinHash-dedup clustering (near-dup
            # similarity is not transitive, so chains collapse to ONE
            # survivor here). Docs in no pair survive untouched.
            from pitfeat.ops.dedup import connected_components

            cc = connected_components(pairs)
            losers = cc.where(F.col("id") != F.col("component")).select(
                F.col("id").alias(args.id_col)
            )
            out = df.join(losers, args.id_col, "left_anti")
        else:
            # edge-level rule (default, the r3-r5 behavior): drop any doc
            # that near-duplicates a LOWER id — broadcastable anti-join on
            # the (small-by-construction) pair table's id_b side. Differs
            # from `component` on non-transitive structure: a star
            # (a,c),(b,c) with a<b<c keeps BOTH a and b here (they are not
            # near-dups of each other) but only a under `component`.
            losers = pairs.select(F.col("id_b").alias(args.id_col)).distinct()
            out = df.join(losers, args.id_col, "left_anti")
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
    else:
        n_out = out.count()
    return {
        "method": args.method,
        "rows_in": n_in,
        "rows_out": n_out,
        "pairs_only": bool(args.pairs_only and args.method != "exact"),
        "resumed_pairs": resumed_pairs,
        "sec": round(time.perf_counter() - t0, 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", default=None, help="output parquet dir; omit to only count")
    ap.add_argument("--method", choices=["exact", "minhash", "simhash"], default="exact")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold", type=float, default=0.7, help="minhash Jaccard cutoff")
    ap.add_argument("--num-hashes", type=int, default=32, help="minhash signature length")
    ap.add_argument("--bands", type=int, default=8,
                    help="LSH bands (rows per band = num-hashes/bands; more"
                    " bands -> higher candidate recall at lower thresholds)")
    ap.add_argument("--max-hamming", type=int, default=3, help="simhash distance cutoff")
    ap.add_argument("--sig-path", default=None, help="shared-storage dir for signature tables (REQUIRED on a cluster)")
    ap.add_argument("--pairs-only", action="store_true", help="write the near-dup PAIR table instead of the survivor corpus")
    ap.add_argument("--survivor", choices=["edge", "component"], default="edge",
                    help="survivor rule: 'edge' drops any doc near-duplicating"
                    " a lower id (may keep several mutually-dissimilar docs of"
                    " one cluster); 'component' keeps exactly the min-id doc"
                    " per connected component of the pair graph (the standard"
                    " MinHash-dedup clustering)")
    ap.add_argument("--resume", default=None, help="run id: checkpoint/resume the pair stage")
    ap.add_argument("--ckpt-root", default="/tmp/pitfeat_ckpt")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pitfeat-dedup").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")
    res = run(spark, args)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
