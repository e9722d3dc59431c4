"""Manifest-validated checkpoints with per-partition lineage + metrics
(SURVEY.md §2.1 S3/S4; BASELINE.json:14 "resumable from checkpoint with
per-partition lineage + metrics").

A checkpoint directory holds:
- ``data/`` — the stage output as Parquet
- ``_lineage.json`` — stage name, run id, config hash, upstream input ids,
  total rows, and the per-partition metrics table
- ``_SUCCESS_PITFEAT`` — commit marker written LAST (crash between data write
  and marker => checkpoint treated as absent; write-then-rename-free but
  atomic-enough because readers require the marker AND a matching hash)

``resume_or_compute`` is the resumability primitive: if a valid checkpoint
exists whose lineage hash matches (same config + same declared inputs), the
stage is read back instead of recomputed; otherwise the stage function runs
and is checkpointed. Per-partition metrics (partition id, rows, bytes) are
collected by a zero-copy ``mapInArrow`` counting pass at write time, giving
any partition's computation an audit trail.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

MARKER = "_SUCCESS_PITFEAT"
LINEAGE = "_lineage.json"


def _partition_metrics(df: DataFrame) -> list[dict]:
    """One row per partition: (partition uuid, rows, approx bytes). Streaming
    Arrow pass — counts without materializing."""

    def count(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import uuid

        pid = uuid.uuid4().hex[:12]
        rows = 0
        nbytes = 0
        for b in batches:
            rows += b.num_rows
            nbytes += sum(
                buf.size for col in b.columns for buf in col.buffers() if buf is not None
            )
        yield pa.RecordBatch.from_pydict(
            {"pid": [pid], "rows": [rows], "bytes": [nbytes]},
            schema=pa.schema([("pid", pa.string()), ("rows", pa.int64()), ("bytes", pa.int64())]),
        )

    out = df.mapInArrow(count, schema="pid string, rows long, bytes long").collect()
    return [r.asDict() for r in out]


def write_checkpoint(
    df: DataFrame,
    ckpt_dir: str,
    stage: str,
    config_hash: str,
    inputs: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    data_dir = os.path.join(ckpt_dir, "data")
    # Invalidate FIRST: a crash mid-rewrite must leave the checkpoint absent,
    # not a stale marker+lineage validating over torn data. Removing the
    # marker before any byte of data/ is touched restores the documented
    # "crash => checkpoint treated as absent" invariant.
    for stale in (MARKER, LINEAGE):
        p = os.path.join(ckpt_dir, stale)
        if os.path.exists(p):
            os.remove(p)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_dir)

    back = df.sparkSession.read.parquet(data_dir)
    parts = _partition_metrics(back)
    lineage = {
        "stage": stage,
        "config_hash": config_hash,
        "inputs": sorted(inputs or []),
        "written_at": time.time(),
        "total_rows": int(sum(p["rows"] for p in parts)),
        "n_partitions": len(parts),
        "partitions": parts,
        "schema": back.schema.jsonValue(),
    }
    with open(os.path.join(ckpt_dir, LINEAGE), "w") as f:
        json.dump(lineage, f, indent=1, default=str)
    with open(os.path.join(ckpt_dir, MARKER), "w") as f:
        f.write("ok")
    return lineage


def checkpoint_valid(
    ckpt_dir: str,
    config_hash: str,
    inputs: list[str] | None = None,
    stage: str | None = None,
) -> bool:
    if not os.path.exists(os.path.join(ckpt_dir, MARKER)):
        return False
    try:
        with open(os.path.join(ckpt_dir, LINEAGE)) as f:
            lin = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if lin.get("config_hash") != config_hash:
        return False
    # stage must match when asked for: config_hash is per-CONFIG, identical
    # across stages, so without this check resume_or_compute('normalize')
    # would happily return a 'features' checkpoint written to the same dir
    if stage is not None and lin.get("stage") != stage:
        return False
    if inputs is not None and lin.get("inputs") != sorted(inputs):
        return False
    return True


def resume_or_compute(
    spark: SparkSession,
    ckpt_dir: str,
    stage: str,
    config_hash: str,
    fn: Callable[[], DataFrame],
    inputs: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> tuple[DataFrame, bool]:
    """Returns (df, resumed). ``resumed=True`` means the checkpoint was read
    instead of recomputing the stage."""
    if checkpoint_valid(ckpt_dir, config_hash, inputs, stage=stage):
        return spark.read.parquet(os.path.join(ckpt_dir, "data")), True
    df = fn()
    write_checkpoint(df, ckpt_dir, stage, config_hash, inputs, partition_by)
    return spark.read.parquet(os.path.join(ckpt_dir, "data")), False
