"""DATABLOCK mirror (SURVEY.md §2.8 V3 / §2.1 S5).

The reference packs K fragment vectors x F features into fixed-size on-disk
blocks (mmap'd C structs). The Spark-native mirror: ``DataFrame.mapInArrow``
re-blocks the stream of Arrow record batches into batches of EXACTLY
``rows_per_block`` rows (last block per partition may be short), one
fixed-width float64 column per surviving feature — zero pandas overhead, zero
copies beyond Arrow slicing.

Avoids MapType / nested structs in the Arrow path (Arrow conversion caveats).

Scale note: re-blocking is per-partition streaming — memory is bounded by
``rows_per_block`` plus one carry buffer, independent of partition size.
"""

from __future__ import annotations

import os
from typing import Iterator

import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark.sql import DataFrame


def to_datablocks(df: DataFrame, rows_per_block: int = 4096) -> DataFrame:
    """Re-block into fixed-size Arrow record batches. Returns a DataFrame with
    the same schema whose underlying Arrow batches all have exactly
    ``rows_per_block`` rows (except at most one short tail per partition)."""

    def reblock(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        buf: list[pa.RecordBatch] = []
        buffered = 0
        for b in batches:
            buf.append(b)
            buffered += b.num_rows
            if buffered >= rows_per_block:
                # combine ONCE per incoming batch, then slice out every full
                # block zero-copy. The previous while-loop recombined the
                # whole remaining buffer per emitted block — O(B^2/k) bytes
                # copied when an upstream stage delivers batches B >> k
                tbl = pa.Table.from_batches(buf).combine_chunks()
                nfull = buffered // rows_per_block
                for i in range(nfull):
                    for hb in tbl.slice(i * rows_per_block, rows_per_block).to_batches(
                        max_chunksize=rows_per_block
                    ):
                        yield hb
                tail = tbl.slice(nfull * rows_per_block)
                buf = tail.to_batches() or []
                buffered = tail.num_rows
        if buffered:
            tbl = pa.Table.from_batches(buf).combine_chunks()
            for hb in tbl.to_batches(max_chunksize=rows_per_block):
                yield hb

    return df.mapInArrow(reblock, schema=df.schema)


def write_datablocks(
    df: DataFrame, out_dir: str, rows_per_block: int = 4096, shared_storage: bool = False
) -> DataFrame:
    """Persist DATABLOCKs as one Arrow IPC file per Spark partition
    (``part-<pid>.arrow``), each containing only fixed-size record batches.
    Returns a one-row-per-partition DataFrame of (partition id, n_blocks,
    n_rows) for the metrics sidecar.

    ``out_dir`` is opened with local filesystem APIs (pa.OSFile/os.replace)
    in EVERY task, so on a multi-node cluster it must be a mount shared by
    the driver and all executors (NFS/FUSE-mounted object store); a
    node-local path would silently scatter partial outputs across executor
    disks and the driver-side freshness check would inspect the wrong disk.
    Same policy as dedup._scratch_dir: on a non-local master the caller must
    affirm this with ``shared_storage=True``.

    Task-commit protocol: each task writes to a hidden temp name and
    os.replace()s it to the DETERMINISTIC final name part-<partitionId>.arrow
    only after a clean close — a retried (or speculative) attempt atomically
    replaces the same file instead of adding a second uuid-named one, and a
    crashed attempt leaves only a temp file that readers ignore. The
    destination must not already hold .arrow files (two runs into one dir
    would otherwise silently concatenate)."""
    master = str(df.sparkSession.conf.get("spark.master", "") or "")
    if not master.startswith("local") and not shared_storage:
        raise ValueError(
            f"write_datablocks: master is {master!r} and out_dir={out_dir!r} is "
            "written with node-local file APIs from every executor — pass "
            "shared_storage=True only if out_dir is a filesystem mounted at "
            "the same path on the driver and ALL executors"
        )
    os.makedirs(out_dir, exist_ok=True)
    existing = [f for f in os.listdir(out_dir) if f.endswith(".arrow")]
    if existing:
        raise ValueError(
            f"write_datablocks: {out_dir} already contains {len(existing)} "
            ".arrow file(s) — reading would merge two runs; use a fresh dir"
        )

    def writer(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import uuid

        from pyspark import TaskContext

        schema = None
        sink = None
        w = None
        n_blocks = 0
        n_rows = 0
        tc = TaskContext.get()
        pid = f"{tc.partitionId():05d}" if tc is not None else uuid.uuid4().hex[:12]
        tmp_path = os.path.join(out_dir, f".part-{pid}.tmp-{uuid.uuid4().hex[:8]}")
        final_path = os.path.join(out_dir, f"part-{pid}.arrow")
        buf: list[pa.RecordBatch] = []
        buffered = 0

        def flush_block(block: pa.RecordBatch):
            nonlocal w, sink, schema, n_blocks, n_rows
            if w is None:
                schema = block.schema
                sink = pa.OSFile(tmp_path, "wb")
                w = ipc.new_file(sink, schema)
            w.write_batch(block)
            n_blocks += 1
            n_rows += block.num_rows

        for b in batches:
            buf.append(b)
            buffered += b.num_rows
            if buffered >= rows_per_block:
                # single combine per incoming batch + zero-copy full-block
                # slices (see reblock for the O(B^2) rationale)
                tbl = pa.Table.from_batches(buf).combine_chunks()
                nfull = buffered // rows_per_block
                for i in range(nfull):
                    for hb in tbl.slice(i * rows_per_block, rows_per_block).to_batches(
                        max_chunksize=rows_per_block
                    ):
                        flush_block(hb)
                tail = tbl.slice(nfull * rows_per_block)
                buf = tail.to_batches() or []
                buffered = tail.num_rows
        if buffered:
            tbl = pa.Table.from_batches(buf).combine_chunks()
            for hb in tbl.to_batches(max_chunksize=rows_per_block):
                flush_block(hb)
        if w is not None:
            w.close()
            sink.close()
            os.replace(tmp_path, final_path)
        yield pa.RecordBatch.from_pydict(
            {"part_id": [pid], "n_blocks": [n_blocks], "n_rows": [n_rows]},
            schema=pa.schema(
                [("part_id", pa.string()), ("n_blocks", pa.int64()), ("n_rows", pa.int64())]
            ),
        )

    return df.mapInArrow(writer, schema="part_id string, n_blocks long, n_rows long")


def read_datablocks(path: str) -> pa.Table:
    """Read back all IPC files under ``path`` (test/verification helper)."""
    tables = []
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".arrow"):
            with pa.OSFile(os.path.join(path, fn), "rb") as f:
                tables.append(ipc.open_file(f).read_all())
    return pa.concat_tables(tables) if tables else pa.table({})
