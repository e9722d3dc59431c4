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
            while buffered >= rows_per_block:
                tbl = pa.Table.from_batches(buf).combine_chunks()
                head = tbl.slice(0, rows_per_block)
                tail = tbl.slice(rows_per_block)
                for hb in head.to_batches(max_chunksize=rows_per_block):
                    yield hb
                buf = tail.to_batches() or []
                buffered = tail.num_rows
        if buffered:
            tbl = pa.Table.from_batches(buf).combine_chunks()
            for hb in tbl.to_batches(max_chunksize=rows_per_block):
                yield hb

    return df.mapInArrow(reblock, schema=df.schema)


def write_datablocks(
    df: DataFrame, out_dir: str, rows_per_block: int = 4096
) -> DataFrame:
    """Persist DATABLOCKs as one Arrow IPC file per Spark partition
    (``part-<pid>.arrow``), each containing only fixed-size record batches.
    Returns a one-row-per-partition DataFrame of (partition hex id, n_blocks,
    n_rows) for the metrics sidecar."""
    os.makedirs(out_dir, exist_ok=True)

    def writer(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import uuid

        schema = None
        sink = None
        w = None
        n_blocks = 0
        n_rows = 0
        pid = uuid.uuid4().hex[:12]
        buf: list[pa.RecordBatch] = []
        buffered = 0

        def flush_block(block: pa.RecordBatch):
            nonlocal w, sink, schema, n_blocks, n_rows
            if w is None:
                schema = block.schema
                sink = pa.OSFile(os.path.join(out_dir, f"part-{pid}.arrow"), "wb")
                w = ipc.new_file(sink, schema)
            w.write_batch(block)
            n_blocks += 1
            n_rows += block.num_rows

        for b in batches:
            buf.append(b)
            buffered += b.num_rows
            while buffered >= rows_per_block:
                tbl = pa.Table.from_batches(buf).combine_chunks()
                head = tbl.slice(0, rows_per_block).to_batches(max_chunksize=rows_per_block)
                for hb in head:
                    flush_block(hb)
                tail = tbl.slice(rows_per_block)
                buf = tail.to_batches() or []
                buffered = tail.num_rows
        if buffered:
            tbl = pa.Table.from_batches(buf).combine_chunks()
            for hb in tbl.to_batches(max_chunksize=rows_per_block):
                flush_block(hb)
        if w is not None:
            w.close()
            sink.close()
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
