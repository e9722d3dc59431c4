"""S5 DATABLOCK re-blocking: fixed batch sizes + lossless roundtrip."""

import pyarrow as pa

from pitfeat.ops.datablock import read_datablocks, to_datablocks, write_datablocks


def test_fixed_block_sizes(spark, transcripts, tmp_path):
    df = transcripts.select("conv_id", "turn_idx", "ts").repartition(4)
    metrics = write_datablocks(df, str(tmp_path / "blocks"), rows_per_block=128).toPandas()
    assert metrics["n_rows"].sum() == df.count()
    tbl = read_datablocks(str(tmp_path / "blocks"))
    assert tbl.num_rows == df.count()
    # every batch in every file must be exactly rows_per_block, except at most
    # one short tail per file
    import os

    import pyarrow.ipc as ipc

    for fn in os.listdir(tmp_path / "blocks"):
        with pa.OSFile(str(tmp_path / "blocks" / fn), "rb") as f:
            r = ipc.open_file(f)
            sizes = [r.get_batch(i).num_rows for i in range(r.num_record_batches)]
        assert all(s == 128 for s in sizes[:-1])
        assert sizes[-1] <= 128


def test_to_datablocks_preserves_rows(spark, transcripts):
    df = transcripts.select("conv_id", "turn_idx")
    out = to_datablocks(df, rows_per_block=100)
    assert out.count() == df.count()
    a = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = out.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a.equals(b)
