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


def test_write_datablocks_refuses_nonlocal_master_without_affirmation(tmp_path):
    """write_datablocks uses node-local file APIs (pa.OSFile/os.replace) in
    every task and a driver-side freshness check — on a multi-node cluster a
    non-shared out_dir silently scatters partial outputs across executor
    disks. Mirrors dedup._scratch_dir's policy: non-local master requires the
    caller to affirm shared_storage=True (ADVICE r3)."""
    import pytest

    class _Conf:
        def get(self, k, d=None):
            return "spark://cluster:7077"

    class _Sess:
        conf = _Conf()

    class _DF:
        sparkSession = _Sess()

    with pytest.raises(ValueError, match="shared_storage"):
        write_datablocks(_DF(), str(tmp_path / "blocks_guard"))
