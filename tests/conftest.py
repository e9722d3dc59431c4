import pytest

from pitfeat.config import PitfeatConfig
from pitfeat.session import get_spark
from pitfeat.synth import gen_snapshots, gen_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "pitfeat-tests",
        master="local[4]",
        cfg=PitfeatConfig(shuffle_partitions=8),
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    return gen_transcripts(spark, n_convs=50, avg_turns=20, seed=42).cache()


@pytest.fixture(scope="session")
def snapshots(spark, transcripts):
    return gen_snapshots(transcripts, seed=42).cache()


@pytest.fixture(scope="session")
def transcripts_pd(transcripts):
    return (
        transcripts.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="session")
def snapshots_pd(snapshots):
    return (
        snapshots.toPandas().sort_values(["conv_id", "snap_ts"]).reset_index(drop=True)
    )
