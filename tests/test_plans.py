"""Physical plan-shape invariants (SURVEY.md §4) and resource hygiene.

These tests pin the *plan*, not the result: the flagship composition must
keep its shuffle count bounded, filters must reach the parquet scan, and no
operator may leave cached blocks behind after its result is materialized.
"""

import pyspark.sql.functions as F

from pitfeat.ops.asof import asof_join
from pitfeat.ops.windows import rolling, sessionize, with_gap


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_composition_exchange_count(transcripts, snapshots):
    """SURVEY §4 invariant (3): as-of + stacked windows + projection stay
    within 3 exchanges (as-of union partitioning, reused by every window that
    partitions on the same key; no per-window reshuffle)."""
    j = asof_join(transcripts, snapshots)
    out = with_gap(j)
    out = rolling(out, "gap_s", ["mean", "max"], window=5)
    out = sessionize(out)
    out = out.select("conv_id", "turn_idx", "ts", "gap_s_roll5_mean", "session_id")
    n_exchanges = _plan(out).count("Exchange")
    assert n_exchanges <= 3, f"flagship composition plans {n_exchanges} exchanges"


def test_filter_pushdown_reaches_scan(spark, transcripts, tmp_path):
    """SURVEY §4 invariant (2): predicates on a parquet scan appear in
    PushedFilters (Catalyst pushdown), never as a post-scan-only Filter."""
    p = str(tmp_path / "t.parquet")
    transcripts.write.mode("overwrite").parquet(p)
    df = (
        spark.read.parquet(p)
        .where((F.col("turn_idx") > 5) & (F.col("role") == "user"))
        .select("conv_id", "turn_idx")
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"empty PushedFilters in: {plan[:500]}"
    # column pruning: the scan must not read the text payload
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "text" not in read_schema


def test_aqe_coalesces_small_shuffles(spark, transcripts, tmp_path):
    """SURVEY §4 invariant (4): with AQE on, a small shuffle's final plan
    coalesces the configured shuffle partitions down to the data size —
    local tests never drown in empty tasks, and at scale AQE right-sizes
    reducers the same way. (Parquet-backed input: AQE skips the exchange
    entirely for tiny in-memory sources, which hides the node.)"""
    p = str(tmp_path / "aqe.parquet")
    transcripts.write.mode("overwrite").parquet(p)
    agg = spark.read.parquet(p).groupBy("conv_id").count()
    agg.collect()  # AQE finalizes the plan only after execution
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:800]


def test_no_persisted_rdds_leak(spark, transcripts, snapshots):
    """VERDICT r1 #6: operators materialize through written cut points, not
    persist(); nothing may stay pinned in executor memory after the call."""
    from pitfeat.ops.dedup import minhash_lsh_pairs

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document text number "), F.col("id")).alias("text"),
    )
    minhash_lsh_pairs(docs, num_hashes=16, bands=4).count()
    j = asof_join(transcripts, snapshots)
    j.count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after == before, f"leaked persisted RDDs: {after - before}"


def test_ann_plans_have_no_rowwise_python(spark):
    """The matrix top-k engine (s1/s2/s4) must plan exactly ONE Arrow-batched
    MapInPandas pass over the corpus — no pair rows, no xTables explode, no
    row-at-a-time BatchEvalPython — plus a single exchange for the final
    rank window. The retained pair-join parity oracles keep their r3 shape
    (ArrowEvalPython assignment kernels + broadcast query join)."""
    import numpy as np

    from pitfeat.ops.similarity import (
        _ivf_topk_pairjoin,
        _lsh_topk_pairjoin,
        cosine_topk,
        ivf_topk,
        lsh_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    C = np.eye(8, 64)  # fixed codebook: keeps the plan free of the training job
    for out in (
        cosine_topk(e, qs, k=5),
        lsh_topk(e, qs, k=5, nbits=1, tables=4),
        ivf_topk(e, qs, k=5, nlist=8, nprobe=2, centroids=C),
    ):
        plan = _plan(out)
        assert "BatchEvalPython" not in plan
        assert plan.count("MapInPandas") == 1, plan[:800]
        assert plan.count("Exchange") <= 1, plan[:800]  # only the rank window
    for out in (
        _lsh_topk_pairjoin(e, qs, k=5, nbits=1, tables=4),
        _ivf_topk_pairjoin(e, qs, k=5, nlist=8, nprobe=2, centroids=C),
    ):
        plan = _plan(out)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_knn_join_plans_never_materialize_pairs(spark):
    """knn_join's bucketed paths (VERDICT r4 #3) must score inside grouped
    Arrow kernels — FlatMapGroupsInPandas (lsh) / FlatMapCoGroupsInPandas
    (ivf) — with NO cartesian/nested-loop join and no row-wise Python
    anywhere: pair rows exist only as the <= n x fanout x k kernel OUTPUT,
    never as a join product."""
    import numpy as np

    from pitfeat.ops.similarity import knn_join

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    C = np.eye(8, 64)
    lsh_plan = _plan(knn_join(e, k=5, method="lsh", nbits=2, tables=4))
    ivf_plan = _plan(knn_join(e, k=5, method="ivf", nlist=8, nprobe=2, centroids=C))
    for plan in (lsh_plan, ivf_plan):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in lsh_plan
    # r8: the ivf cogroup kernel is Arrow-native (applyInArrow) — vectors
    # reach numpy as one flat-buffer reshape instead of per-row objects
    assert "FlatMapCoGroupsInArrow" in ivf_plan


def test_ewma_plan_single_pass(spark):
    """W11 ewma must plan ONE streaming MapInPandas pass over ONE key
    co-locating exchange + in-partition sort — the merge-strategy shape:
    no extra shuffle, no row-wise Python, no window fallback. (r8: the
    exchange is HASH partitioning — co-location is all the kernel needs,
    and range partitioning's boundary-sampling job re-executed the whole
    upstream once per call.)"""
    from pitfeat.ops.ewma import ewma

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(ewma(ev, "value", 0.25, key="user_id", ts="ts", order_extra=("event_id",)))
    assert plan.count("MapInPandas") == 1, plan[:800]
    assert plan.count("Exchange") == 1, plan[:800]
    assert "hashpartitioning(user_id" in plan, plan[:800]
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan


def test_ewma_time_plan_single_pass(spark):
    """W12 ewma_time shares W11's plan shape exactly: one MapInPandas, one
    key co-locating (hash) exchange, no row-wise Python, no window
    fallback."""
    from pitfeat.ops.ewma import ewma_time

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(
        ewma_time(ev, "value", 3600.0, key="user_id", ts="ts", order_extra=("event_id",))
    )
    assert plan.count("MapInPandas") == 1, plan[:800]
    assert plan.count("Exchange") == 1, plan[:800]
    assert "hashpartitioning(user_id" in plan, plan[:800]
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
