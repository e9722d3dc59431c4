"""Edge cases and determinism for the fused text kernels (minhash, simhash)
and a property-based as-of check (hypothesis over randomized frames)."""

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from pitfeat.ops.asof import asof_join
from pitfeat.ops.dedup import minhash_signatures, simhash

EDGE_TEXTS = [
    (0, ""),                       # empty
    (1, "   "),                    # whitespace only
    (2, "one"),                    # single token (< shingle_n)
    (3, "two tokens"),             # below 3-gram width
    (4, "exactly three tokens"),   # == shingle_n
    (5, "a b c d e f g h i j"),    # normal
    (6, "ünïcödé tøkens héré please and more of them"),  # non-ascii
    (7, "repeat repeat repeat repeat repeat"),            # degenerate vocab
    (8, "Tabs\tand\nnewlines   collapse to single spaces everywhere"),
    (9, None),                     # null text
]


@pytest.fixture(scope="module")
def edge_docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def test_minhash_kernel_edges_deterministic(edge_docs):
    a = {r["doc_id"]: r["__sig"] for r in minhash_signatures(edge_docs, as_array=True).collect()}
    b = {r["doc_id"]: r["__sig"] for r in minhash_signatures(edge_docs, as_array=True).collect()}
    assert a == b  # deterministic across runs
    assert all(len(v) == 32 for v in a.values())  # fixed width, even for empty/null
    assert all(all(0 <= x < (1 << 31) for x in v) for v in a.values())
    # null and empty normalize identically ('' after fillna+strip)
    assert a[9] == a[0]
    # whitespace-only == empty after normalization
    assert a[1] == a[0]
    # identical docs would collide; these distinct docs must not all collide
    assert len({tuple(v) for v in a.values()}) >= 7


def test_minhash_matches_catalyst_shingle_semantics(spark):
    """The fused kernel must keep the documented fallback: docs shorter than
    the shingle width hash the whole normalized string as one shingle — so
    two short docs differing only in whitespace/case get EQUAL signatures."""
    docs = spark.createDataFrame(
        [(0, "  Hello   World "), (1, "hello world")], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["__sig"] for r in minhash_signatures(docs, as_array=True).collect()}
    assert sigs[0] == sigs[1]


def test_simhash_kernel_edges_deterministic(edge_docs):
    a = {r["doc_id"]: r["simhash"] for r in simhash(edge_docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(edge_docs).collect()}
    assert a == b
    assert a[9] == a[0] and a[1] == a[0]
    # near-identical docs (case/whitespace) collide, distinct docs spread
    assert len(set(a.values())) >= 6


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:
    _ts = st.integers(min_value=0, max_value=3_000)
    _key = st.sampled_from(["k1", "k2", "k3"])

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lefts=st.lists(st.tuples(_key, _ts), min_size=1, max_size=25),
        rights=st.lists(st.tuples(_key, _ts, st.floats(0, 100, allow_nan=False)), max_size=25),
        allow_exact=st.booleans(),
    )
    def test_asof_property_vs_merge_asof(spark, lefts, rights, allow_exact):
        """SURVEY §5 item 1 as a property: for arbitrary small frames, the
        window-strategy as-of equals pandas.merge_asof (ties, misses,
        duplicates-free right side)."""
        base = dt.datetime(2024, 1, 1)
        lpdf = pd.DataFrame(
            {
                "conv_id": [k for k, _ in lefts],
                "ts": [base + dt.timedelta(seconds=t) for _, t in lefts],
            }
        )
        # unique (key, snap_ts): the documented right-side contract
        seen = set()
        rrows = []
        for k, t, v in rights:
            if (k, t) not in seen:
                seen.add((k, t))
                rrows.append((k, base + dt.timedelta(seconds=t), v))
        rpdf = pd.DataFrame(rrows, columns=["conv_id", "snap_ts", "val"]).astype(
            {"snap_ts": "datetime64[ns]", "val": "float64"}
        )

        ldf = spark.createDataFrame(lpdf)
        rdf = (
            spark.createDataFrame(rpdf)
            if len(rpdf)
            else spark.createDataFrame([], "conv_id string, snap_ts timestamp, val double")
        )
        got = (
            asof_join(ldf, rdf, allow_exact=allow_exact)
            .toPandas()
            .sort_values(["conv_id", "ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("snap_ts", kind="mergesort"),
            left_on="ts",
            right_on="snap_ts",
            by="conv_id",
            direction="backward",
            allow_exact_matches=allow_exact,
        ).sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
        assert len(got) == len(want)
        pd.testing.assert_series_equal(got["snap_ts"], want["snap_ts"], check_names=False)
        pd.testing.assert_series_equal(
            got["val"].astype(float), want["val"].astype(float), check_names=False
        )


    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lefts=st.lists(st.tuples(_key, _ts), min_size=1, max_size=20),
        rights=st.lists(st.tuples(_key, _ts, st.floats(0, 100, allow_nan=False)), max_size=20),
        direction=st.sampled_from(["backward", "forward", "nearest"]),
    )
    def test_asof_cogroup_directions_property(spark, lefts, rights, direction):
        """All three cogroup directions equal pandas.merge_asof on arbitrary
        small frames (duplicates-free right side, so only the search
        semantics — not the tie rules — are in play)."""
        base = dt.datetime(2024, 1, 1)
        lpdf = pd.DataFrame(
            {
                "conv_id": [k for k, _ in lefts],
                "ts": [base + dt.timedelta(seconds=t) for _, t in lefts],
            }
        )
        seen = set()
        rrows = []
        for k, t, v in rights:
            if (k, t) not in seen:
                seen.add((k, t))
                rrows.append((k, base + dt.timedelta(seconds=t), v))
        rpdf = pd.DataFrame(rrows, columns=["conv_id", "snap_ts", "val"]).astype(
            {"snap_ts": "datetime64[ns]", "val": "float64"}
        )
        ldf = spark.createDataFrame(lpdf)
        rdf = (
            spark.createDataFrame(rpdf)
            if len(rpdf)
            else spark.createDataFrame([], "conv_id string, snap_ts timestamp, val double")
        )
        got = (
            asof_join(ldf, rdf, strategy="cogroup", direction=direction)
            .toPandas()
            .sort_values(["conv_id", "ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("snap_ts", kind="mergesort"),
            left_on="ts",
            right_on="snap_ts",
            by="conv_id",
            direction=direction,
        ).sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
        assert len(got) == len(want)
        pd.testing.assert_series_equal(got["snap_ts"], want["snap_ts"], check_names=False)
        pd.testing.assert_series_equal(
            got["val"].astype(float), want["val"].astype(float), check_names=False
        )


# --------------------------------------------------------------------------
# fused LSH-signature kernel (similarity._table_sigs_udf) vs expression path
# --------------------------------------------------------------------------


def test_lsh_kernel_matches_expression_signatures(spark):
    """The fused matmul kernel must reproduce the expression path's buckets
    bit-for-bit at seed 42 on the driver embeddings (VERDICT r2 #1 'done'
    criterion). A mismatch is only possible when a dot product sits within
    float rounding of zero, which real embeddings never do."""
    from pitfeat.ops.similarity import _multi_table_buckets, _multi_table_buckets_expr

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    for nbits, tables in ((1, 16), (8, 4)):
        got = (
            _multi_table_buckets(e, "v", nbits, tables, 64, 42)
            .select("vec_id", "tbl", "bucket")
            .toPandas()
            .sort_values(["vec_id", "tbl"])
            .reset_index(drop=True)
        )
        want = (
            _multi_table_buckets_expr(e, "v", nbits, tables, 64, 42)
            .select("vec_id", "tbl", "bucket")
            .toPandas()
            .sort_values(["vec_id", "tbl"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_lsh_kernel_null_and_ragged_rows(spark):
    """Null / wrong-width vectors hash to bucket 0 in every table — the same
    bucket the expression path's null-propagating dot products produce."""
    from pitfeat.ops.similarity import _multi_table_buckets

    rows = [(0, [0.5, -1.0, 2.0, 0.25]), (1, None), (2, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = (
        _multi_table_buckets(df, "v", 4, 3, 4, 7)
        .select("vec_id", "tbl", "bucket")
        .toPandas()
        .sort_values(["vec_id", "tbl"])
    )
    assert (out.loc[out.vec_id == 1, "bucket"] == 0).all()
    assert (out.loc[out.vec_id == 2, "bucket"] == 0).all()
    assert len(out) == 9  # 3 rows x 3 tables


def test_knn_score_block_f32_prefilter_exact_selection():
    """r8: _knn_score_block scans tiles in float32 with a margin and
    re-scores survivors in exact float64. This pins selection parity against
    a brute-force oracle on random fixtures (duplicates, zero vectors,
    self-exclusion, tiny prober blocks), an exact-tie flood, and a near-tie
    cluster fixture engineered so f32 CANNOT distinguish neighbors — the
    margin must carry them into the f64 re-score. Pairs are allowed to
    differ ONLY where two distinct vectors produce cosines within 1e-12
    (the documented summation-order ulp class)."""
    import numpy as np

    from pitfeat.ops.similarity import _knn_score_block

    rng = np.random.default_rng(17)

    def brute_sets(V, ids, QV, qids, k):
        Vn = np.sqrt((V * V).sum(1))
        QVn = np.sqrt((QV * QV).sum(1))
        Vh = V / np.where(Vn > 0, Vn, 1.0)[:, None]
        Qh = QV / np.where(QVn > 0, QVn, 1.0)[:, None]
        Vh[Vn == 0] = 0.0
        Qh[QVn == 0] = 0.0
        C = Qh @ Vh.T
        out = {}
        for qi in range(len(qids)):
            order = sorted(range(len(ids)), key=lambda j: (-C[qi, j], ids[j]))
            picks = []
            for j in order:
                if ids[j] != qids[qi]:
                    picks.append(j)
                    if len(picks) == k:
                        break
            out[qi] = (picks, C[qi])
        return out

    for trial in range(25):
        m = int(rng.integers(2, 80))
        nq = int(rng.integers(1, 60))
        k = int(rng.integers(1, 6))
        V = rng.standard_normal((m, 8))
        for _ in range(int(rng.integers(0, 5))):
            V[rng.integers(0, m)] = V[rng.integers(0, m)]
        if rng.random() < 0.3:
            V[rng.integers(0, m)] = 0.0
        ids = np.sort(rng.choice(5000, m, replace=False))
        QV = V[rng.integers(0, m, nq)] if rng.random() < 0.5 else rng.standard_normal((nq, 8))
        # unique prober ids (knn_join probers are distinct corpus rows; a
        # duplicated id would make this harness merge two probers' outputs)
        qids = rng.choice(
            np.concatenate([ids, 90000 + np.arange(nq)]), nq, replace=False
        )
        Vn = np.sqrt((V * V).sum(1))
        QVn = np.sqrt((QV * QV).sum(1))
        got = list(zip(*_knn_score_block(V, Vn, ids, QV, QVn, qids, k, 7)))
        oracle = brute_sets(V, ids, QV, qids, k)
        by_q = {}
        for q, i, c in got:
            by_q.setdefault(q, []).append(int(i))
        pos_of = {int(i): p for p, i in enumerate(ids)}
        for qi in range(nq):
            picks, crow = oracle[qi]
            exp_ids = [int(ids[j]) for j in picks]
            g = by_q.get(qids[qi], [])
            if g != exp_ids:
                # divergent pairs must be interchangeable ulp-ties
                for a, b in zip(g, exp_ids):
                    if a != b:
                        assert abs(crow[pos_of[a]] - crow[pos_of[b]]) < 1e-12, (
                            trial,
                            qids[qi],
                            a,
                            b,
                        )

    # near-tie clusters: 1e-6-noise clones, f32-indistinguishable
    base = rng.standard_normal((30, 8))
    V = np.repeat(base, 30, axis=0) + rng.standard_normal((900, 8)) * 1e-6
    ids = np.arange(900)
    QV = V[:200]
    qids = np.arange(200)
    Vn = np.sqrt((V * V).sum(1))
    QVn = np.sqrt((QV * QV).sum(1))
    got = list(zip(*_knn_score_block(V, Vn, ids, QV, QVn, qids, 5, 64)))
    oracle = brute_sets(V, ids, QV, qids, 5)
    by_q = {}
    for q, i, c in got:
        by_q.setdefault(q, []).append(int(i))
    for qi in range(200):
        picks, crow = oracle[qi]
        exp_ids = [int(ids[j]) for j in picks]
        g = by_q[qids[qi]]
        for a, b in zip(g, exp_ids):
            if a != b:
                assert abs(crow[a] - crow[b]) < 1e-12, (qi, a, b)

    # exact-tie flood: identical vectors -> pure id-asc order
    V = np.tile(rng.standard_normal(4), (800, 1))
    ids = np.arange(800)
    Vn = np.sqrt((V * V).sum(1))
    oq, oi, oc = _knn_score_block(V, Vn, ids, V[:50], Vn[:50], np.arange(50), 3, 16)
    assert list(oi[:3]) == [1, 2, 3] and len(oq) == 150
