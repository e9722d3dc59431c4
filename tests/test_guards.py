"""Hot-bucket guards for the LSH candidate joins (VERDICT r1 #5).

A degenerate bucket (mass-duplicated boilerplate, zero embeddings) otherwise
yields O(n^2) candidate pairs. The guard drops buckets above ``max_bucket``;
byte-identical content is exact_dedup's job, and capped members still pair
through their other bands/tables.
"""

import pyspark.sql.functions as F

from pitfeat.ops.dedup import exact_dedup, minhash_lsh_pairs, simhash_near_pairs
from pitfeat.ops.similarity import embedding_near_dup_pairs


def _identical_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same boilerplate text repeated everywhere in the corpus forever"
        ).alias("text"),
    )


def test_minhash_hot_bucket_capped(spark):
    docs = _identical_docs(spark, 300)
    capped = minhash_lsh_pairs(docs, num_hashes=16, bands=4, max_bucket=50).count()
    assert capped == 0, "one degenerate bucket must not emit O(n^2) pairs"
    uncapped = minhash_lsh_pairs(docs, num_hashes=16, bands=4, max_bucket=0).count()
    assert uncapped == 300 * 299 // 2  # the blowup the guard prevents


def test_simhash_hot_bucket_capped(spark):
    docs = _identical_docs(spark, 300)
    assert simhash_near_pairs(docs, max_hamming=0, max_bucket=50).count() == 0


def test_embedding_hot_bucket_capped(spark):
    vecs = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(j % 7) - 3.0) for j in range(16)]).alias("embedding"),
    )
    n = embedding_near_dup_pairs(
        vecs, threshold=0.99, nbits=4, tables=2, dim=16, max_bucket=50
    ).count()
    assert n == 0


def test_exact_dedup_owns_identical_docs(spark):
    """The capped case is not lost coverage: byte-identical docs are exact
    dedup's domain, and it keeps exactly one."""
    docs = _identical_docs(spark, 300)
    kept = exact_dedup(docs).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0


def test_cap_does_not_touch_real_neardups(spark):
    """Distinct docs with one planted near-dup pair: the guard must leave
    normal-size buckets alone and the pair must survive."""
    base = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("completely distinct document body number "),
            F.col("id"),
            F.lit(" with plenty of words to shingle over and over"),
        ).alias("text"),
    )
    dup = base.where(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 1000).alias("doc_id"), F.col("text")
    )
    pairs = minhash_lsh_pairs(
        base.unionByName(dup), num_hashes=32, bands=8, threshold=0.9, max_bucket=50
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(7, 1007)}


def test_minhash_banding_validated(spark):
    """ADVICE r6: num_hashes % bands != 0 silently dropped the remainder
    hashes from every band slice (quietly reduced candidate recall), and
    bands > num_hashes made rows_per_band 0. Both must fail loudly."""
    import pytest

    docs = _identical_docs(spark, 4)
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_lsh_pairs(docs, num_hashes=10, bands=4)
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_lsh_pairs(docs, num_hashes=4, bands=16)
    with pytest.raises(ValueError, match="bands must be"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=0)
