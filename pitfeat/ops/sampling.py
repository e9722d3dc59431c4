"""Deterministic dataset splitting (SURVEY.md §2.12 family — the standard
train/val/test machinery of a training-data pipeline).

``hash_split`` assigns every row to a named split by hashing its id — no
RNG state, no sampling pass, no shuffle: the split is a pure projection, so
it is stable across reruns, partitionings, cluster sizes, and engine
versions, and a row's split can be recomputed from its id alone (the
property `randomSplit` does NOT have: its assignment depends on partition
layout and sampler draws).

Two bucketing methods:

- ``xxhash64`` (default, production): seed-first ``xxhash64(lit(seed),
  id)`` (the seed-LAST form is a pure function of xxhash64(id) — the r2
  lesson), full 64-bit avalanche, whole-stage codegen. Not expressible in
  engines without xxhash64.
- ``portable``: two MINSTD Lehmer rounds mod the Mersenne prime 2^31-1 —
  every intermediate fits int64 (max product 2^31 * 69621 < 2^48), so the
  arithmetic is bit-identical in ANY engine with 64-bit integers; this is
  the contract-oracle path (DuckDB replays it exactly). Tradeoff, stated
  honestly: 31-bit state means ids congruent mod 2^31-1 share a bucket —
  fine for splitting (collisions are expected of any hash) unless related
  records sit exactly 2,147,483,647 ids apart; use xxhash64 when ids carry
  adversarial structure.

Split boundaries are INTEGER thresholds precomputed in Python
(floor(cum_weight * modulus)), so no float appears anywhere in the
assignment — the oracle comparison has zero rounding surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime
_MINSTD_A = 48_271  # Park-Miller MINSTD multiplier
_MINSTD_B = 69_621  # the common alternative multiplier, second round


def _portable_bucket(id_col: Column, seed: int) -> Column:
    """Two Lehmer rounds mod 2^31-1; result in [0, 2^31-1). Every product
    is < 2^31 * 69621 < 2^48: safe under ANSI int64 overflow checking."""
    x0 = F.pmod(id_col.cast("long") + F.lit(int(seed)), F.lit(_MERSENNE31))
    x1 = F.pmod(x0 * F.lit(_MINSTD_A), F.lit(_MERSENNE31))
    return F.pmod(x1 * F.lit(_MINSTD_B), F.lit(_MERSENNE31))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "id",
    seed: int = 42,
    out_col: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Add ``out_col`` naming each row's split, e.g.
    ``hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id")``.

    Weights must be positive and sum to 1 (1e-9 tolerance); boundaries are
    integer thresholds on the hash bucket, so realized fractions are exact
    to within hash uniformity (~1/sqrt(n) relative error). Splits are
    DISJOINT and EXHAUSTIVE by construction (half-open threshold ranges
    over one bucket value). A null id yields a null split. Insertion order
    of ``weights`` fixes which hash range each split owns — reordering
    names reassigns rows, so treat the dict order as part of the config.
    """
    if not weights:
        raise ValueError("hash_split: weights is empty")
    bad = {k: w for k, w in weights.items() if not w > 0}
    if bad:
        raise ValueError(f"hash_split: non-positive weight(s) {bad}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"hash_split: weights must sum to 1, got {total}")
    if out_col in df.columns:
        raise ValueError(f"hash_split: output column {out_col!r} already exists")
    if id_col not in df.columns:
        raise ValueError(f"hash_split: no such column {id_col!r}")

    if method == "xxhash64":
        modulus = 1_000_000_007
        # seed literal FIRST and as long (an int lit takes xxhash64's 4-byte
        # path; fine either way, but the long form matches the docs)
        bucket = F.pmod(
            F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col)),
            F.lit(modulus),
        )
    elif method == "portable":
        modulus = _MERSENNE31
        bucket = _portable_bucket(F.col(id_col), seed)
    else:
        raise ValueError(f"hash_split: unknown method {method!r}")

    # integer thresholds, computed once in Python: floor(cum * modulus)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        t = int(cum * modulus)
        cond = bucket < F.lit(t)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    # null id -> null split (when() would otherwise fall through to `last`)
    return df.withColumn(
        out_col, F.when(F.col(id_col).isNotNull(), expr)
    )
