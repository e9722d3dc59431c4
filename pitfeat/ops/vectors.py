"""Feature-vector assembly and allclose comparison (SURVEY.md §2.8 V1/V2).

V1 mirrors the reference's fixed-width feature vector: features stay as wide
double columns (so Catalyst column pruning works on scans) until this final
assembly into ``array<double>`` in manifest order.

V2 is the engine-side allclose comparator used by the correctness gate
(BASELINE.json:14 "matching the reference's feature vectors (allclose; zero
temporal leakage) at each entity x timestamp"): elementwise
``|a-b| <= atol + rtol*|b|`` with NaN==NaN, expressed with ``zip_with`` /
``forall`` — fully JVM-side, so the comparison itself scales to full tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble(df: DataFrame, feature_cols: list[str], out_col: str = "features") -> DataFrame:
    """V1: wide double columns -> fixed-width array<double> (manifest order).
    Nulls become NaN so the vector width is constant and slot semantics match
    the reference's sentinel-missing convention."""
    slots = [
        F.coalesce(F.col(c).cast("double"), F.lit(float("nan"))) for c in feature_cols
    ]
    return df.withColumn(out_col, F.array(*slots))


def allclose_compare(
    a: DataFrame,
    b: DataFrame,
    keys: list[str] = ("conv_id", "turn_idx"),
    vec_col: str = "features",
    rtol: float = 1e-9,
    atol: float = 1e-12,
) -> DataFrame:
    """V2: full-outer join on keys; per-row boolean ``allclose`` with NaN==NaN.

    Returns (keys..., allclose boolean). Missing rows on either side, or
    differing vector lengths, compare False. Aggregate with
    ``.agg(F.min("allclose"))`` for a single verdict.
    """
    keys = list(keys)
    av = a.select(*keys, F.col(vec_col).alias("__va"))
    bv = b.select(*keys, F.col(vec_col).alias("__vb"))
    j = av.join(bv, keys, "full_outer")
    inf = F.lit(float("inf"))

    def slot_close(x, y):
        # numpy.isclose semantics: the tolerance formula only applies when
        # BOTH sides are finite — otherwise rtol*|inf| = inf would accept ANY
        # finite value against an inf reference (false pass of the
        # correctness gate) while inf vs inf would compare NOT close
        # (|inf-inf| = NaN). Non-finite slots require exact equality;
        # NaN==NaN is the gate's documented sentinel rule.
        both_finite = (
            ~F.isnan(x) & ~F.isnan(y) & (F.abs(x) != inf) & (F.abs(y) != inf)
        )
        return (
            (F.isnan(x) & F.isnan(y))
            | (both_finite & (F.abs(x - y) <= F.lit(atol) + F.lit(rtol) * F.abs(y)))
            | (x == y)
        )

    ok = (
        F.col("__va").isNotNull()
        & F.col("__vb").isNotNull()
        & (F.size("__va") == F.size("__vb"))
        & F.forall(F.zip_with("__va", "__vb", slot_close), lambda v: v)
    )
    return j.select(*keys, ok.alias("allclose"))
