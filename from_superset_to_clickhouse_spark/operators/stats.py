"""Experiment-analysis statistics (the reference ingests Superset's
``ab_user`` table — this is the analysis its consumers run on it).

Everything is built from decomposable aggregates (n, mean, sample
variance per arm) so a 100 TB experiment log reduces in one
partial/final aggregate pass; the test statistic itself is O(#arms)
scalar arithmetic. The normal CDF uses the Abramowitz–Stegun 7.1.26
erf polynomial (|error| < 1.5e-7) written out as explicit Catalyst
expressions — deterministic and replayable verbatim in any SQL engine,
unlike a native ``erf`` whose libm implementation varies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Abramowitz & Stegun 7.1.26 coefficients.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf_approx(x: Column) -> Column:
    """erf(x) for x >= 0 via the A&S 7.1.26 polynomial — identical
    operation order on every engine, so cross-engine results agree to
    the last few ulps (final outputs are rounded anyway)."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = (
        F.lit(_AS_A[0]) * t
        + F.lit(_AS_A[1]) * t * t
        + F.lit(_AS_A[2]) * t * t * t
        + F.lit(_AS_A[3]) * t * t * t * t
        + F.lit(_AS_A[4]) * t * t * t * t * t
    )
    return F.lit(1.0) - poly * F.exp(-(x * x))


def normal_sf(x: Column) -> Column:
    """Upper-tail P(Z > x) for x >= 0: (1 - erf(x/sqrt(2))) / 2."""
    return (F.lit(1.0) - erf_approx(x / F.lit(2.0**0.5))) / F.lit(2.0)


def ab_ztest(
    df: DataFrame,
    experiment_col: str,
    variant_col: str,
    metric_col: str,
    control: str = "A",
    treatment: str = "B",
) -> DataFrame:
    """Per-experiment Welch z-test between two arms → one row per
    experiment: per-arm n/mean, the mean lift, the Welch standard
    error sqrt(s²_A/n_A + s²_B/n_B), the z statistic and the two-sided
    normal-approximation p-value. One aggregate pass: each arm's
    moments ride as conditional aggregates, so the fact table shuffles
    once on the experiment key with map-side combine. Arms with n < 2
    (no variance) surface NULL z/p rather than a spurious zero."""
    v = F.col(variant_col)
    m = F.col(metric_col).cast("double")

    def arm(tag: str, fn, alias: str) -> Column:
        return fn(F.when(v == tag, m)).alias(alias)

    agg = df.groupBy(experiment_col).agg(
        arm(control, F.count, "n_a"),
        arm(control, F.avg, "mean_a"),
        arm(control, F.var_samp, "var_a"),
        arm(treatment, F.count, "n_b"),
        arm(treatment, F.avg, "mean_b"),
        arm(treatment, F.var_samp, "var_b"),
    )
    se = F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    z = (F.col("mean_b") - F.col("mean_a")) / se
    return agg.select(
        experiment_col,
        "n_a",
        F.round("mean_a", 6).alias("mean_a"),
        "n_b",
        F.round("mean_b", 6).alias("mean_b"),
        F.round(F.col("mean_b") - F.col("mean_a"), 6).alias("lift"),
        F.round(se, 6).alias("se"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(2.0) * normal_sf(F.abs(z)), 6).alias("p_value"),
    )
