"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our session) handles most skew at runtime; these explicit
operators cover the cases AQE can't:

- a single hot GROUP BY key whose partial aggregate still lands on one
  reducer (AQE splits join partitions, not aggregation groups);
- sort-merge joins against a hot key where the skewed side must be
  salted and the other side replicated.

Both are pure DataFrame compositions — the classic two-stage shapes,
oracle-checkable because results are exactly equal to the unsalted
plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the whole row. Deterministic
    across task retries (unlike rand()/monotonically_increasing_id), so
    a recomputed partition salts identically."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """GROUP BY with a hot key: two-stage aggregation via salting →
    (keys..., n, sum_value, max_value).

    Stage 1 aggregates on (keys, salt) — the hot key's rows spread over
    ``buckets`` reducers; stage 2 re-aggregates the ``buckets`` partial
    rows per key. Only works for re-aggregable functions (count/sum/
    min/max here; avg = sum/count downstream). Result is EXACTLY the
    plain groupBy (oracle-checked in ``__spark_entry__``).
    """
    partial = (
        df.withColumn(SALT_COL, _row_salt(df, buckets))
        .groupBy(*keys, SALT_COL)
        .agg(
            F.count("*").alias("_n"),
            F.sum(value_col).alias("_sum"),
            F.max(value_col).alias("_max"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        F.sum("_sum").alias("sum_value"),
        F.max("_max").alias("max_value"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with a skewed big side: salt big rows into ``buckets``,
    replicate every small row across all buckets, join on (key, salt).

    The hot key's rows land on ``buckets`` different reducers instead of
    one. Costs ``buckets``× the small side (shuffled, not broadcast —
    when the small side fits in memory just use ``F.broadcast`` and no
    salting is needed at all). Output columns = big's then small's
    non-key columns, same as ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salted_big = big.withColumn(SALT_COL, _row_salt(big, buckets))
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return salted_big.join(salted_small, [on, SALT_COL], how).drop(SALT_COL)
