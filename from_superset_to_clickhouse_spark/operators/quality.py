"""Declarative data-quality expectations — the pipeline admission gate.

An ingest at 100 TB needs machine-checkable contracts, not eyeballs:
each expectation compiles to a Catalyst boolean column, so one pass
yields either the per-check violation counts (``validate`` — a single
wide aggregate, map-side combined) or the failing rows tagged with every
reason they failed (``violations`` — filter + array of reason strings,
feeding a quarantine table). Uniqueness is the one non-row-local check;
it runs as a keyed count in the same job.

All checks are pure expressions (no Python), and each has an exact ANSI
twin — the oracle entry replays planted violations row for row.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named expectation: ``passed`` is a boolean Column over a row
    (true = ok). NULL evaluates as a violation unless the check says
    otherwise — an unknown value does not satisfy a contract."""

    name: str
    passed: Column


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    c: Column = F.lit(True)
    if lo is not None:
        c = c & (F.col(col) >= F.lit(lo))
    if hi is not None:
        c = c & (F.col(col) <= F.lit(hi))
    return Check(f"in_range_{col}", F.coalesce(c, F.lit(False)))


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches_{col}",
        F.coalesce(F.col(col).rlike(pattern), F.lit(False)),
    )


def isin(col: str, allowed: Sequence) -> Check:
    return Check(
        f"isin_{col}", F.coalesce(F.col(col).isin(list(allowed)), F.lit(False))
    )


def _ok(ch: Check) -> Column:
    """The Check contract ('NULL evaluates as a violation') is enforced
    HERE, centrally — a user-supplied Check whose ``passed`` expression
    evaluates to NULL must count as failing even if its constructor
    forgot to coalesce (the built-ins above coalesce only to keep their
    SQL twins line-for-line)."""
    return F.coalesce(ch.passed, F.lit(False))


def _with_flags(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    out = df
    for ch in checks:
        out = out.withColumn(f"_ok_{ch.name}", _ok(ch))
    return out


def validate(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Violation counts per check + total rows — ONE wide aggregate over
    one scan (every count is a conditional sum in the same partial/final
    HashAggregate pair), then the 1×N row unpivots with ``stack``.
    Fully LAZY: no driver collect, so the result composes with further
    transformations and the plan audit sees the real aggregate."""
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.count(F.when(~_ok(ch), F.lit(1))).alias(f"_v_{i}")
        for i, ch in enumerate(checks)
    ]
    pairs = ", ".join(
        f"'{ch.name}', _v_{i}" for i, ch in enumerate(checks)
    )
    return df.agg(*aggs).selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check, n_violations)",
        "_total AS n_rows",
    )


def violations(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Failing rows + the array of check names they violate (quarantine
    feed). Row-local filter — no shuffle; the reasons array is built
    from the same boolean columns the counts use."""
    flagged = _with_flags(df, checks)
    reasons = F.array_compact(
        F.array(
            *[
                F.when(~F.col(f"_ok_{ch.name}"), F.lit(ch.name))
                for ch in checks
            ]
        )
    )
    failed = F.size(reasons) > 0
    return (
        flagged.withColumn("_reasons", reasons)
        .filter(failed)
        .drop(*[f"_ok_{ch.name}" for ch in checks])
        .withColumnRenamed("_reasons", "violated_checks")
    )


def orphans(
    df: DataFrame, col: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Referential-integrity probe: rows whose ``col`` has no match in
    the dimension — a broadcast LEFT ANTI join (the dim key set ships to
    every executor; the fact never shuffles). NULL keys are orphans (an
    unknown reference does not satisfy the contract), matching anti-join
    semantics exactly — use NOT EXISTS, not NOT IN, for an SQL twin."""
    keys = dim.select(F.col(dim_key).alias(col)).distinct()
    return df.join(F.broadcast(keys), col, "left_anti")


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Uniqueness check (the non-row-local one): key tuples appearing
    more than once, with their multiplicity — one keyed aggregate."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def value_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier detection per group: rows whose ``value_col``
    falls outside [q1 - k·IQR, q3 + k·IQR] of their group — the
    data-quality anomaly gate (flag a batch's wild values per
    event-type/source before they poison downstream aggregates).

    Scale shape: one exact-percentile aggregate per group (the group
    dimension is small — event types, sources; at extreme group
    cardinality swap ``percentile`` for ``approx_percentile``, same
    call shape, t-digest one-pass) broadcast back onto the fact scan —
    the fact table is scanned once and never shuffled. Returns the
    flagged rows with their group's fences attached."""
    fences = (
        df.groupBy(*group_cols)
        .agg(
            F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
            F.expr(f"percentile({value_col}, 0.75)").alias("_q3"),
        )
        .select(
            *group_cols,
            F.round(F.col("_q1") - k * (F.col("_q3") - F.col("_q1")), 6).alias(
                "lo_fence"
            ),
            F.round(F.col("_q3") + k * (F.col("_q3") - F.col("_q1")), 6).alias(
                "hi_fence"
            ),
        )
    )
    return df.join(F.broadcast(fences), list(group_cols)).filter(
        (F.col(value_col) < F.col("lo_fence"))
        | (F.col(value_col) > F.col("hi_fence"))
    )
