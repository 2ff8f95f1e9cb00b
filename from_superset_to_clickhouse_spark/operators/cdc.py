"""Change-data capture: snapshot diffing and incremental aggregate
maintenance.

The reference refreshes its fact table by REPLACE PARTITION from a
staging load (``v1/dag.py:96-102``) — the consumer-side question "what
actually changed between two published snapshots" and the producer-side
question "how do I refresh a downstream aggregate without recomputing
history" are the two halves of that contract this module covers.

Both are pure DataFrame plans: the diff is one full-outer join on the
key (shuffle on the key, or broadcast when one side is small); the
aggregate merge is a union + re-aggregate of PARTIAL sums — never a
rescan of the full fact history.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots → key columns + ``change_type``
    ('added' | 'removed' | 'changed') — unchanged rows are dropped.

    One full-outer join on the key. ``compare_cols`` limits the change
    detection to specific columns (default: every non-key column both
    sides share). NULL-safe comparison (``<=>``), so NULL→value and
    value→NULL count as changes while NULL→NULL does not.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    # A literal presence marker per side: after the outer join it is
    # NULL exactly when that side had no row — compare columns can't
    # serve as markers because their values may legitimately be NULL.
    o = old.select(
        *keys,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    marked = o.join(n, list(keys), "full_outer")
    same: Column = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        marked.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def merge_partial_aggregates(
    existing: DataFrame,
    increment: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Incremental materialized-aggregate refresh: combine an existing
    aggregate table with the aggregate of a new increment by SUMMING the
    partial sums per key (counts are sums too). History is never
    rescanned — the cost is O(|existing agg| + |increment|), the
    SummingMergeTree/materialized-view refresh contract.

    Only works for decomposable aggregates (sum/count/min/max); ratios
    and averages must be stored as (numerator, denominator) partials and
    divided at read time.
    """
    cols = [*keys, *sum_cols]
    return (
        existing.select(*cols)
        .unionByName(increment.select(*cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Data-quality profile → one row per column: row count, null count,
    exact distinct count, min/max (rendered as strings so heterogeneous
    column types stack into one result).

    ONE pass over the data: every per-column aggregate lives in a single
    wide Aggregate (Spark computes them together, partial-aggregated
    map-side), then the 1×N row is unpivoted driver-side at zero cost.
    Exact distincts across many columns share the same scan via Spark's
    expand-based multi-distinct planning; swap in approx_count_distinct
    when profiling hundreds of columns at 100 TB.
    """
    if cols is None:
        cols = df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs).collect()[0]
    total = row["__total"]
    out = [
        (
            c,
            total,
            total - row[f"{c}__nn"],
            row[f"{c}__nd"],
            row[f"{c}__mn"],
            row[f"{c}__mx"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "col_name string, n_rows bigint, n_nulls bigint, "
        "n_distinct bigint, min_value string, max_value string",
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    effective_ts: Column,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge — the MERGE INTO
    emulation for history-keeping dims (closed rows never rewritten):

    - an open row (``valid_to`` NULL) whose incoming attributes DIFFER
      closes at ``effective_ts`` and a new open version is inserted;
    - an identical incoming row is a no-op (no spurious versions);
    - a key with no open row inserts a fresh open version;
    - already-closed history passes through untouched.

    ``changes`` must carry at most one row per key (pre-aggregate a
    batch to latest-per-key with ``latest_view`` semantics first). Plan
    shape: one outer join of the OPEN slice against the changes on the
    key (both sides shuffle on the key once; changes broadcast when
    small) + a NULL-safe attr comparison; history rows never join at
    all.
    """
    is_open = F.col(to_col).isNull()
    closed_hist = dim.filter(~is_open)
    open_rows = dim.filter(is_open)
    ch = changes.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_c_{c}") for c in attr_cols],
        effective_ts.alias("_ts"),
    )
    j = open_rows.join(ch, open_rows[key_col] == ch["_k"], "full_outer")
    same: Column = F.lit(True)
    for c in attr_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"_c_{c}"))
    both = F.col(key_col).isNotNull() & F.col("_k").isNotNull()
    only_dim = F.col(key_col).isNotNull() & F.col("_k").isNull()
    only_change = F.col(key_col).isNull() & F.col("_k").isNotNull()
    # rows that keep their current open version: untouched keys and
    # no-op (identical) changes
    keep_open = j.filter(only_dim | (both & same)).select(*dim.columns)
    # open versions whose attrs changed -> closed at the effective ts
    newly_closed = (
        j.filter(both & ~same)
        .withColumn(to_col, F.col("_ts"))
        .select(*dim.columns)
    )
    # new open versions: changed keys + brand-new keys
    inserts = (
        j.filter(only_change | (both & ~same))
        .select(
            F.col("_k").alias(key_col),
            *[F.col(f"_c_{c}").alias(c) for c in attr_cols],
            F.col("_ts").alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        )
    )
    return closed_hist.unionByName(keep_open).unionByName(
        newly_closed.unionByName(inserts)
    )
