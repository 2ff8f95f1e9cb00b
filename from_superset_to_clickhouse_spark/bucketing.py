"""Bucketed table layout — shuffle-free co-located joins at scale.

The reference's distributed tables shard rows by a key so same-key rows
land on the same node (``ENGINE=Distributed(.., rand())`` /
``intHash64``, reference ``v2/sql/create_tables.sql``); the Spark analog
that actually ELIMINATES work is bucketing: both join sides pre-hashed
into the same number of buckets on the join key at WRITE time, so a
later join reads matching buckets pairwise — no Exchange on either side,
which at 100 TB is the difference between a join that shuffles two
fact tables and one that streams them.

Buckets live in the session catalog (``saveAsTable``): Spark persists
the (column, count) bucket spec and plans bucket-local SortMergeJoins
and bucket-pruned point scans against it. On a cluster the catalog is
the (Hive/Glue/Unity) metastore; semantics are identical.

Rules of thumb encoded here:
- bucket counts must MATCH (or divide) across join partners;
- ``sortBy`` the join key inside each bucket so the SMJ needs no sort;
- size bucket count so one bucket ≈ one task's worth of data at target
  scale (128-512 MB), not by row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` into the catalog
    table ``table``. ``sort_col`` (default: the bucket column) sorts
    within each bucket file so downstream merge joins skip their sort
    phase. ``path`` pins the files to an explicit location (external
    table) instead of the warehouse dir."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (``spark.table`` —
    a raw ``read.parquet`` of the same files would drop the spec and
    reintroduce the shuffle)."""
    return spark.table(table)


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
    force_merge: bool = False,
) -> DataFrame:
    """Join two same-bucket-spec tables on their bucket key: plans a
    bucket-local SortMergeJoin with NO Exchange on either side (gated
    by ``tests/test_bucketing.py``). ``force_merge`` adds a MERGE join
    hint — at small scale the planner prefers broadcasting one side
    (which ignores the bucketing); the hint pins the shuffle-free SMJ
    the layout exists for, independent of the broadcast threshold."""
    left = read_bucketed(spark, left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(read_bucketed(spark, right_table), on, how)
