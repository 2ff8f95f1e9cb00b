"""SparkSession factory with scale-oriented defaults.

The reference outsources all execution to ClickHouse; here Catalyst +
Tungsten take that role, so the session config is where the "physical
design" lives: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow for any pandas interop, broadcast threshold sized for
dimension tables, dynamic partition overwrite for the partition-swap
publisher (reference: ``ALTER TABLE … REPLACE PARTITION``,
``upload_superset_logs_to_clickhouse_v1/upload_superset_logs_to_clickhouse.py:96-102``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "from_superset_to_clickhouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS|*]``. All settings are safe at
    cluster scale — nothing here assumes single-node.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Runtime re-planning: coalesce post-shuffle partitions, split skewed
        # joins, convert SMJ→BHJ when runtime stats allow. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables (customer/part/nation ≈ ab_user/dashboards dicts)
        # should broadcast — the Spark analog of ClickHouse hashed dictionaries.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r15 optimization round (guide §3.1/§9): let the planner pick a
        # shuffled-hash join where its size conditions hold instead of
        # always sort-merge — SHJ skips the per-partition sort, and the
        # planner/AQE only choose it when the build side of each
        # partition fits in memory, so the sizing guard (and AQE skew
        # splitting, which supports SHJ) still applies at 100 TB.
        # Measured on the sf0.1 join-heavy entries (3 interleaved A/B
        # rounds): url_snapshot_dedup 6.7→4.3 s, hybrid_retrieval
        # 6.5→3.9 s, cut_spans 5.2→3.5 s, subset total −22%. Flip back
        # with SPARK_GRAFT_PREFER_SMJ=1 (e.g. spill-fragile clusters).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true"
            if os.environ.get("SPARK_GRAFT_PREFER_SMJ") == "1"
            else "false",
        )
        # Arrow-accelerated toPandas/createDataFrame and pandas UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Partition-swap publisher: overwrite exactly the partitions present
        # in the staged DataFrame (the REPLACE PARTITION analog).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
