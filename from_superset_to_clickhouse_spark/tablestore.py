"""TableStore: partitioned-Parquet tables with ClickHouse-table semantics.

Maps the reference's four physical table roles (SURVEY.md §1.1) onto Spark:

- ReplicatedMergeTree / partitioned fact store  → partitioned Parquet dir
  (``v1/sql/create_table.sql:15-17``)
- ReplicatedReplacingMergeTree (last-write-wins upsert)
  → explicit dedup key + version column; correct-on-read ``latest_view`` +
  periodic ``compact()`` rewrite — mirrors ClickHouse's "correct on
  SELECT FINAL, eventual on disk" (``v2/sql/create_tables.sql:15-17``)
- Distributed(…, id) sharding → Spark's native shuffle partitioning;
  ``repartition(shard_by)`` applied before write for co-location
  (``v2/sql/create_tables.sql:19-21``)
- ALTER TABLE … REPLACE PARTITION atomic swap → dynamic partition
  overwrite (``v1/dag.py:96-102``)

Scale notes: every write path repartitions by the shard key (co-located
joins downstream), sorts within partitions by the sort key (Parquet
min/max stats → data skipping, the ``ORDER BY id`` analog), and the
dedup view is a single window over the dedup key — one shuffle, AQE-skew
tolerant.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.functions.scalar import month_floor
from from_superset_to_clickhouse_spark.schema import Schema

INGEST_SEQ_COL = "_ingest_seq"
META_FILE = "_table_meta.json"

# Derived partition columns the engine knows how to materialize. The
# reference's only derived partition expr is date_trunc('month', dttm)
# (``v1/sql/create_table.sql:16``).
_DERIVED_PARTITIONS = {
    "dttm_month": lambda: month_floor("dttm").cast("date"),
    "ts_month": lambda: month_floor("ts").cast("date"),
}


@dataclass
class TableStore:
    """A named collection of partitioned Parquet tables under ``root``."""

    spark: SparkSession
    root: str

    # -- lifecycle (SURVEY §2.7 rows 33-37) ---------------------------------

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), META_FILE))

    def create(self, schema: Schema, if_not_exists: bool = True) -> None:
        """CREATE TABLE (IF NOT EXISTS): persist schema + layout metadata."""
        p = self.path(schema.name)
        if self.exists(schema.name):
            if if_not_exists:
                return
            raise ValueError(f"table {schema.name} already exists")
        os.makedirs(p, exist_ok=True)
        meta = {
            "fields": [[f.name, f.dtype, f.nullable, f.default] for f in schema.fields],
            "dedup_key": list(schema.dedup_key),
            "version_col": schema.version_col,
            "partition_by": list(schema.partition_by),
            "sort_by": list(schema.sort_by),
            "shard_by": schema.shard_by,
            "ingest_seq": 0,
        }
        with open(os.path.join(p, META_FILE), "w") as f:
            json.dump(meta, f)

    def drop(self, name: str, if_exists: bool = True) -> None:
        p = self.path(name)
        if not os.path.exists(p):
            if if_exists:
                return
            raise ValueError(f"table {name} does not exist")
        shutil.rmtree(p)

    def rename(self, old: str, new: str) -> None:
        """RENAME TABLE x TO y (reference migration step, v2/README.MD:24-27)."""
        os.rename(self.path(old), self.path(new))

    def _meta(self, name: str) -> dict:
        with open(os.path.join(self.path(name), META_FILE)) as f:
            return json.load(f)

    def _save_meta(self, name: str, meta: dict) -> None:
        tmp = os.path.join(self.path(name), META_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path(name), META_FILE))

    def _next_ingest_seq(self, name: str) -> int:
        meta = self._meta(name)
        meta["ingest_seq"] += 1
        self._save_meta(name, meta)
        return meta["ingest_seq"]

    # -- write paths (SURVEY §2.1 rows 2-4, 6; §2.7 row 36) -----------------

    def _prepare(self, name: str, df: DataFrame, seq: int) -> tuple[DataFrame, list[str]]:
        meta = self._meta(name)
        parts = meta["partition_by"]
        for p in parts:
            if p not in df.columns:
                if p not in _DERIVED_PARTITIONS:
                    raise ValueError(f"cannot derive partition column {p}")
                df = df.withColumn(p, _DERIVED_PARTITIONS[p]())
        # Ingest sequence: monotone batch counter — the "physically last
        # inserted wins" ordering ReplacingMergeTree uses when no version
        # column is declared.
        df = df.withColumn(INGEST_SEQ_COL, F.lit(seq))
        shard_by = meta.get("shard_by")
        if shard_by:
            df = df.repartition(F.col(shard_by))
        sort_by = meta.get("sort_by") or []
        if sort_by:
            df = df.sortWithinPartitions(*[F.col(c) for c in sort_by])
        return df, parts

    def append(self, name: str, df: DataFrame) -> None:
        """INSERT INTO … SELECT (append ingest)."""
        seq = self._next_ingest_seq(name)
        out, parts = self._prepare(name, df, seq)
        w = out.write.mode("append")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(os.path.join(self.path(name), "data"))

    def overwrite_partitions(self, name: str, df: DataFrame) -> None:
        """Atomic partition swap: replace exactly the partitions present in df.

        The Spark-native equivalent of the reference's staging-table +
        ``ALTER TABLE … REPLACE PARTITION`` flow (``v1/dag.py:83-104``) —
        dynamic partition overwrite touches only the months present in the
        staged data, leaving other partitions untouched. (And unlike the
        reference's ``partitions[0]`` bug, all staged partitions swap.)
        """
        seq = self._next_ingest_seq(name)
        out, parts = self._prepare(name, df, seq)
        if not parts:
            raise ValueError(f"table {name} is unpartitioned; use overwrite()")
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(os.path.join(self.path(name), "data"))
        )

    def overwrite(self, name: str, df: DataFrame) -> None:
        seq = self._next_ingest_seq(name)
        out, parts = self._prepare(name, df, seq)
        w = out.write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(os.path.join(self.path(name), "data"))

    # -- read paths ----------------------------------------------------------

    def read(self, name: str) -> DataFrame:
        """Raw read — may contain not-yet-compacted duplicate keys (the
        ClickHouse "SELECT without FINAL" view)."""
        data = os.path.join(self.path(name), "data")
        if not os.path.exists(data):
            meta = self._meta(name)
            from from_superset_to_clickhouse_spark.schema import Field, Schema as S

            fields = tuple(Field(n, t, nb, d) for n, t, nb, d in meta["fields"])
            schema = S(name, fields).to_struct_type().add(INGEST_SEQ_COL, "long")
            for p in meta["partition_by"]:
                if p not in [f.name for f in fields]:
                    schema = schema.add(p, "date")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(data)

    def latest_view(self, name: str) -> DataFrame:
        """Dedup-on-read: per dedup key keep the latest version — the
        deterministic ``SELECT … FINAL``. One window shuffle on the key.

        ReplacingMergeTree keeps the physically-last insert per ORDER BY key
        (``v2/sql/create_tables.sql:15``); we order by (version_col,
        _ingest_seq) so it's deterministic even for same-version rows.
        """
        meta = self._meta(name)
        df = self.read(name)
        key = meta["dedup_key"]
        if not key:
            return df.drop(INGEST_SEQ_COL)
        order = []
        if meta.get("version_col"):
            order.append(F.col(meta["version_col"]).desc())
        order.append(F.col(INGEST_SEQ_COL).desc())
        w = Window.partitionBy(*[F.col(k) for k in key]).orderBy(*order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", INGEST_SEQ_COL)
        )

    def compact(self, name: str) -> None:
        """Background-merge analog: collapse duplicate dedup keys on disk.

        For partitioned tables with a dedup key this is PARTITION-WISE:
        only partitions that actually contain duplicate keys are
        rewritten and swapped (mirrors ClickHouse, whose background
        merges — and REPLACE PARTITION — are per-partition; a 100 TB
        table with one hot month compacts only that month). Unpartitioned
        or keyless tables fall back to a full rewrite. ``latest_view``
        remains the globally-correct read regardless of compaction state.
        """
        meta = self._meta(name)
        parts = meta["partition_by"]
        key = meta["dedup_key"]
        if parts and key:
            self._compact_partitionwise(name, meta)
            return
        latest = self.latest_view(name)
        tmp = os.path.join(self.path(name), "data_compacting")
        parts = meta["partition_by"]
        out = latest.withColumn(INGEST_SEQ_COL, F.lit(meta["ingest_seq"]))
        sort_by = meta.get("sort_by") or []
        shard_by = meta.get("shard_by")
        if shard_by:
            out = out.repartition(F.col(shard_by))
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        w = out.write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(tmp)
        data = os.path.join(self.path(name), "data")
        old = data + f".old.{int(time.time() * 1000)}"
        if os.path.exists(data):
            os.rename(data, old)
        os.rename(tmp, data)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _compact_partitionwise(self, name: str, meta: dict) -> None:
        """Rewrite only the partitions that hold duplicate dedup keys.

        1. One agg finds (partition, key) groups with >1 row → the small
           set of affected partition values (collected — it is bounded by
           the partition count, not the data).
        2. Within-partition latest-per-key rows for those partitions are
           staged to a temp dir (window over (partition, key) — same
           scope as a ClickHouse merge).
        3. Each affected partition directory is swapped atomically.
        """
        parts = meta["partition_by"]
        key = meta["dedup_key"]
        df = self.read(name)
        dup_parts = [
            tuple(str(r[c]) for c in parts)
            for r in (
                df.groupBy(*parts, *key)
                .count()
                .filter(F.col("count") > 1)
                .select(*parts)
                .distinct()
                .collect()
            )
        ]
        if not dup_parts:
            return
        order = []
        if meta.get("version_col"):
            order.append(F.col(meta["version_col"]).desc())
        order.append(F.col(INGEST_SEQ_COL).desc())
        w = Window.partitionBy(*[F.col(c) for c in parts + key]).orderBy(*order)
        affected = F.concat_ws("\x00", *[F.col(c).cast("string") for c in parts]).isin(
            ["\x00".join(p) for p in dup_parts]
        )
        latest = (
            df.filter(affected)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        out = latest
        sort_by = meta.get("sort_by") or []
        shard_by = meta.get("shard_by")
        if shard_by:
            out = out.repartition(F.col(shard_by))
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        tmp = os.path.join(self.path(name), "data_compacting")
        out.write.mode("overwrite").partitionBy(*parts).parquet(tmp)
        data = os.path.join(self.path(name), "data")
        for values in dup_parts:
            rel = os.path.join(*[f"{c}={v}" for c, v in zip(parts, values)])
            src = os.path.join(tmp, rel)
            dst = os.path.join(data, rel)
            old = dst + f".old.{int(time.time() * 1000)}"
            if os.path.exists(dst):
                os.rename(dst, old)
            os.rename(src, dst)
            if os.path.exists(old):
                shutil.rmtree(old)
        shutil.rmtree(tmp)

    # -- metadata (SURVEY §2.7 row 38) ---------------------------------------

    def partitions(self, name: str) -> list[str]:
        """SHOW PARTITIONS analog (reference lists system.parts,
        ``v1/dag.py:88-94``)."""
        meta = self._meta(name)
        parts = meta["partition_by"]
        if not parts:
            return []
        data = os.path.join(self.path(name), "data")
        if not os.path.exists(data):
            return []
        found = []
        for entry in sorted(os.listdir(data)):
            if "=" in entry:
                found.append(entry)
        return found

    def delete_where(self, name: str, condition) -> int:
        """Retention delete (reference: Postgres ``DELETE … WHERE dttm <
        DATE_TRUNC('MONTH', NOW() - INTERVAL '30 MONTH')``, v2/dag.py:132-135).

        SQL DELETE semantics: rows where the predicate is NULL are KEPT
        (keep-predicate is ``NOT coalesce(cond, false)``). Implemented as
        anti-filter + overwrite; a delete matching every row removes the
        data directory entirely (``read()`` then serves the empty-schema
        fallback) instead of writing an empty Parquet dir that would break
        schema inference. Returns number of deleted rows.
        """
        df = self.read(name)
        before = df.count()
        kept = df.filter(~F.coalesce(condition, F.lit(False)))
        after = kept.count()
        if after == before:
            return 0
        data = os.path.join(self.path(name), "data")
        if after == 0:
            if os.path.exists(data):
                shutil.rmtree(data)
            return before
        meta = self._meta(name)
        tmp = os.path.join(self.path(name), "data_deleting")
        parts = meta["partition_by"]
        w = kept.write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(tmp)
        old = data + f".old.{int(time.time() * 1000)}"
        if os.path.exists(data):
            os.rename(data, old)
        os.rename(tmp, data)
        if os.path.exists(old):
            shutil.rmtree(old)
        return before - after
