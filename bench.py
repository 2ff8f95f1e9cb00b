#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "lsh_recall": <r>, ...}

Each query is forced end-to-end with a noop-format write (full
computation of every output column, no driver-side collect), except the
recall measurement which needs the result sets. The ingest path runs the
full v2 daily pipeline (watermark probe → increment → append → compact)
into a temp TableStore.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Representative slice of the operator surface: scan/projection shape,
# window dedup, broadcast enrich, monthly agg, heavy relational, LLM ops.
HEADLINE = [
    "flagship",
    "projection_lineage",
    "dedup_latest",
    "enrich_broadcast",
    "month_agg",
    "tpch_q1",
    "tpch_q3",
    "window_rank",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "simhash_pairs",
]

# Query-set size for the ANN head-to-head (brute vs LSH on the same
# workload). Large enough that the per-corpus signature cost amortizes —
# at 20 queries brute force wins by doing 10x less total work; the
# crossover on the sf0.1 corpus (2000 vecs) is ~100 queries.
ANN_QUERIES = 400


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from from_superset_to_clickhouse_spark.operators import similarity as simi
    from from_superset_to_clickhouse_spark.plans.reference_pipelines import v2_daily_load
    from from_superset_to_clickhouse_spark.session import get_spark
    from from_superset_to_clickhouse_spark.sources.testdata import load_table
    from from_superset_to_clickhouse_spark.tablestore import TableStore

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup so the first timed query isn't billed for startup.
    load_table(spark, SF_DIR, "events").limit(100).write.format("noop").mode(
        "overwrite"
    ).save()

    qmap = entrymod.queries()
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    for name in HEADLINE:
        timed(
            name,
            lambda n=name: qmap[n](spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    # End-to-end v2 ingest pipeline into a throwaway store.
    tmp = tempfile.mkdtemp(prefix="bench_store_")
    try:
        ev = load_table(spark, SF_DIR, "events")
        timed(
            "ingest_v2_pipeline",
            lambda: v2_daily_load(
                TableStore(spark, tmp), ev, entrymod.EVENTS, "ts"
            ),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ANN head-to-head on an identical workload: exact brute-force vs
    # SRP-LSH — wall time for both, recall of LSH against the exact sets.
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    queries_df = emb.filter(F.col("vec_id") < ANN_QUERIES)
    t0 = time.monotonic()
    truth_rows = simi.brute_force_topk(emb, queries_df, k=5).collect()
    timings["ann_brute_force"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    approx_rows = simi.lsh_topk(emb, queries_df, k=5).collect()
    timings["ann_lsh"] = round(time.monotonic() - t0, 3)
    truth = {(r["q_id"], r["n_id"]) for r in truth_rows}
    approx = {(r["q_id"], r["n_id"]) for r in approx_rows}
    lsh_recall = round(len(truth & approx) / max(len(truth), 1), 3)
    lsh_speedup = round(timings["ann_brute_force"] / max(timings["ann_lsh"], 1e-9), 2)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "lsh_recall": lsh_recall,
        "lsh_speedup": lsh_speedup,
        "cpus": int(CPUS),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
