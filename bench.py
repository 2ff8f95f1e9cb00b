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
    "tpch_q6",
    "window_rank",
    "exact_dedup",
    "ngram_jaccard_pairs",
]

# ANN is measured on a deterministic query slice (vec_id < ANN_QUERIES)
# against the FULL corpus. Recall over 2000 queries × k=5 = 10k neighbor
# pairs is statistically equivalent to the full self-workload, at a
# fifth of the wall-clock; throughput is reported as queries/sec so the
# numbers are slice-size-independent. The pure-Catalyst
# (higher-order-function) exact scan gets a smaller slice still — it is
# O(|corpus| × |queries| × dim) with a per-element codegen lambda and
# exists only as the like-for-like cost model for the LSH speedup ratio.
ANN_QUERIES = 2000
ANN_HOF_QUERIES = 25


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
    # Python-worker warmup: spin up the Arrow worker pool so the first
    # mapInPandas-using query isn't billed for daemon startup either.
    spark.range(1024).repartition(int(CPUS)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    qmap = entrymod.queries()
    timings: dict[str, float] = {}

    def timed(name, fn, runs: int = 1):
        # min-of-N (N=2 for the cheap headline queries): the steady-state
        # wall time. The host is shared — a co-scheduled process can
        # inflate a single run several-fold; the min of two back-to-back
        # runs is the standard way to report the engine's own cost.
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    for name in HEADLINE:
        timed(
            name,
            lambda n=name: qmap[n](spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            runs=2,
        )

    # SimHash timed on the PRODUCTION xxhash64 family (the queries()
    # entry runs the md5 oracle family, which trades leaf-hash speed for
    # ANSI replicability — benching that would misstate the scale path).
    from from_superset_to_clickhouse_spark.operators import dedup as ddp

    timed(
        "simhash_pairs",
        lambda: ddp.simhash_pairs(load_table(spark, SF_DIR, "documents"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
        runs=2,
    )

    # End-to-end v2 ingest pipeline into a throwaway store. Each run
    # gets a FRESH store dir (a second run into the same store would be
    # an incremental no-op, not a rerun); min-of-2 like the headline
    # queries — this path is disk-write-bound and the noisiest entry on
    # a shared host.
    ev = load_table(spark, SF_DIR, "events")
    dirs: list[str] = []

    def run_ingest():
        tmp = tempfile.mkdtemp(prefix="bench_store_")
        dirs.append(tmp)
        v2_daily_load(TableStore(spark, tmp), ev, entrymod.EVENTS, "ts")

    try:
        timed("ingest_v2_pipeline", run_ingest, runs=2)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

    # ANN suite: exact vectorized scan (the truth set), SRP-LSH, and IVF,
    # all answering the same query slice against the full corpus. Headline
    # comparison is queries/sec on the same corpus + measured recall.
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    ann_q = emb.filter(F.col("vec_id") < ANN_QUERIES).cache()
    n_queries = ann_q.count()

    def timed_collect(name, fn):
        # Same min-of-2 policy as the headline loop; the first run's
        # rows feed the recall computation (results are deterministic —
        # both runs return the same set).
        t0 = time.monotonic()
        rows = fn()
        dt = time.monotonic() - t0
        t0 = time.monotonic()
        fn()
        timings[name] = round(min(dt, time.monotonic() - t0), 3)
        return rows

    truth_rows = timed_collect(
        "ann_exact_vectorized",
        lambda: simi.brute_force_topk(emb, ann_q, k=5).collect(),
    )
    lsh_rows = timed_collect(
        "ann_lsh", lambda: simi.lsh_topk(emb, ann_q, k=5).collect()
    )
    # Second LSH operating point: 8-bit bands prune candidates ~20x
    # harder. Reported alongside the default so the recall/speed curve
    # is measured, not asserted — near-random fixture embeddings are
    # LSH's worst case and the tradeoff is the honest story.
    lsh_fast_rows = timed_collect(
        "ann_lsh_fast",
        lambda: simi.lsh_topk(emb, ann_q, k=5, band_bits=8).collect(),
    )
    ivf_rows = timed_collect(
        "ann_ivf", lambda: simi.ivf_topk(emb, ann_q, k=5).collect()
    )
    hof_q = emb.filter(F.col("vec_id") < ANN_HOF_QUERIES)
    timed(
        "ann_exact_hof_slice",
        lambda: simi.brute_force_topk(emb, hof_q, k=5, vectorized=False)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        runs=2,
    )
    truth = {(r["q_id"], r["n_id"]) for r in truth_rows}
    lsh = {(r["q_id"], r["n_id"]) for r in lsh_rows}
    lsh_fast = {(r["q_id"], r["n_id"]) for r in lsh_fast_rows}
    ivf = {(r["q_id"], r["n_id"]) for r in ivf_rows}
    lsh_recall = round(len(truth & lsh) / max(len(truth), 1), 3)
    lsh_fast_recall = round(len(truth & lsh_fast) / max(len(truth), 1), 3)
    ivf_recall = round(len(truth & ivf) / max(len(truth), 1), 3)
    qps = {
        "exact_vectorized": round(n_queries / max(timings["ann_exact_vectorized"], 1e-9), 1),
        "exact_hof": round(ANN_HOF_QUERIES / max(timings["ann_exact_hof_slice"], 1e-9), 1),
        "lsh": round(n_queries / max(timings["ann_lsh"], 1e-9), 1),
        "lsh_fast": round(n_queries / max(timings["ann_lsh_fast"], 1e-9), 1),
        "ivf": round(n_queries / max(timings["ann_ivf"], 1e-9), 1),
    }
    # Honest speedups: ANN paths vs the REAL exact baseline (both Arrow-
    # vectorized, same machinery). At this fixture scale (2000 near-random
    # vectors) brute force is hard to beat — IVF still wins by pruning to
    # nprobe/ncells of the corpus; LSH pays candidate-join overhead that
    # only amortizes on larger/clustered corpora. The expression-twin
    # ratio isolates the Arrow-vs-per-pair-codegen lesson instead.
    lsh_speedup = round(qps["lsh"] / max(qps["exact_vectorized"], 1e-9), 2)
    ivf_speedup = round(qps["ivf"] / max(qps["exact_vectorized"], 1e-9), 2)
    arrow_over_expr = round(qps["exact_vectorized"] / max(qps["exact_hof"], 1e-9), 1)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "lsh_recall": lsh_recall,
        "lsh_fast_recall": lsh_fast_recall,
        "ivf_recall": ivf_recall,
        "lsh_speedup_vs_exact": lsh_speedup,
        "lsh_fast_speedup_vs_exact": round(
            qps["lsh_fast"] / max(qps["exact_vectorized"], 1e-9), 2
        ),
        "ivf_speedup_vs_exact": ivf_speedup,
        "arrow_over_expression_speedup": arrow_over_expr,
        "ann_queries_per_sec": qps,
        "cpus": int(CPUS),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
