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
    "tpch_q8",
    "tpch_q21",
    "window_rank",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "curation_pipeline",
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
    raw_timings: dict[str, list[float]] = {}

    def _record(name: str, runs_sec: list[float], stat: str) -> None:
        # Keep every raw run + a dispersion figure so a shared-host spike
        # is visible in the artifact instead of silently flipping the
        # headline conclusion (r4's ANN numbers reversed sign run-to-run).
        raw_timings[name] = [round(r, 3) for r in runs_sec]
        lo = min(runs_sec)
        if stat == "median":
            s = sorted(runs_sec)
            val = s[len(s) // 2]
        else:
            val = lo
        timings[name] = round(val, 3)

    def timed(name, fn, runs: int = 3, stat: str = "min"):
        # min-of-3: the steady-state wall time. The host is shared — a
        # co-scheduled process can inflate a single run several-fold; the
        # min of back-to-back runs reports the engine's own cost, and the
        # raw runs + dispersion expose how noisy the window was.
        rs = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            rs.append(time.monotonic() - t0)
        _record(name, rs, stat)

    for name in HEADLINE:
        timed(
            name,
            lambda n=name: qmap[n](spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
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
    )

    # End-to-end v2 ingest pipeline into a throwaway store. Each run
    # gets a FRESH store dir (a second run into the same store would be
    # an incremental no-op, not a rerun); min-of-3 like the headline
    # queries — this path is disk-write-bound and the noisiest entry on
    # a shared host.
    ev = load_table(spark, SF_DIR, "events")
    dirs: list[str] = []

    def run_ingest():
        tmp = tempfile.mkdtemp(prefix="bench_store_")
        dirs.append(tmp)
        v2_daily_load(TableStore(spark, tmp), ev, entrymod.EVENTS, "ts")

    try:
        timed("ingest_v2_pipeline", run_ingest)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

    # ANN suite: exact vectorized scan (the truth set), SRP-LSH, and IVF,
    # all answering the same query slice against the full corpus. Headline
    # comparison is queries/sec on the same corpus + measured recall.
    # Every published operating point has measured recall >= 0.8; the
    # band_bits=8 "lsh_fast" point (recall 0.169 at r4) was dropped — on
    # near-random fixtures that pruning level can't reach a defensible
    # recall, and publishing it invites misuse.
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_corpus = emb.count()
    ann_q = emb.filter(F.col("vec_id") < ANN_QUERIES).cache()
    n_queries = ann_q.count()

    def timed_collect(name, fn, runs: int = 5):
        # Median-of-5 for the ANN suite: these are the entries whose r4
        # conclusions flipped sign under shared-host contention (min-of-2
        # does not tame multi-second distributed jobs). The first run's
        # rows feed the recall computation (results are deterministic —
        # every run returns the same set).
        rows = None
        rs = []
        for _ in range(runs):
            t0 = time.monotonic()
            got = fn()
            rs.append(time.monotonic() - t0)
            if rows is None:
                rows = got
        _record(name, rs, stat="median")
        return rows

    truth_rows = timed_collect(
        "ann_exact_vectorized",
        lambda: simi.brute_force_topk(emb, ann_q, k=5).collect(),
    )
    lsh_rows = timed_collect(
        "ann_lsh", lambda: simi.lsh_topk(emb, ann_q, k=5).collect()
    )
    ivf_rows = timed_collect(
        "ann_ivf", lambda: simi.ivf_topk(emb, ann_q, k=5).collect()
    )
    hof_q = emb.filter(F.col("vec_id") < ANN_HOF_QUERIES)
    # Same median-of-5 policy as the rest of the ANN suite: the
    # arrow_over_expression ratio must not mix a median numerator with
    # a min denominator.
    timed(
        "ann_exact_hof_slice",
        lambda: simi.brute_force_topk(emb, hof_q, k=5, vectorized=False)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        runs=5,
        stat="median",
    )
    truth = {(r["q_id"], r["n_id"]) for r in truth_rows}
    lsh = {(r["q_id"], r["n_id"]) for r in lsh_rows}
    ivf = {(r["q_id"], r["n_id"]) for r in ivf_rows}
    lsh_recall = round(len(truth & lsh) / max(len(truth), 1), 3)
    ivf_recall = round(len(truth & ivf) / max(len(truth), 1), 3)
    qps = {
        "exact_vectorized": round(n_queries / max(timings["ann_exact_vectorized"], 1e-9), 1),
        "exact_hof": round(ANN_HOF_QUERIES / max(timings["ann_exact_hof_slice"], 1e-9), 1),
        "lsh": round(n_queries / max(timings["ann_lsh"], 1e-9), 1),
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
    dispersion = {
        n: round((max(rs) - min(rs)) / max(min(rs), 1e-9), 3)
        for n, rs in raw_timings.items()
    }
    out = {
        "metric": "headline_queries_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "raw_timings": raw_timings,
        "dispersion": dispersion,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "lsh_recall": lsh_recall,
        "ivf_recall": ivf_recall,
        "lsh_speedup_vs_exact": lsh_speedup,
        "ivf_speedup_vs_exact": ivf_speedup,
        "arrow_over_expression_speedup": arrow_over_expr,
        "ann_queries_per_sec": qps,
        "ann_corpus_size": n_corpus,
        "ann_n_queries": n_queries,
        "ann_k": 5,
        "cpus": int(CPUS),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
