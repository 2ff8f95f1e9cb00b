"""Similarity search: brute-force correctness vs numpy, LSH recall."""

import math

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators import similarity as simi
from from_superset_to_clickhouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_matches_numpy(spark):
    df = _vecs(spark)
    got = simi.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(map(tuple, got.collect()))
    # Neighbor order for query 0: vec 1 (cos≈0.9939), then 2/3 (cos=0).
    assert [r[1] for r in rows] == [1, 2]
    assert abs(rows[0][2] - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-4


def test_brute_force_excludes_self(spark):
    df = _vecs(spark)
    got = simi.brute_force_topk(df, df, k=3)
    assert got.filter(F.col("q_id") == F.col("n_id")).count() == 0


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["q_id"], r["n_id"])
        for r in simi.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["q_id"], r["n_id"])
        for r in simi.lsh_topk(emb, queries, k=5).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"lsh_topk default recall {recall}"


def test_ivf_topk_recall(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["q_id"], r["n_id"])
        for r in simi.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["q_id"], r["n_id"])
        for r in simi.ivf_topk(emb, queries, k=5).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.7, f"ivf_topk default recall {recall}"


def test_embedding_dedup_finds_planted_copies(spark):
    emb = load_table(spark, SF, "embeddings")
    copies = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(copies)
    found = {
        (r["id_a"], r["id_b"])
        for r in simi.embedding_dedup_pairs(both, threshold=0.95).collect()
    }
    assert found == {(i, i + 10000) for i in range(30)}
