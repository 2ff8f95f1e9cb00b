"""Classifier / ranking evaluation over distributed prediction logs.

The reference's consumers score Superset-fed models offline; these are
the standard offline metrics (ROC AUC, calibration, WoE/IV) expressed
as one- or two-pass Catalyst aggregates so a 100 TB prediction log
reduces map-side: no per-row Python, no driver-side sort of the corpus.

Numeric determinism: AUC uses midranks (multiples of 0.5 — every sum
is exact in IEEE doubles), Brier re-quantizes squared errors onto the
2^-20 grid (power-of-two multiply is exact), so Spark and any SQL
oracle agree bit-for-bit before the final 6dp round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = float(1 << 20)


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Exact ROC AUC per group → (group…, n_pos, n_neg, auc,
    gini_idx): the rank-sum formulation AUC = (R⁺ − n⁺(n⁺+1)/2) /
    (n⁺·n⁻) with average (mid)ranks over tied scores — identical to
    trapezoidal ROC integration with ties, and computable in one
    per-distinct-score aggregate + one prefix window instead of a
    global sort of the corpus (scores collapse to their distinct
    values first, so the window input is bounded by score
    cardinality). gini_idx = 2·AUC − 1."""
    gcols = list(group_cols or [])
    src = df.select(
        *gcols,
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    pv = src.groupBy(*gcols, "_s").agg(
        F.count(F.when(F.col("_y") == 1, 1)).alias("_cp"),
        F.count(F.when(F.col("_y") == 0, 1)).alias("_cn"),
    )
    w = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    ).orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    t = pv.withColumn("_t", F.col("_cp") + F.col("_cn")).withColumn(
        "_bef", F.coalesce(F.sum("_t").over(w), F.lit(0))
    )
    midrank = F.col("_bef") + (F.col("_t") + F.lit(1.0)) / 2.0
    agg = t.groupBy(*gcols).agg(
        F.sum("_cp").alias("n_pos"),
        F.sum("_cn").alias("n_neg"),
        F.sum(midrank * F.col("_cp")).alias("_rp"),
    )
    np_, nn_ = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (F.col("_rp") - np_ * (np_ + 1.0) / 2.0) / (np_ * nn_)
    return agg.select(
        *gcols,
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini_idx"),
    )


def classifier_eval(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    threshold: float = 0.5,
    bins: int = 10,
) -> DataFrame:
    """Thresholded-classifier scorecard → single row (n, tp, fp, tn,
    fn, accuracy, precision_, recall, f1, brier, ece): confusion
    counts at ``threshold``, the Brier score, and expected calibration
    error over ``bins`` equal-width probability bins (the reliability-
    diagram summary).

    One conditional-aggregate pass for the confusion counts + Brier
    (squared errors re-quantized to the 2^-20 grid → exact integer
    sum), one tiny groupBy over ≤ ``bins`` rows for ECE. Callers
    should hand in probabilities already on a deterministic grid."""
    src = df.select(
        F.col(prob_col).cast("double").alias("_p"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_p").isNotNull() & F.col("_y").isNotNull())
    pred = (F.col("_p") >= F.lit(threshold)).cast("int")
    e = F.col("_p") - F.col("_y").cast("double")
    conf = src.agg(
        F.count("*").alias("n"),
        F.sum(((pred == 1) & (F.col("_y") == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (F.col("_y") == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (F.col("_y") == 0)).cast("long")).alias("tn"),
        F.sum(((pred == 0) & (F.col("_y") == 1)).cast("long")).alias("fn"),
        (F.sum(F.floor(e * e * _Q)) / _Q).alias("_se"),
    )
    b = src.groupBy(
        F.least(F.floor(F.col("_p") * bins), F.lit(bins - 1)).alias("_b")
    ).agg(
        F.count("*").alias("_nb"),
        F.avg("_p").alias("_pb"),
        F.avg(F.col("_y").cast("double")).alias("_yb"),
    )
    ece = b.crossJoin(conf.select("n")).agg(
        F.sum(
            F.col("_nb").cast("double")
            / F.col("n")
            * F.abs(F.col("_pb") - F.col("_yb"))
        ).alias("_ece")
    )
    tp, fp, fn = (F.col(c).cast("double") for c in ("tp", "fp", "fn"))
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    return conf.crossJoin(ece).select(
        "n",
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(
            (F.col("tp") + F.col("tn")).cast("double") / F.col("n"), 6
        ).alias("accuracy"),
        F.round(prec, 6).alias("precision_"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                prec + rec > 0, 2.0 * prec * rec / (prec + rec)
            ),
            6,
        ).alias("f1"),
        F.round(F.col("_se") / F.col("n"), 6).alias("brier"),
        F.round("_ece", 6).alias("ece"),
    )


def woe_iv(
    df: DataFrame, bucket_col: str, label_col: str
) -> DataFrame:
    """Weight of Evidence / Information Value per feature bucket →
    (bucket, n_pos, n_neg, woe, iv_term): the credit-scoring /
    feature-screening standard. WoE_b = ln((pos_b+0.5)/P ÷
    (neg_b+0.5)/N) with Laplace 0.5 smoothing so empty cells stay
    finite; iv_term = (pos_share − neg_share)·WoE_b, Σ iv_term = IV.

    One groupBy over buckets; the marginals join is a broadcast of a
    1-row aggregate. Bucket count is the caller's binning, so the
    shuffle is bounded by #buckets."""
    cells = (
        df.select(
            F.col(bucket_col).alias("bucket"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .filter(F.col("bucket").isNotNull() & F.col("_y").isNotNull())
        .groupBy("bucket")
        .agg(
            F.sum((F.col("_y") == 1).cast("long")).alias("n_pos"),
            F.sum((F.col("_y") == 0).cast("long")).alias("n_neg"),
        )
    )
    tot = cells.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn")
    )
    j = cells.crossJoin(F.broadcast(tot))
    ps = (F.col("n_pos") + 0.5) / F.col("_tp").cast("double")
    ns = (F.col("n_neg") + 0.5) / F.col("_tn").cast("double")
    woe = F.log(ps / ns)
    return j.select(
        "bucket",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((ps - ns) * woe, 6).alias("iv_term"),
    )
