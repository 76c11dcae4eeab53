"""Classifier evaluation over scored tables: exact AUC and calibration.

The eval half of the quality-probe workflow (``vector.quality_probe``
scores documents; these metrics grade the scorer against labels) — the
operators an in-warehouse model-eval loop needs without exporting to
sklearn.

Scale shapes:

- :func:`binary_auc` — exact Mann-Whitney AUC from the DISTINCT-SCORE
  histogram: one grouped count per distinct score, a cumulative window
  over that (small) histogram — never a global sort of the rows.  With
  quantized scores (any fixed-decimal model output) the histogram is
  bounded regardless of row count.  Tie handling is exact (ties
  contribute half), all pair counting in BIGINT.
- :func:`calibration_bins` — reliability diagram: fixed integer bin
  edges (no data-dependent quantiles), one grouped aggregation with
  decimal-exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col,
    decimals: int = 9,
) -> DataFrame:
    """Exact ROC AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻).

    ``label_col`` may be a column name or a boolean Column expression.
    Returns one row ``(n_pos, n_neg, auc)``.  Pair counting is integer:
    won = Σ_s n_pos(s)·cum_neg(<s), ties = Σ_s n_pos(s)·n_neg(s),
    auc = (won + ties/2) / (n_pos·n_neg).
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    hist = (
        df.select(
            F.col(score_col).alias("_s"),
            lab.cast("boolean").cast("int").alias("_y"),
        )
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("bigint").alias("_np"),
            F.sum(1 - F.col("_y")).cast("bigint").alias("_nn"),
        )
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    scored = hist.withColumn(
        "_cum_neg_below", F.coalesce(F.sum("_nn").over(w), F.lit(0))
    )
    auc = F.round(
        (
            F.sum(F.col("_np") * F.col("_cum_neg_below")).cast("double")
            + F.sum(F.col("_np") * F.col("_nn")).cast("double") / 2.0
        )
        / (F.sum("_np").cast("double") * F.sum("_nn").cast("double")),
        decimals,
    )
    # single-class input has no ranking pairs: report NULL explicitly
    # instead of a 0/0 NaN leaking into downstream comparisons
    return scored.agg(
        F.sum("_np").alias("n_pos"),
        F.sum("_nn").alias("n_neg"),
        F.when(
            (F.sum("_np") > 0) & (F.sum("_nn") > 0), auc
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col,
    lo: float = -5.0,
    hi: float = 5.0,
    bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Reliability diagram over FIXED bin edges on [lo, hi): per bin,
    row count, mean score, and the observed positive rate.  Fixed edges
    (not data quantiles) keep the pass single-scan and the bins stable
    across batches — per-batch bin tables are mergeable by summing the
    decimal partials."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    s = F.col(score_col)
    width = (hi - lo) / bins
    bin_id = F.least(
        F.greatest(
            F.floor((s - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    agg = (
        df.select(
            bin_id.alias("bin"),
            s.alias("_s"),
            lab.cast("boolean").cast("int").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_s").cast("decimal(38,6)")).alias("_ss"),
            F.sum("_y").cast("bigint").alias("_pos"),
        )
    )
    return agg.select(
        "bin",
        "n",
        F.round(F.col("_ss").cast("double") / F.col("n"), decimals).alias(
            "mean_score"
        ),
        F.round(F.col("_pos").cast("double") / F.col("n"), decimals).alias(
            "pos_rate"
        ),
    ).orderBy("bin")


def recall_at_k(
    truth: DataFrame, approx: DataFrame, id_col: str, k: int, decimals: int = 6
) -> DataFrame:
    """Retrieval recall@k: |approx ∩ truth| / k — grade an ANN index
    (LSH / IVF / PQ) against brute-force ground truth without leaving
    the engine.  Both inputs are top-k result sets (≤ k rows), so this
    is a join of two tiny frames."""
    hits = truth.select(id_col).join(approx.select(id_col), id_col).agg(
        F.count(F.lit(1)).alias("hits")
    )
    return hits.select(
        "hits",
        F.round(F.col("hits") / F.lit(float(k)), decimals).alias(f"recall_at_{k}"),
    )


def confusion_matrix(
    df: DataFrame,
    actual_col: str,
    predicted_col: str,
    decimals: int = 9,
) -> DataFrame:
    """Labeled-evaluation confusion matrix: one row per observed
    ``(actual, predicted)`` pair with the count and its share of the
    actual class — the accuracy/leakage readout for any classifier-like
    dataop (language ID vs labeled lang, NB source routing, quality
    tiers vs human labels).

    Plan: ONE groupBy on the pair key (map-side combinable), a
    broadcast-sized join back to per-actual totals (bounded by the
    label alphabet, not the corpus).  Exact BIGINT counts; the share is
    a single division of two exact integers."""
    pairs = df.groupBy(
        F.col(actual_col).alias("actual"),
        F.col(predicted_col).alias("predicted"),
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = pairs.groupBy("actual").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "actual")
        .select(
            "actual",
            "predicted",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("_tot").cast("double"),
                decimals,
            ).alias("share"),
        )
        .orderBy("actual", "predicted")
    )
