"""Pairwise-preference aggregation: Bradley-Terry strength scores.

RLHF / preference-data pipelines collect millions of pairwise
comparisons (A beat B) from raters or reward models and need a global
item ranking plus per-item strength.  The Bradley-Terry model
``P(i beats j) = s_i / (s_i + s_j)`` fit by the MM algorithm
(Hunter 2004, "MM algorithms for generalized Bradley-Terry models")
is the standard estimator.  The reference engine has no such operator —
beyond-reference dataop (SURVEY §2.L).

Scale design (100 TB of raw comparisons):

- Raw comparison events reduce FIRST to the pairwise count table
  ``(winner, loser, n)`` — one shuffle on the pair key; every MM
  iteration after that touches only ``O(distinct pairs)`` rows, never
  the raw events again.
- Each MM iteration is: join the symmetric pair table to the current
  score table on both endpoints (scores are one row per item —
  broadcast), one groupBy per endpoint, one normalization aggregate.
  No iteration-to-iteration growth: the score lineage is truncated with
  ``localCheckpoint`` per round (same pattern as connected components).
- Engine-exact arithmetic: scores are carried as integer MICROS and
  every per-pair MM term is quantized to integer NANOS before the sum,
  so partial-aggregation order cannot change any digit — the DuckDB
  oracle reproduces the fit bit-for-bit with unrolled CTE iterations.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000
_NANO = 1_000_000_000.0


def preference_counts(
    df: DataFrame, winner_col: str, loser_col: str, weight_col: Optional[str] = None
) -> DataFrame:
    """Reduce raw comparison events to ``(winner, loser, n)`` — the only
    pass over the full-scale input."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.filter(F.col(winner_col) != F.col(loser_col))
        .groupBy(F.col(winner_col).alias("winner"), F.col(loser_col).alias("loser"))
        .agg(F.sum(w).cast("bigint").alias("n"))
    )


def bt_scores(
    counts: DataFrame, iterations: int = 3
) -> DataFrame:
    """Bradley-Terry strengths from a ``(winner, loser, n)`` count table
    via ``iterations`` MM rounds from a uniform start.

    MM update (Hunter 2004, eq. 2):
    ``s_i' = W_i / sum_j n_ij / (s_i + s_j)`` with ``W_i`` = total wins
    of ``i`` and ``n_ij`` = comparisons between ``i`` and ``j``; scores
    are then rescaled so they sum to ``n_items`` (mean strength 1.0).

    Returns ``(item, wins, comparisons, score_micro)`` where
    ``score_micro`` is the strength in integer micro-units (exact —
    see module docstring).  Items that never won keep score 0 only if
    they also never lost; standard BT requires a connected comparison
    graph for convergence, which the caller owns (same contract as any
    BT fitter).
    """
    counts = counts.filter(F.col("n") > 0)
    # symmetric comparison table: each unordered pair contributes a row
    # for BOTH endpoints; n_ij aggregates wins in either direction
    comp = (
        counts.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "n")
        .unionByName(
            counts.select(F.col("loser").alias("i"), F.col("winner").alias("j"), "n")
        )
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n_ij"))
        .localCheckpoint(eager=False)
    )
    wins = counts.groupBy(F.col("winner").alias("i")).agg(F.sum("n").alias("w"))
    items = (
        comp.select("i")
        .distinct()
        .join(wins, "i", "left")
        .select("i", F.coalesce("w", F.lit(0)).alias("w"))
        .localCheckpoint(eager=False)
    )
    scores = items.select("i", F.lit(_MICRO).cast("bigint").alias("s"))
    si = F.col("s").cast("double") / _MICRO
    sj = F.col("s_j").cast("double") / _MICRO
    for _ in range(iterations):
        joined = comp.join(F.broadcast(scores), "i").join(
            F.broadcast(scores.select(F.col("i").alias("j"), F.col("s").alias("s_j"))),
            "j",
        )
        # per-pair MM term quantized to integer nanos BEFORE the sum —
        # the aggregate is then exact bigint arithmetic in any order
        term = F.round(F.col("n_ij").cast("double") / (si + sj) * _NANO).cast("bigint")
        denom = joined.groupBy("i").agg(F.sum(term).alias("denom_nano"))
        raw = (
            items.join(denom, "i")
            .select(
                "i",
                "w",
                F.round(
                    F.col("w").cast("double")
                    / (F.col("denom_nano").cast("double") / _NANO)
                    * _MICRO
                ).cast("bigint").alias("s_raw"),
            )
            # raw is consumed twice (the 1-row total and the rescale
            # join) — lazy checkpoint so the comp-join/agg chain runs
            # once per iteration, not twice
            .localCheckpoint(eager=False)
        )
        # rescale to mean strength 1.0 (sum of micros == n_items * 1e6);
        # total/n ride along every row via a broadcast 1-row aggregate
        tot = raw.agg(
            F.sum("s_raw").alias("s_tot"), F.count(F.lit(1)).alias("n_items")
        )
        # clamp to >= 1 micro: an all-loss item otherwise reaches score 0
        # and a later 0-vs-0 comparison divides by zero (NULL/Inf) — the
        # MM fixed point needs strictly positive strengths (Hunter 2004
        # assumes a connected graph with wins on both sides; the clamp
        # keeps the degenerate case finite instead of poisoning the fit)
        scores = (
            raw.join(F.broadcast(tot))
            .select(
                "i",
                F.greatest(
                    F.round(
                        F.col("s_raw").cast("double")
                        * F.col("n_items").cast("double")
                        * _MICRO
                        / F.col("s_tot").cast("double")
                    ).cast("bigint"),
                    F.lit(1).cast("bigint"),
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    comparisons = comp.groupBy("i").agg(F.sum("n_ij").alias("comparisons"))
    return (
        items.join(scores, "i")
        .join(comparisons, "i")
        .select(
            F.col("i").alias("item"),
            F.col("w").alias("wins"),
            "comparisons",
            F.col("s").alias("score_micro"),
        )
    )


def best_of_n(
    df: DataFrame,
    group_col: str,
    candidate_col: str,
    score_col: str,
) -> DataFrame:
    """Best-of-n selection over scored candidates (the RLHF sampling
    step: keep the reward-model argmax per prompt, with the margin
    diagnostics selection quality is judged by).

    Returns one row per group: ``(group, best, best_score, n_candidates,
    margin)`` where ``margin = best_score - runner_up_score`` (NULL when
    the group has a single candidate).  Ties break on the candidate id,
    so selection is total-ordered.

    Scale shape: one shuffle on the group key; the rank filter compiles
    to WindowGroupLimit (per-partition top-k, no per-group sort spill);
    margins come from the same window pass via ``lead``."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(candidate_col).asc()
    )
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_next", F.lead(F.col(score_col)).over(w)
    )
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_candidates"))
    return (
        ranked.filter(F.col("_rn") == 1)
        .join(cnt, group_col)
        .select(
            F.col(group_col).alias("group"),
            F.col(candidate_col).alias("best"),
            F.col(score_col).alias("best_score"),
            "n_candidates",
            (F.col(score_col) - F.col("_next")).alias("margin"),
        )
    )


def rater_agreement(
    df: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    min_common: int = 10,
) -> DataFrame:
    """Pairwise inter-rater reliability: Cohen's kappa for every rater
    pair that shares >= ``min_common`` items — the labeling-quality
    gate preference data runs through before BT fitting (raters with
    near-zero kappa against everyone are noise or spam).

    ``kappa = (p_o - p_e) / (1 - p_e)`` with observed agreement
    ``p_o`` and chance agreement ``p_e`` from each rater's own label
    marginals over the SHARED items.  Returns ``(rater_a, rater_b,
    n_common, n_agree, kappa_nano)``; kappa is quantized to integer
    nanos from exact BIGINT counts — engine-exact.  Perfect chance
    agreement (``p_e = 1``: both raters constant and identical) reports
    kappa 0 by convention.

    Scale shape: the item self-join is the inverted-index pattern —
    fan-out per item is raters-per-item squared (bounded by labeling
    redundancy, typically 2-5), never corpus size; marginals are one
    aggregation over the pair-expanded labels."""
    r = df.select(
        F.col(item_col).alias("_it"),
        F.col(rater_col).alias("_r"),
        F.col(label_col).alias("_l"),
    )
    pairs = (
        r.select("_it", F.col("_r").alias("rater_a"), F.col("_l").alias("_la"))
        .join(
            r.select("_it", F.col("_r").alias("rater_b"), F.col("_l").alias("_lb")),
            "_it",
        )
        .filter(F.col("rater_a") < F.col("rater_b"))
    )
    # per-pair observed agreement and per-pair-per-label marginals from
    # one expanded table: counts are exact ints
    obs = pairs.groupBy("rater_a", "rater_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum((F.col("_la") == F.col("_lb")).cast("long")).alias("n_agree"),
    ).filter(F.col("n_common") >= min_common)
    # chance agreement p_e = sum_l cA(l)*cB(l) / n^2 from each rater's
    # label marginals over the SHARED items
    ca = (
        pairs.groupBy("rater_a", "rater_b", F.col("_la").alias("_l"))
        .agg(F.count(F.lit(1)).alias("_ca"))
    )
    cb = (
        pairs.groupBy("rater_a", "rater_b", F.col("_lb").alias("_l"))
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    chance = (
        ca.join(cb, ["rater_a", "rater_b", "_l"])
        .groupBy("rater_a", "rater_b")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_chance_num"))
    )
    joined = obs.join(chance, ["rater_a", "rater_b"], "left")
    po = F.col("n_agree").cast("double") / F.col("n_common").cast("double")
    pe = F.coalesce(F.col("_chance_num"), F.lit(0)).cast("double") / (
        F.col("n_common").cast("double") * F.col("n_common").cast("double")
    )
    kappa = F.when(pe >= 1.0, F.lit(0).cast("bigint")).otherwise(
        F.round((po - pe) / (F.lit(1.0) - pe) * F.lit(1000000000.0)).cast("bigint")
    )
    return joined.select(
        "rater_a", "rater_b", "n_common", "n_agree", kappa.alias("kappa_nano")
    )
