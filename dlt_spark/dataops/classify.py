"""Distributed text classification: multinomial Naive Bayes.

The quality / domain / toxicity classifier step of a web-scale corpus
pipeline (CCNet, Gopher, Dolma all gate documents on a trained text
classifier).  The production scorers are usually fasttext models trained
offline; the TRAINING step this module provides is the one that is
genuinely a distributed-aggregation problem: multinomial Naive Bayes
with Laplace smoothing is exactly two groupBy passes over the token
table, trains on any corpus size, and its scores replay bit-identically
in ANSI SQL (the repo-wide integer-nano-log convention), which a
gradient-trained model cannot.

Scale shape: token/class count tables are ``vocab x classes`` rows
(bounded by vocabulary, not corpus); scoring joins the per-document
token table against the model once per class — class count is small by
construction (quality tiers, language families, source domains), so
the fan-out is ``doc_tokens x C`` with the model side broadcast under a
row gate.

Behavioral reference: the reference engine ships no classifier — this
is a Spark-native extension of the dataops surface (SURVEY §2.L), like
the rest of the LM family (``lm.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import doc_term_freq

NANO = 1_000_000_000

#: broadcast the (vocab x classes) log-prob model below this many rows
MODEL_BROADCAST_LIMIT = 8_000_000


def nb_train(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: int = 1,
) -> "tuple[DataFrame, DataFrame]":
    """Train multinomial NB: returns ``(priors, token_logprobs)``.

    ``priors``: ``(label, n_docs, prior_nano)`` with
    ``prior = ln(n_docs_c / n_docs)``;
    ``token_logprobs``: ``(token, label, lp_nano)`` with
    ``lp = ln((tf_c(t) + alpha) / (T_c + alpha * V))`` — both as
    integer nano-logs (``round(ln(x) * 1e9)``), the same engine-portable
    quantization every other log-scoring op in the repo uses, so sums of
    them are exact BIGINT math.  Tokens a class never saw take the
    smoothed default ``ln(alpha / (T_c + alpha * V))``, emitted per
    class in ``priors`` as ``default_lp_nano``."""
    dt = doc_term_freq(docs, id_col, text_col)
    # join labels back onto the token table (one row per doc-token)
    labeled = dt.join(
        docs.select(F.col(id_col), F.col(label_col).alias("_lbl")), id_col
    )
    class_tok = labeled.groupBy("_lbl", "token").agg(F.sum("tf").alias("ctf"))
    class_tot = class_tok.groupBy("_lbl").agg(F.sum("ctf").alias("T"))
    # one job yields both sizing scalars: vocab (needed for smoothing)
    # and class count (model-row bound vocab*classes, stamped on the
    # returned frame so nb_score can gate its broadcast WITHOUT an
    # extra count() action per scoring call)
    sizes = class_tok.agg(
        F.countDistinct("token").alias("v"),
        F.countDistinct("_lbl").alias("c"),
    ).first()
    vocab_n, n_classes = sizes["v"], sizes["c"]
    n_docs = docs.count()

    def _nlog(num, den):
        return F.round(
            F.log(num.cast("double") / den.cast("double")) * F.lit(float(NANO))
        ).cast("bigint")

    token_lp = (
        class_tok.join(F.broadcast(class_tot), "_lbl")
        .select(
            "token",
            F.col("_lbl").alias("label"),
            _nlog(
                F.col("ctf") + F.lit(alpha),
                F.col("T") + F.lit(alpha * vocab_n),
            ).alias("lp_nano"),
        )
    )
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    priors = doc_counts.join(
        class_tot.select(F.col("_lbl").alias("label"), "T"), "label"
    ).select(
        "label",
        "n_docs",
        _nlog(F.col("n_docs"), F.lit(n_docs)).alias("prior_nano"),
        _nlog(
            F.lit(alpha), F.col("T") + F.lit(alpha * vocab_n)
        ).alias("default_lp_nano"),
    )
    token_lp._nb_model_rows = vocab_n * n_classes
    return priors, token_lp


def nb_score(
    docs: DataFrame,
    priors: DataFrame,
    token_lp: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_rows: "int | None" = None,
) -> DataFrame:
    """Score every document against every class and pick the argmax:
    ``score_c = prior_c + sum_t tf(t) * lp_c(t)`` (unseen tokens take
    the class's smoothed default).  Returns ``(id_col, predicted,
    margin_nano)`` — ``margin`` is best minus runner-up, the standard
    keep/route confidence signal.  All sums are exact BIGINT nano-logs:
    argmax and margin are order- and partitioning-independent, ties
    broken by label.

    Plan: one doc-token table crossed with the (small) class list, LEFT
    joined against the model (broadcast under
    ``MODEL_BROADCAST_LIMIT``), one groupBy (doc, class), one window-free
    argmax via ``max_by`` + second-best via sort-drop.

    ``model_rows``: pass the model's row count (or the vocab*classes
    bound) to gate the broadcast explicitly — the value ``nb_train``
    stamps as ``_nb_model_rows`` is only a convenience and does not
    survive ``cache()``/transformations/persist-reload, so a stored or
    post-processed model should always supply it; omitted and unstamped
    models are left to AQE."""
    dt = doc_term_freq(docs, id_col, text_col)
    classes = priors.select("label", "prior_nano", "default_lp_nano")
    # explicit param wins; the nb_train stamp is the zero-extra-jobs
    # fallback for the train-then-score-in-one-session path
    if model_rows is None:
        model_rows = getattr(token_lp, "_nb_model_rows", None)
    lp = token_lp
    if model_rows is not None and model_rows <= MODEL_BROADCAST_LIMIT:
        lp = F.broadcast(token_lp)
    scored = (
        dt.crossJoin(F.broadcast(classes))
        .join(lp, ["token", "label"], "left")
        .groupBy(id_col, "label")
        .agg(
            (
                F.first("prior_nano")
                + F.sum(
                    F.col("tf")
                    * F.coalesce(F.col("lp_nano"), F.col("default_lp_nano"))
                )
            ).alias("score_nano")
        )
    )
    # argmax + margin without a window: two orthogonal aggregations over
    # the same (doc, class) frame — max_by with a (score, label) struct
    # gives a deterministic tie-break, and the runner-up falls out of
    # max(score among rows below the max) via a self-contained expr
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("score_nano"), F.col("label"))).alias("_b"),
        F.sort_array(
            F.collect_list(F.struct(F.col("score_nano"), F.col("label"))),
            asc=False,
        ).alias("_all"),
    )
    return best.select(
        id_col,
        F.col("_b.label").alias("predicted"),
        (
            F.col("_b.score_nano")
            - F.coalesce(
                F.element_at("_all", 2)["score_nano"], F.col("_b.score_nano")
            )
        ).alias("margin_nano"),
    )
