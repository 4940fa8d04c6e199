"""Distributed multinomial Naive Bayes text classification.

The trained-model complement of the heuristic quality scores in
``text.py``: a 100 TB pipeline routinely needs a LEARNED document
classifier (quality tiers, domain labels, language families trained
from a labeled seed set), and multinomial NB is the canonical one that
is PURE AGGREGATION — training is two group-bys (per-class token
counts + class priors) and scoring is an explode-join-sum, so the
whole train-and-apply lifecycle stays JVM-side, shuffles only bounded
model state (|vocab| × |classes| rows), and is exactly replayable in
ANSI SQL by an external oracle (no iterative optimizer, no float
accumulation beyond one per-document sum — the property gradient-
descent models cannot offer a hash-matching oracle for).

Model state as DataFrames (never driver-side):

- priors:      (label, log_prior, log_default) — one row per class;
               ``log_default`` is the Laplace-smoothed log-likelihood
               of a token the class never saw.
- likelihood:  (label, token, log_lik) — one row per class × seen
               token, the broadcastable "model file".

Scale shape: training's widest shuffle carries (label, token) partial
counts — bounded by |vocab| × |classes| after map-side combine,
regardless of corpus size.  Scoring joins the token stream against
the likelihood table (broadcast when the model is small, shuffle-hash
otherwise) and reduces per document — linear, one pass, no state.

No reference counterpart (the reference engine has no ML surface);
part of the training-data-pipeline extension alongside dedup/
contamination/sampling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions.text import tokens


@dataclass(frozen=True)
class NBModel:
    """Handle to a trained multinomial NB model (see module doc)."""

    priors: DataFrame       # label, log_prior, log_default
    likelihood: DataFrame   # label, token, log_lik
    alpha: float


def _doc_tokens(df: DataFrame, id_cols: list[str],
                text_col: str) -> DataFrame:
    """(id_cols..., token) with one row per token OCCURRENCE (the
    multinomial event model counts repeats); empty boundary tokens
    from leading/trailing whitespace are dropped, matching every
    other text operator's contract."""
    return (df.select(*id_cols,
                      F.explode(tokens(text_col)).alias("token"))
            .filter(F.col("token") != ""))


def nb_train(df: DataFrame, text_col: str = "text",
             label_col: str = "label", alpha: float = 1.0) -> NBModel:
    """Train: per-class Laplace-smoothed token log-likelihoods
    ``ln((count(label, token) + alpha) / (tokens(label) + alpha·V))``
    (V = train-corpus distinct-token count) and class log-priors
    ``ln(docs(label) / docs)``.  Two aggregation passes, no
    iteration.  NULL-labeled rows are UNLABELED examples and are
    excluded from training (they would otherwise train a ghost class
    that NULL-safe joins could never score against)."""
    df = df.filter(F.col(label_col).isNotNull())
    tok = _doc_tokens(df, [label_col], text_col) \
        .withColumnRenamed(label_col, "label")
    counts = tok.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("label").agg(
        F.sum("cnt").alias("total"))
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("v"))
    denom = F.log(F.col("total") + F.lit(alpha) * F.col("v"))
    likelihood = (counts.join(F.broadcast(totals), "label")
                  .crossJoin(F.broadcast(vocab))
                  .select("label", "token",
                          (F.log(F.col("cnt") + F.lit(alpha)) - denom)
                          .alias("log_lik")))
    ndocs = df.agg(F.count(F.lit(1)).alias("n"))
    priors = (df.groupBy(F.col(label_col).alias("label"))
              .agg(F.count(F.lit(1)).alias("n_label"))
              .crossJoin(F.broadcast(ndocs))
              .join(F.broadcast(totals), "label")
              .crossJoin(F.broadcast(vocab))
              .select("label",
                      F.log(F.col("n_label") / F.col("n"))
                      .alias("log_prior"),
                      (F.log(F.lit(alpha)) - denom)
                      .alias("log_default")))
    return NBModel(priors=priors, likelihood=likelihood, alpha=alpha)


def nb_score(model: NBModel, df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Per-document, per-class log-posterior scores:
    ``(id_col, label, score)`` where score = log_prior + Σ per token
    occurrence of log_lik (log_default when the class never saw the
    token).  The token stream is densified against the class list
    (tokens × |classes| rows — classes are few) so unseen tokens
    contribute the class's smoothed default, exactly the multinomial
    NB definition.  A document whose text yields NO non-empty tokens
    (empty string, all whitespace) still gets one row per class with
    score = log_prior — the zero-length-product case of multinomial
    NB — rather than silently vanishing from the output."""
    tok = _doc_tokens(df, [id_col], text_col)
    labels = model.priors.select("label", "log_default")
    # the likelihood table is |vocab| × |classes| — broadcast is
    # Spark's call (autoBroadcastJoinThreshold / AQE), NOT forced: a
    # web-scale vocabulary's model belongs in a shuffle-hash join.
    # The class list and priors ARE forced broadcasts (|classes| rows
    # by construction).
    dense = (tok.crossJoin(F.broadcast(labels))
             .join(model.likelihood, ["label", "token"], "left")
             .select(id_col, "label",
                     F.coalesce("log_lik", "log_default").alias("ll")))
    summed = dense.groupBy(id_col, "label").agg(
        F.sum("ll").alias("sum_ll"))
    # densify against EVERY input document so token-less docs score by
    # priors alone (sum_ll coalesces to 0 — an empty product of
    # likelihoods) instead of being dropped by the explode
    all_pairs = (df.select(id_col).distinct()
                 .crossJoin(F.broadcast(
                     model.priors.select("label", "log_prior"))))
    return (all_pairs.join(summed, [id_col, "label"], "left")
            .select(id_col, "label",
                    (F.coalesce("sum_ll", F.lit(0.0))
                     + F.col("log_prior")).alias("score")))


def nb_predict(model: NBModel, df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               round_digits: int = 6) -> DataFrame:
    """Argmax classification: ``(id_col, predicted, score)`` — one row
    per document.  Scores are ROUNDED (``round_digits``) before the
    argmax so near-ties (within half an ulp of each other under
    different summation orders) resolve by the deterministic
    label-ascending tie-break on every engine, keeping predictions
    replayable by an external oracle."""
    scored = nb_score(model, df, id_col, text_col) \
        .withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc())
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(id_col, F.col("label").alias("predicted"),
                    "score"))
