"""Unigram language-model quality scoring — the KenLM-lite corpus signal.

Production pre-training pipelines score documents by perplexity under a
small language model trained on a trusted corpus (CCNet, Gopher §A1.2);
documents far from the reference distribution (gibberish, word salad,
boilerplate) score badly. No model runtimes exist in this container, so
this implements the honest first rung of that ladder entirely in Spark:
mean per-token log2 probability under an add-alpha-smoothed UNIGRAM model
with a top-V vocabulary — a pure function of the corpora, fully
deterministic, and replayable in SQL.

Scale shape (100 TB):

* model fit = ONE map-side-combined ``groupBy(token)`` count (shuffle
  bounded by distinct tokens per partition, not corpus size), top-V via
  ``TakeOrderedAndProject`` (never a global sort), two scalar aggregates;
* scoring = map-only explode -> BROADCAST join against the <= V-row
  vocabulary -> one map-side-combined ``groupBy(doc)`` mean. No UDFs.
* the reference corpus and the scored corpus may differ (score web docs
  under a books-trained model — the CCNet setup).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from recipeselectors_spark.functions import text as TX


def fit_unigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    top_v: int = 50_000,
    alpha: float = 1.0,
) -> tuple[DataFrame, float, dict]:
    """Fit the smoothed unigram model on ``corpus``.

    Returns ``(vocab, oov_log2p, stats)``: ``vocab`` is a DataFrame
    ``(__tok__, __log2p__)`` of the ``top_v`` most frequent lowercased
    whitespace tokens (ties broken by token ascending — deterministic on
    any layout), ``oov_log2p`` the out-of-vocabulary log-probability, and
    ``stats`` the model constants. Add-alpha smoothing over V+1 outcomes
    (the +1 is the OOV bucket): ``p(t) = (c_t + alpha) / (N + alpha*(V+1))``
    where N counts ONLY in-vocabulary tokens, so probabilities are a pure
    function of the kept table and the oracle can rebuild them from it.
    """
    toks = corpus.select(
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("__tok__")
    ).where(F.col("__tok__") != "")
    counts = toks.groupBy("__tok__").agg(F.count("*").alias("__c__"))
    kept = counts.orderBy(F.col("__c__").desc(), F.col("__tok__")).limit(top_v)

    agg = kept.agg(
        F.sum("__c__").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    n_tokens, v = int(agg["n"] or 0), int(agg["v"] or 0)
    denom = n_tokens + alpha * (v + 1)
    vocab = kept.select(
        "__tok__",
        (F.log2((F.col("__c__") + F.lit(alpha)) / F.lit(denom))).alias(
            "__log2p__"
        ),
    )
    oov_log2p = math.log2(alpha / denom)
    stats = {"n_tokens": n_tokens, "vocab_size": v, "alpha": alpha,
             "denom": denom}
    return vocab, oov_log2p, stats


def unigram_logprob_score(
    df: DataFrame,
    vocab: DataFrame,
    oov_log2p: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "lm_score",
) -> DataFrame:
    """Score each document: mean per-token log2 probability (higher =
    closer to the reference distribution; ``-oov_log2p`` bounds the worst
    case). Empty documents score the OOV floor. Appends ``out`` to the
    id-level frame; map-only except the final per-doc mean."""
    toks = df.select(
        F.col(id_col),
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("__tok__"),
    ).where(F.col("__tok__") != "")
    scored = (
        toks.join(F.broadcast(vocab), "__tok__", "left")
        .groupBy(id_col)
        .agg(
            F.avg(F.coalesce("__log2p__", F.lit(oov_log2p))).alias(out)
        )
    )
    return (
        df.select(id_col, text_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(out, F.lit(oov_log2p)).alias(out),
        )
    )


def lm_quality_scores(
    df: DataFrame,
    reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 50_000,
    alpha: float = 1.0,
) -> DataFrame:
    """One-call form: fit on ``reference`` (default: ``df`` itself — the
    self-scored setup flags documents unusual for their own corpus) and
    score ``df``. Returns (id_col, lm_score)."""
    vocab, oov, _ = fit_unigram_lm(
        reference if reference is not None else df, text_col, top_v, alpha
    )
    return unigram_logprob_score(
        df, vocab, oov, text_col=text_col, id_col=id_col
    )
