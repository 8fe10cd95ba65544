"""Corpus quality filtering — the Gopher/C4-rule composition.

Beyond-reference operator for the LLM training-data pipeline mandate: one
declarative pass that composes the per-document quality signals
(functions/text.py — token counts, punctuation/stopword ratios, Gopher
repetition fractions, language ID, PII counts) into a keep/drop decision
WITH per-rule reasons, entirely in Catalyst expressions.

Scale shape: a single map-only projection over the corpus — no shuffle, no
UDF, no driver state; filters and the reason array compile into one
whole-stage-codegen span, and predicate `kept = true` pushes down to the
parquet scan of a materialized run. Rule thresholds follow the published
Gopher (Rae et al. 2021, Table A1) and C4 (Raffel et al. 2020 §2.2)
heuristics where they map onto our signals; every threshold is a keyword
so pipelines tune them per corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from recipeselectors_spark.functions import text as TX


@dataclass
class QualityRules:
    """Thresholds; None disables a rule."""

    min_tokens: int | None = 50          # Gopher: drop docs < 50 words
    max_tokens: int | None = 100_000     # Gopher: drop docs > 100k words
    max_punct_ratio: float | None = 0.20
    min_stopword_ratio: float | None = 0.02   # Gopher "stop word" presence
    max_rep_unigram: float | None = 0.40      # Gopher dup-unigram fraction
    max_rep_bigram: float | None = 0.30       # Gopher dup-bigram fraction
    min_mean_word_len: float | None = 2.0     # Gopher 3..10 band, relaxed
    max_mean_word_len: float | None = 12.0
    allowed_langs: tuple[str, ...] | None = ("en",)
    max_pii: int | None = None           # e.g. 0 to drop any doc with PII
    langid_langs: tuple[str, ...] = ("en", "de", "fr", "es")


def quality_flags(
    df: DataFrame, text_col: str = "text", rules: QualityRules | None = None
) -> DataFrame:
    """Append ``kept`` (boolean) and ``drop_reasons`` (array<string>,
    empty when kept) — one Catalyst projection, no shuffle/UDF."""
    r = rules or QualityRules()
    if r.allowed_langs is not None and len(r.allowed_langs) == 0:
        raise ValueError(
            "allowed_langs=() is ambiguous: an empty allowlist would drop "
            "every document. Pass None to disable the language rule, or a "
            "non-empty tuple of language codes."
        )
    t = F.col(text_col)
    toks = TX.token_count(t)
    rep_uni, rep_bi = TX.repetition_ratios(t)
    mean_wlen = (
        F.length(F.regexp_replace(F.trim(t), r"\s+", "")) /
        F.greatest(toks, F.lit(1))
    )

    checks: list[tuple[str, Column]] = []

    def rule(name: str, failed: Column, enabled: bool) -> None:
        if enabled:
            checks.append((name, failed))

    rule("too_few_tokens", toks < r.min_tokens, r.min_tokens is not None)
    rule("too_many_tokens", toks > r.max_tokens, r.max_tokens is not None)
    rule(
        "punct_ratio",
        TX.punct_ratio(t) > r.max_punct_ratio,
        r.max_punct_ratio is not None,
    )
    rule(
        "stopword_ratio",
        TX.stopword_ratio(t) < r.min_stopword_ratio,
        r.min_stopword_ratio is not None,
    )
    rule(
        "rep_unigram", rep_uni > r.max_rep_unigram, r.max_rep_unigram is not None
    )
    rule("rep_bigram", rep_bi > r.max_rep_bigram, r.max_rep_bigram is not None)
    rule(
        "mean_word_len_low",
        mean_wlen < r.min_mean_word_len,
        r.min_mean_word_len is not None,
    )
    rule(
        "mean_word_len_high",
        mean_wlen > r.max_mean_word_len,
        r.max_mean_word_len is not None,
    )
    rule(
        "language",
        ~TX.langid_expr(t, r.langid_langs).isin(*r.allowed_langs)
        if r.allowed_langs
        else F.lit(False),
        r.allowed_langs is not None,
    )
    rule("pii", TX.pii_count(t) > r.max_pii, r.max_pii is not None)

    reasons = F.filter(
        F.array(
            *[F.when(failed, F.lit(name)) for name, failed in checks]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("drop_reasons", reasons).withColumn(
        "kept", F.size("drop_reasons") == 0
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", rules: QualityRules | None = None
) -> DataFrame:
    """Kept documents only (original columns). ``quality_flags`` is the
    inspectable form; this is the pipeline form."""
    flagged = quality_flags(df, text_col, rules)
    return flagged.where(F.col("kept")).drop("kept", "drop_reasons")
