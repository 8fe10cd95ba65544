"""Sketch-based corpus statistics — bounded-memory answers at 100 TB.

The exact corpus token top-k (``q_token_topk``) runs one map-side-combined
``groupBy(token)`` — fine when the distinct-token universe fits a shuffle.
At web scale two cheaper shapes matter:

* :func:`token_count_sketch` — Spark's NATIVE ``count_min_sketch``
  aggregate (JVM, mergeable, one pass, zero shuffle of token keys): a
  fixed-size sketch answering "how often does token t appear?" within
  ``eps * N`` overestimation. Probe it driver-side for any token set
  (benchmark-contamination counts, tracked-vocabulary monitoring) without
  ever materializing the vocabulary.
* :func:`frequent_tokens` — exact heavy hitters WITHOUT a full-vocabulary
  shuffle: per-partition Misra–Gries summaries (bounded memory, the
  guarantee below), union of the bounded candidate sets, then ONE exact
  recount restricted to candidates (broadcast semi filter). Any token with
  global frequency >= ``support * N`` is guaranteed into the candidate
  set: if c(t) >= s·ΣN_p then some partition has c_p(t) >= s·N_p
  (averaging), and Misra–Gries with k = ceil(1/s) counters keeps every
  item with partition count > N_p/(k+1) <= s·N_p. False candidates are
  removed by the exact recount — output counts are EXACT.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from recipeselectors_spark.functions import text as TX


def _tokens_frame(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("token")
    ).where(F.col("token") != "")


def token_count_sketch(
    df: DataFrame,
    text_col: str = "text",
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """One-pass Count–Min sketch over all (lowercased whitespace) tokens —
    Spark's built-in JVM aggregate, merged tree-wise across partitions;
    the only driver payload is the ``ceil(2/eps) * ceil(ln(1/(1-conf)))``
    counter table. Estimates overcount by at most ``eps * N`` with
    probability ``confidence``."""
    row = _tokens_frame(df, text_col).agg(
        F.count_min_sketch(
            "token", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sk")
    ).collect()[0]
    return bytes(row["sk"])


def sketch_estimate(
    spark: SparkSession, sketch: bytes, tokens: list[str]
) -> dict[str, int]:
    """Probe a :func:`token_count_sketch` result for estimated counts of
    ``tokens`` — never underestimates, overestimates by <= eps*N w.h.p.
    Driver-side only (the sketch is already local)."""
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytearray(sketch)
    )
    return {t: int(cms.estimateCount(t)) for t in tokens}


def frequent_tokens(
    df: DataFrame,
    text_col: str = "text",
    support: float = 0.001,
    max_candidates_per_partition: int | None = None,
) -> DataFrame:
    """EXACT counts of every token with frequency >= ``support`` of all
    tokens, without a full-vocabulary shuffle (see module docstring for
    the two-phase guarantee). Returns (token, count) for qualifying
    tokens, count exact."""
    if not 0 < support < 1:
        raise ValueError(f"support={support} must be in (0, 1)")
    k = max_candidates_per_partition or math.ceil(1.0 / support)

    toks = _tokens_frame(df, text_col)

    def misra_gries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mergeable-summaries form (Agarwal et al. 2013): exact per-batch
        # counts (vectorized value_counts — no per-token Python), merged
        # into the running summary; when it exceeds k entries, subtract
        # the (k+1)-th largest count from all and drop <= 0. Total
        # undercount per partition <= N_p/(k+1) — the same Misra-Gries
        # guarantee, at Arrow-batch speed.
        acc: Counter = Counter()
        for pdf in batches:
            vc = pdf["token"].value_counts()
            acc.update(dict(zip(vc.index, (int(v) for v in vc.values))))
            if len(acc) > k:
                kth = sorted(acc.values(), reverse=True)[k]
                acc = Counter(
                    {t: c - kth for t, c in acc.items() if c > kth}
                )
        yield pd.DataFrame({"token": list(acc.keys())})

    candidates = (
        toks.mapInPandas(misra_gries, schema="token string").distinct()
    )
    # ONE exact recount restricted to the bounded candidate set; the
    # total-token count is its own cheap scalar aggregate. Folding the
    # total INTO the Misra-Gries summary (a token=NULL row per partition)
    # to save this pass was measured (r6) in two variants —
    # localCheckpoint'd summary, and a grouped collect + driver-built
    # broadcast — and BOTH ran 1.4-2.4x slower end-to-end at sf0.1 AND
    # sf1.0: at any corpus size where the candidate machinery is sized
    # sanely, the extra action/shuffle/driver-serialization overhead
    # exceeds one map-only tokenize+count pass. Three passes, kept.
    n_total = toks.count()
    threshold = support * n_total
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= threshold)
        .orderBy(F.col("count").desc(), "token")
    )
