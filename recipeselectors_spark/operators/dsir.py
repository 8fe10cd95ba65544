"""DSIR — Data Selection via Importance Resampling (hashed n-gram models).

Production pre-training pipelines select web documents that "look like" a
trusted target domain (Wikipedia, books) by importance resampling: fit
cheap bag-of-hashed-n-gram models on the target and the raw pool, weight
every raw document by the log-likelihood ratio, and Gumbel-top-k sample
without replacement with probability proportional to the weights
(Xie et al., *Data Selection for Language Models via Importance
Resampling*, NeurIPS 2023). This implements that exact shape as pure
Catalyst — no UDFs, no model runtime — with every random quantity derived
from content hashes so the whole operator is deterministic,
layout-invariant, and replayable in SQL.

Feature map: lowercased whitespace unigrams + bigrams hashed into
``n_buckets`` buckets via the md5-prefix trick (``conv(substr(md5(g),1,15),
16,10) % B`` — DuckDB computes the identical value as
``('0x' || substr(md5(g),1,15))::UBIGINT % B``), so the oracle needs no
expensive XXH64 emission.

Scale shape (100 TB):

* model fit = ONE map-side-combined ``groupBy(bucket)`` count per corpus
  (shuffle bounded by ``n_buckets`` per partition, never corpus-sized),
  outer-joined into a <= ``n_buckets``-row ratio table;
* weighting = map-only gram explode -> BROADCAST join against the ratio
  table -> one map-side-combined ``groupBy(doc)`` sum;
* resampling = Gumbel-top-k via ``orderBy(...).limit(k)`` which compiles
  to ``TakeOrderedAndProject`` (bounded driver result, no global sort).
  Gumbel noise comes from md5(doc_id) — reproducible on any layout and
  outside Spark.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from recipeselectors_spark.functions import text as TX

HEX15 = 16 ** 15  # md5-prefix value range: [0, 16^15), fits int64


def _md5_long(col):
    """First 15 hex chars of md5 as a non-negative int64 (< 2^60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hashed_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    n_buckets: int = 10_000,
    bigrams: bool = True,
) -> DataFrame:
    """Explode ``df`` into one row per hashed n-gram bucket.

    Returns ``(id_col?, __bucket__)`` — unigrams plus (optionally) space-
    joined bigrams of the lowercased whitespace tokens, each hashed to
    ``md5_prefix(gram) % n_buckets``. Map-only.
    """
    from recipeselectors_spark.operators._parallel import ensure_parallelism

    # one md5 per unigram AND bigram of every document — the CPU-heavy
    # narrow stage of this operator; a single-row-group scan would run it
    # on one core (guide §2.5). No-op on inputs that already split.
    df = ensure_parallelism(df.select(*([id_col] if id_col else []), text_col))
    toks = TX.tokens(F.lower(F.col(text_col)))
    toks = F.filter(toks, lambda t: t != "")
    grams = toks
    if bigrams:
        n = F.size(toks)
        bi = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bi)
    cols = [F.col(id_col)] if id_col else []
    out = df.select(*cols, F.explode(grams).alias("__gram__"))
    return out.select(
        *([id_col] if id_col else []),
        (_md5_long(F.col("__gram__")) % n_buckets).alias("__bucket__"),
    )


def fit_bucket_ratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> tuple[DataFrame, float]:
    """Fit add-alpha hashed-gram models on both corpora; return the ratio
    table and the empty-bucket constant.

    The table is ``(__bucket__, __logr__)`` with
    ``logr = ln p_target(b) - ln p_raw(b)`` where
    ``p(b) = (c_b + alpha) / (N + alpha * n_buckets)``; buckets absent
    from BOTH corpora are not materialized — their ratio is the returned
    ``zero_logr`` constant (coalesce it at scoring time). <= n_buckets
    rows: always broadcastable.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            hashed_grams(df, text_col, None, n_buckets, bigrams)
            .groupBy("__bucket__")
            .agg(F.count("*").alias(name))
        )

    ct, cr = counts(target, "__ct__"), counts(raw, "__cr__")
    joined = ct.join(cr, "__bucket__", "full_outer").select(
        "__bucket__",
        F.coalesce("__ct__", F.lit(0)).alias("__ct__"),
        F.coalesce("__cr__", F.lit(0)).alias("__cr__"),
    )
    tot = joined.agg(
        F.sum("__ct__").alias("nt"), F.sum("__cr__").alias("nr")
    ).collect()[0]
    nt, nr = int(tot["nt"] or 0), int(tot["nr"] or 0)
    dt, dr = nt + alpha * n_buckets, nr + alpha * n_buckets
    ratio = joined.select(
        "__bucket__",
        (
            F.log((F.col("__ct__") + F.lit(alpha)) / F.lit(dt))
            - F.log((F.col("__cr__") + F.lit(alpha)) / F.lit(dr))
        ).alias("__logr__"),
    )
    zero_logr = math.log(alpha / dt) - math.log(alpha / dr)
    return ratio, zero_logr


def dsir_logweights(
    raw: DataFrame,
    ratio: DataFrame,
    zero_logr: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    bigrams: bool = True,
    out: str = "log_w",
) -> DataFrame:
    """Per-document log importance weight: sum of bucket log-ratios over
    the document's hashed grams. Gram-less documents weigh 0. Returns
    ``(id_col, out)`` with one row per input document."""
    g = hashed_grams(raw, text_col, id_col, n_buckets, bigrams)
    sums = (
        g.join(F.broadcast(ratio), "__bucket__", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce("__logr__", F.lit(zero_logr))).alias(out))
    )
    return (
        raw.select(id_col)
        .join(sums, id_col, "left")
        .select(id_col, F.coalesce(out, F.lit(0.0)).alias(out))
    )


def gumbel_key(id_col_expr, salt: str = "dsir"):
    """Deterministic standard-Gumbel noise from md5(salt | id).

    ``u = (md5_prefix + 0.5) / 16^15`` lies strictly inside (0, 1), so
    ``-ln(-ln u)`` is finite; identical in DuckDB SQL.
    """
    u = (_md5_long(F.concat(F.lit(salt + "|"), id_col_expr)) + F.lit(0.5)) / F.lit(
        float(HEX15)
    )
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """End-to-end DSIR: fit target/raw hashed-gram models, weight every
    raw document, Gumbel-top-k resample ``k`` of them.

    Sampling without replacement with ``P(i) ∝ exp(log_w_i)`` is exactly
    "add iid standard Gumbel noise to each log-weight and take the top k"
    (the Gumbel-max trick); the noise here is a deterministic content hash,
    so reruns and repartitions return the identical set. Returns
    ``(id_col, log_w, gumbel_key)`` sorted by the perturbed key, ties (and
    the compare order) broken by ``id_col``.
    """
    ratio, zero_logr = fit_bucket_ratio(
        target, raw, text_col, n_buckets, alpha, bigrams
    )
    w = dsir_logweights(
        raw, ratio, zero_logr, text_col, id_col, n_buckets, bigrams
    )
    keyed = w.select(
        id_col,
        "log_w",
        (F.col("log_w") + gumbel_key(F.col(id_col), salt)).alias(
            "gumbel_key"
        ),
    )
    return keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)
