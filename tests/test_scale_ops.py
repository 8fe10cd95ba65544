"""Round-5 scale operators: unigram-LM quality scoring, sketch/heavy-hitter
corpus statistics, and parquet compaction — each against an exact
pandas/numpy oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from recipeselectors_spark.operators import lm_quality, sketch


def _corpus(spark, rows):
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": rows}
    )
    return pdf, spark.createDataFrame(pdf)


def _unigram_oracle(texts, top_v, alpha):
    """Exact recompute of fit_unigram_lm's model in plain Python."""
    counts = Counter()
    for t in texts:
        counts.update(w for w in t.lower().split() if w)
    kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    n = sum(c for _, c in kept)
    v = len(kept)
    denom = n + alpha * (v + 1)
    logp = {t: math.log2((c + alpha) / denom) for t, c in kept}
    oov = math.log2(alpha / denom)
    return logp, oov


def test_unigram_lm_scores_match_oracle(spark):
    rows = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "zz qq vv xx",                      # pure OOV under top_v cut
        "the the the the",
        "",
    ]
    pdf, df = _corpus(spark, rows)
    top_v, alpha = 6, 1.0
    logp, oov = _unigram_oracle(rows, top_v, alpha)

    vocab, got_oov, stats = lm_quality.fit_unigram_lm(
        df, top_v=top_v, alpha=alpha
    )
    assert got_oov == pytest.approx(oov, rel=1e-12)
    got_vocab = {
        r["__tok__"]: r["__log2p__"] for r in vocab.collect()
    }
    assert set(got_vocab) == set(logp)
    for t in logp:
        assert got_vocab[t] == pytest.approx(logp[t], rel=1e-12)

    out = lm_quality.unigram_logprob_score(df, vocab, got_oov).toPandas()
    out = out.set_index("doc_id")["lm_score"]
    for i, text in enumerate(rows):
        toks = [w for w in text.lower().split() if w]
        want = (
            float(np.mean([logp.get(w, oov) for w in toks])) if toks else oov
        )
        assert out[i] == pytest.approx(want, rel=1e-12), (i, text)
    # gibberish scores strictly below common-word documents
    assert out[2] < out[0] and out[2] < out[1]


def test_unigram_lm_reference_corpus(spark):
    """Fit on a trusted reference, score a different corpus (the CCNet
    setup): reference-like docs outscore off-distribution docs."""
    _, ref = _corpus(
        spark, ["the quick brown fox", "the lazy dog sleeps"] * 5
    )
    _, target = _corpus(spark, ["the quick dog", "zzz qqq www"])
    out = (
        lm_quality.lm_quality_scores(target, reference=ref)
        .toPandas()
        .set_index("doc_id")["lm_score"]
    )
    assert out[0] > out[1]


def test_count_min_sketch_estimates(spark):
    rows = ["alpha beta alpha", "beta gamma alpha", "delta"] * 40
    pdf, df = _corpus(spark, rows)
    true = Counter(w for t in rows for w in t.lower().split())

    sk = sketch.token_count_sketch(df, eps=0.001, confidence=0.99)
    est = sketch.sketch_estimate(
        spark, sk, ["alpha", "beta", "gamma", "delta", "missing"]
    )
    n = sum(true.values())
    for t in ("alpha", "beta", "gamma", "delta"):
        assert est[t] >= true[t]                     # never underestimates
        assert est[t] <= true[t] + 0.01 * n          # and stays tight here
    assert est["missing"] <= 0.01 * n


@pytest.mark.parametrize("n_parts", [1, 7])
def test_frequent_tokens_exact_above_support(spark, n_parts):
    """Every token at or above support appears with its EXACT count, on
    any partition layout (the per-partition Misra-Gries candidate
    guarantee + exact recount)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(120)]
    # Zipf-ish: w000 dominates, long tail
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    rows = [
        " ".join(rng.choice(vocab, p=weights, size=30)) for _ in range(200)
    ]
    pdf, df = _corpus(spark, rows)
    df = df.repartition(n_parts)

    true = Counter(w for t in rows for w in t.split())
    n = sum(true.values())
    # support=0.02 -> k=50 Misra-Gries counters < 120 distinct tokens, so
    # the prune step genuinely fires in every partition
    support = 0.02
    want = {t: c for t, c in true.items() if c >= support * n}
    assert 0 < len(want) < len(true)  # both sides of the cut populated

    got = {
        r["token"]: r["count"]
        for r in sketch.frequent_tokens(df, support=support).collect()
    }
    assert got == want


def test_frequent_tokens_support_guard(spark):
    _, df = _corpus(spark, ["a b c"])
    with pytest.raises(ValueError, match="support"):
        sketch.frequent_tokens(df, support=0.0)


def test_compact_parquet(spark, tmp_path):
    from recipeselectors_spark.sources import compaction

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    df.repartition(20).write.parquet(src)
    n_before = len(spark.read.parquet(src).inputFiles())
    assert n_before >= 20

    report = compaction.compact_parquet(
        spark, src, dst, target_file_mb=256
    )
    assert report["files_before"] == n_before
    assert report["files_after"] < n_before
    assert report["partitions"] == 1          # tiny input -> one target file
    # content preserved exactly
    a = sorted(r["k"] for r in spark.read.parquet(src).collect())
    b = sorted(r["k"] for r in spark.read.parquet(dst).collect())
    assert a == b

    # coalesce strategy also shrinks without shuffle
    dst2 = str(tmp_path / "coalesced")
    r2 = compaction.compact_parquet(
        spark, src, dst2, target_file_mb=256, strategy="coalesce"
    )
    assert r2["files_after"] < n_before

    with pytest.raises(ValueError, match="differ"):
        compaction.compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="strategy"):
        compaction.compact_parquet(spark, src, dst + "_x", strategy="zip")
