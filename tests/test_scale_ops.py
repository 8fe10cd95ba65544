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


# ---------------------------------------------------------------- DSIR

import hashlib

from recipeselectors_spark.operators import dsir


def _md5_bucket(s: str, B: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B


def _grams(text: str, bigrams: bool = True):
    toks = [w for w in text.lower().split() if w]
    g = list(toks)
    if bigrams and len(toks) >= 2:
        g += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return g


def _dsir_oracle(target_texts, raw_rows, B, alpha, bigrams=True,
                 salt="dsir"):
    """Exact recompute of fit_bucket_ratio + dsir_logweights + gumbel."""
    ct, cr = Counter(), Counter()
    for t in target_texts:
        ct.update(_md5_bucket(g, B) for g in _grams(t, bigrams))
    for _, t in raw_rows:
        cr.update(_md5_bucket(g, B) for g in _grams(t, bigrams))
    nt, nr = sum(ct.values()), sum(cr.values())
    dt, dr = nt + alpha * B, nr + alpha * B

    def logr(b):
        return math.log((ct.get(b, 0) + alpha) / dt) - math.log(
            (cr.get(b, 0) + alpha) / dr
        )

    weights, keys = {}, {}
    for doc_id, t in raw_rows:
        w = sum(logr(_md5_bucket(g, B)) for g in _grams(t, bigrams))
        weights[doc_id] = w
        v = int(
            hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:15], 16
        )
        u = (v + 0.5) / 16 ** 15
        keys[doc_id] = w + -math.log(-math.log(u))
    return weights, keys


def test_dsir_logweights_match_oracle(spark):
    target = ["the solar system has eight planets",
              "planets orbit the sun in ellipses",
              "the moon orbits the earth"]
    raw = [("a", "planets orbit the sun"),
           ("b", "buy cheap pills now discount discount"),
           ("c", "the earth and the moon"),
           ("d", ""),
           ("e", "sun sun sun")]
    B, alpha = 512, 1.0
    tdf = spark.createDataFrame([(t,) for t in target], ["text"])
    rdf = spark.createDataFrame(raw, ["doc_id", "text"])

    ratio, zero = dsir.fit_bucket_ratio(tdf, rdf, n_buckets=B, alpha=alpha)
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir.dsir_logweights(
            rdf, ratio, zero, n_buckets=B
        ).collect()
    }
    want, _ = _dsir_oracle(target, raw, B, alpha)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    assert got["d"] == 0.0  # gram-less doc

    # on-domain beats off-domain
    assert got["a"] > got["b"]
    assert got["c"] > got["b"]


def test_dsir_select_is_deterministic_gumbel_topk(spark):
    target = ["alpha beta gamma delta", "beta gamma epsilon"]
    raw = [(f"doc{i:02d}",
            "alpha beta gamma" if i % 3 == 0 else "zzz qqq www " * (i % 5 + 1))
           for i in range(30)]
    B, alpha, k = 256, 0.5, 7
    tdf = spark.createDataFrame([(t,) for t in target], ["text"])
    rdf = spark.createDataFrame(raw, ["doc_id", "text"])

    sel = dsir.dsir_select(
        rdf, tdf, k=k, n_buckets=B, alpha=alpha
    ).collect()
    _, keys = _dsir_oracle(target, raw, B, alpha)
    want = sorted(keys, key=lambda d: (-keys[d], d))[:k]
    assert [r["doc_id"] for r in sel] == want
    for r in sel:
        assert r["gumbel_key"] == pytest.approx(keys[r["doc_id"]], abs=1e-9)

    # layout-invariant: same set after an unrelated repartition
    sel2 = dsir.dsir_select(
        rdf.repartition(7, "text"), tdf, k=k, n_buckets=B, alpha=alpha
    ).collect()
    assert [r["doc_id"] for r in sel2] == want

    # TakeOrderedAndProject, not a global sort exchange
    plan = dsir.dsir_select(
        rdf, tdf, k=k, n_buckets=B, alpha=alpha
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dsir_prefers_target_like_docs(spark):
    target = ["neural networks learn representations from data"] * 2
    on = [(f"on{i}", "neural networks learn from data") for i in range(5)]
    off = [(f"off{i}", "casino jackpot winner claim prize") for i in range(5)]
    tdf = spark.createDataFrame([(t,) for t in target], ["text"])
    rdf = spark.createDataFrame(on + off, ["doc_id", "text"])
    sel = dsir.dsir_select(rdf, tdf, k=5, n_buckets=1024, alpha=0.1)
    ids = {r["doc_id"] for r in sel.collect()}
    assert all(i.startswith("on") for i in ids), ids


# ---------------------------------------------------------------- BM25

from recipeselectors_spark.operators import bm25


def _bm25_oracle(docs, queries, k1=1.2, b=0.75):
    """Exact BM25 recompute in plain Python (set-semantics query terms)."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    dfreq = Counter()
    for ts in toks.values():
        dfreq.update(set(ts))
    out = {}
    for q_id, qt in queries:
        qterms = set(w for w in qt.lower().split() if w)
        for d, ts in toks.items():
            tf = Counter(ts)
            s = 0.0
            for t in qterms:
                if tf[t] == 0 or dfreq[t] == 0:
                    continue
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += idf * tf[t] * (k1 + 1) / (
                    tf[t] + k1 * (1 - b + b * dl[d] / avgdl)
                )
            if s > 0:
                out[(q_id, d)] = s
    return out


def test_bm25_matches_oracle(spark):
    docs = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "the lazy dog sleeps all day the dog snores"),
        ("d3", "quick quick quick brown foxes everywhere"),
        ("d4", "an unrelated document about solar panels"),
        ("d5", "dog dog dog dog dog dog dog dog"),
    ]
    queries = [("q1", "quick brown dog"), ("q2", "solar dog dog")]
    cdf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame(queries, ["q_id", "query"])

    got = bm25.bm25_topk(cdf, qdf, k=5).collect()
    want = _bm25_oracle(docs, queries)
    assert {(r["q_id"], r["doc_id"]) for r in got} == set(want)
    for r in got:
        assert r["bm25"] == pytest.approx(
            want[(r["q_id"], r["doc_id"])], rel=1e-12
        ), (r["q_id"], r["doc_id"])

    # ranks are dense 1..n per query, ordered by score desc then doc_id
    for q in {"q1", "q2"}:
        rows = sorted(
            (r for r in got if r["q_id"] == q), key=lambda r: r["rank"]
        )
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["bm25"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)

    # top-k truncation
    got2 = bm25.bm25_topk(cdf, qdf, k=1).collect()
    per_q = Counter(r["q_id"] for r in got2)
    assert all(v == 1 for v in per_q.values())
    best_q1 = min(
        ((d, s) for (q, d), s in want.items() if q == "q1"),
        key=lambda ds: (-ds[1], ds[0]),
    )[0]
    assert [r["doc_id"] for r in got2 if r["q_id"] == "q1"] == [best_q1]


def test_bm25_query_term_set_semantics(spark):
    docs = [("a", "dog cat"), ("b", "dog dog mouse")]
    cdf = spark.createDataFrame(docs, ["doc_id", "text"])
    q1 = spark.createDataFrame([("q", "dog")], ["q_id", "query"])
    q2 = spark.createDataFrame([("q", "dog dog dog")], ["q_id", "query"])
    s1 = {r["doc_id"]: r["bm25"] for r in bm25.bm25_topk(cdf, q1).collect()}
    s2 = {r["doc_id"]: r["bm25"] for r in bm25.bm25_topk(cdf, q2).collect()}
    assert s1 == s2  # repeated query terms count once


def test_ensure_parallelism_spreads_narrow_scans(spark):
    """The scan-parallelism guard (operators/_parallel.py) repartitions a
    frame planned at few partitions up to defaultParallelism, is a no-op
    on an already-parallel frame, and never changes row content."""
    from recipeselectors_spark.operators._parallel import ensure_parallelism

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000).coalesce(1)
    spread = ensure_parallelism(narrow)
    assert spread.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))

    wide = spark.range(0, 1000).repartition(target)
    assert ensure_parallelism(wide) is wide  # no-op, not a new exchange
