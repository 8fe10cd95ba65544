"""BPE tokenizer training + encoding — exact oracles and plan shape.

The merge learner is pinned against an independent naive recount-from-
scratch implementation (same deterministic tie rule); the distributed
pieces are pinned layout-invariant and against driver-side re-encoding.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from recipeselectors_spark.functions.text import BPE_ISH
from recipeselectors_spark.operators import bpe


# ---------------------------------------------------------------- oracles
def naive_merges(histogram, num_merges):
    """Recount every pair from scratch each round — the slow obvious
    implementation of the same spec (max weighted count, lexicographically
    smallest pair on ties, stop when no pair repeats)."""
    words = [(list(w) + [bpe.END], c) for w, c in histogram]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        best, bn = None, 1
        for p, n in pc.items():
            if n > bn or (n == bn and best is not None and p < best):
                best, bn = p, n
        if best is None:
            break
        merges.append(best)
        nxt = []
        for syms, c in words:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt.append((out, c))
        words = nxt
    return merges, words


CORPUS = [
    "the cat sat on the mat",
    "the cats eat the mats",
    "a cat and a dog met another dog",
    "dogs and cats, cats and dogs!",
    "the dog sat; the cat ran. then the cats sat",
    "unrelated zebra quagga 12345 67",
]


def py_histogram(texts, top_words=10_000):
    pc = Counter()
    for t in texts:
        for w in re.findall(BPE_ISH, t.lower()):
            pc[w] += 1
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:top_words]


# ---------------------------------------------------------- pure kernels
def test_learn_merges_matches_naive_recount():
    hist = py_histogram(CORPUS)
    for k in (1, 5, 25, 200):
        assert bpe.learn_merges(hist, k) == naive_merges(hist, k)[0]


def test_encode_replays_training_segmentation():
    # Greedy lowest-rank-first encoding reproduces the exact final
    # segmentation the trainer reached for every histogram word.
    hist = py_histogram(CORPUS)
    merges = bpe.learn_merges(hist, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    _, final_words = naive_merges(hist, 40)
    for (w, _), (syms, _) in zip(hist, final_words):
        assert bpe.encode_word(w, ranks) == syms


def test_learn_merges_stops_when_no_pair_repeats():
    merges = bpe.learn_merges([("ab", 1), ("cd", 1)], 100)
    assert merges == []  # every pair occurs exactly once


# ------------------------------------------------------------ spark side
@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_word_histogram_matches_python(spark, docs):
    assert bpe.word_histogram(docs, top_words=500) == py_histogram(CORPUS)


def test_histogram_truncation_is_deterministic_head(spark, docs):
    full = py_histogram(CORPUS)
    assert bpe.word_histogram(docs, top_words=5) == full[:5]


def test_train_bpe_layout_invariant(spark, docs):
    m1 = bpe.train_bpe(docs, num_merges=30)
    m2 = bpe.train_bpe(docs.repartition(7), num_merges=30)
    assert m1 == m2 == bpe.learn_merges(py_histogram(CORPUS), 30)


def test_bpe_encode_matches_driver_reference(spark, docs):
    merges = bpe.train_bpe(docs, num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["bpe_tokens_n"])
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(CORPUS):
        want = []
        for w in re.findall(BPE_ISH, t.lower()):
            want.extend(bpe.encode_word(w, ranks))
        assert got[i] == (want, len(want))
        # lossless: pieces concatenate back to the pre-token stream
        joined = "".join(want).replace(bpe.END, "")
        assert joined == "".join(re.findall(BPE_ISH, t.lower()))


def test_bpe_budgets_feed_pack_sequences(spark, docs):
    # The integration the operator exists for: learned-tokenizer counts as
    # the packing budget column (instead of whitespace counts).
    from recipeselectors_spark.operators import sampling

    merges = bpe.train_bpe(docs, num_merges=30)
    enc = bpe.bpe_encode(docs, merges)
    packed = sampling.pack_sequences(enc, "bpe_tokens_n", key="doc_id",
                                     budget=16)
    rows = packed.collect()
    assert len(rows) == len(CORPUS)
    assert {"pack_id", "straddles", "bpe_tokens_n"} <= set(packed.columns)
    # every non-straddling pack obeys the budget
    by_pack: dict[str, int] = {}
    for r in rows:
        if not r["straddles"]:
            by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + r[
                "bpe_tokens_n"
            ]
    assert by_pack and all(v <= 16 for v in by_pack.values())


def test_histogram_plan_is_take_ordered(spark, docs):
    counts = (
        docs.select(
            bpe.F.explode(bpe.pretokens("text")).alias("__w__")
        )
        .where(bpe.F.col("__w__") != "")
        .groupBy("__w__")
        .agg(bpe.F.count("*").alias("__c__"))
        .orderBy(bpe.F.col("__c__").desc(), bpe.F.col("__w__"))
        .limit(100)
    )
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_bpe_encode_cache_cap_of_two_is_correct(spark, docs):
    # drop-on-full memo: a cap of 2 entries forces constant eviction on a
    # many-word corpus; output must be identical to the unbounded form
    merges = bpe.train_bpe(docs, num_merges=30)
    unbounded = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    capped = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe.bpe_encode(docs, merges, cache_entries=2).collect()
    }
    assert capped == unbounded
