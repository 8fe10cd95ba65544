"""Physical-plan regression tests: pushdown, pruning, exchange counts.

These pin the scale properties the engine is designed around — a filter
that stops reaching the parquet scan or a projection that stops pruning
columns is invisible at sandbox row counts but dominates at 100 TB.
"""

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_filter_pushdown_reaches_parquet(spark, events):
    q = events.where(F.col("event_type") == "purchase").select("user_id", "value")
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "event_type" in plan.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning_reaches_parquet(spark, events):
    q = events.select("user_id", "value")
    m = re.search(r"ReadSchema: struct<([^>]*)>", _plan(q))
    assert m, "no ReadSchema in scan"
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"user_id", "value"}  # props/ts/event_id pruned


def test_assembly_single_exchange(spark):
    """The whole feature matrix rides ONE conv_id exchange."""
    from recipeselectors_spark.operators import assembly
    from recipeselectors_spark.sources import transcripts as T

    tx = T.events_as_transcripts(spark, SF_DIR).drop("value")
    plan = _plan(assembly.assemble_features(tx))
    # events_as_transcripts itself needs one user_id exchange for turn_idx;
    # the assembly must NOT add another (conv_id is a function of user_id,
    # but turn_idx's row_number re-keys, so Catalyst keeps 2 total at most)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SinglePartition" not in plan


def test_melted_scoring_single_exchange(spark, events):
    """Selection-step scoring: melt -> ONE groupBy exchange with partial
    aggregation (map-side combine) before it."""
    from recipeselectors_spark.operators import _scoring

    df = events.select(
        F.col("value").cast("double").alias("value"),
        F.length("props").cast("double").alias("props_len"),
        F.when(F.col("event_type") == "purchase", "pos").otherwise("neg").alias("y"),
    )
    melted = _scoring.melt_numeric(df, ["value", "props_len"], "y")
    counts = melted.groupBy("feature", "x", "y").count()
    plan = _plan(counts)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine present


def test_exact_dedup_single_exchange(spark):
    from recipeselectors_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(D.dedup_exact(docs))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_" in plan  # map-side combine on the hash groupBy


def test_ivf_sample_is_top_n_not_global_sort(spark):
    """The content-deterministic IVF sample (orderBy(md5(id)).limit(n)) must
    compile to TakeOrderedAndProject — per-partition top-n + driver merge —
    not a rangepartitioning exchange + global sort. At 100 TB the latter
    shuffles the whole corpus to pick 2048 vectors."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(2048)
    )
    plan = _plan(q)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_mrmr_pairwise_single_exchange(spark, events):
    """The all-pairs MI pass: pair explosion -> ONE map-side-combined
    groupBy exchange, no SinglePartition, regardless of p."""
    from recipeselectors_spark.operators.select_mrmr import MrmrStep

    df = events.select(
        F.col("value").alias("f1"),
        F.length("props").cast("double").alias("f2"),
        (F.col("value") % 7).alias("f3"),
        F.when(F.col("event_type") == "purchase", "pos").otherwise("neg").alias("y"),
    )
    names = ["f1", "f2", "f3"]
    codes = MrmrStep("y", terms=names, top_p=2, bins=4)._codes_frame(df, names)
    arr = F.array(*[F.col(c) for c in names])
    pairs = (
        codes.select(F.posexplode(arr).alias("i", "va"), arr.alias("__arr__"))
        .select("i", "va", F.posexplode("__arr__").alias("j", "vb"))
        .where(F.col("i") < F.col("j"))
    )
    plan = _plan(pairs.groupBy("i", "va", "j", "vb").count())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan
    assert "partial_count" in plan


def test_roc_two_level_scan_matches_single_window(spark, events, monkeypatch):
    """Above TWO_LEVEL_THRESHOLD histogram rows, the AUC prefix scan windows
    within (feature, bucket) — a bare partitionBy(feature) would put a
    continuous feature's whole distinct-value histogram in ONE sort task at
    scale. All quantities are integer counts, so the bucketed scan must be
    BIT-identical to the single-window form."""
    from recipeselectors_spark.operators import RocStep

    df = events.select(
        F.col("value").cast("double").alias("value"),
        F.length("props").cast("double").alias("props_len"),
        F.when(F.col("event_type") == "purchase", "pos").otherwise("neg").alias("y"),
    )
    step = RocStep("y", terms=["value", "props_len"], top_p=1)
    small_path = step.score(df, ["value", "props_len"])
    monkeypatch.setattr(RocStep, "TWO_LEVEL_THRESHOLD", 0)
    two_level = step.score(df, ["value", "props_len"])
    assert small_path == two_level  # exact, not allclose
    assert all(0.5 <= v <= 1.0 for v in two_level.values())  # direction=auto
