"""Distributed Catalyst transcript synthesizer: determinism, schema,
monotonic ordering, skew shape."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from recipeselectors_spark.sources import transcripts as T


@pytest.fixture(scope="module")
def tx(spark):
    return T.synthesize_transcripts_distributed(
        spark, n_convs=500, mean_turns=20, seed=42
    ).cache()


def _checksum(df):
    return df.agg(
        F.sum(F.xxhash64("conv_id", "turn_idx", "text", "role").cast("decimal(38,0)"))
    ).collect()[0][0]


def test_deterministic_across_runs_and_parallelism(spark, tx):
    again = T.synthesize_transcripts_distributed(
        spark, n_convs=500, mean_turns=20, seed=42
    )
    assert _checksum(tx) == _checksum(again)
    repartitioned = again.repartition(13)
    assert _checksum(tx) == _checksum(repartitioned)


def test_schema_matches_contract(tx):
    assert [f.name for f in tx.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    kinds = dict((f.name, f.dataType.simpleString()) for f in tx.schema.fields)
    assert kinds["turn_idx"] == "int"
    assert kinds["ts"].startswith("timestamp")


def test_ts_strictly_increasing_per_conversation(tx):
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        tx.withColumn("prev", F.lag("ts").over(w))
        .where("prev is not null and ts <= prev")
        .count()
    )
    assert bad == 0


def test_hot_conversations_skewed(tx):
    counts = (
        tx.groupBy("conv_id").count().orderBy(F.col("count").desc()).limit(5).toPandas()
    )
    median = (
        tx.groupBy("conv_id").count().agg(F.median("count")).collect()[0][0]
    )
    assert counts["count"].iloc[0] >= 20 * median  # hot conv >> median


def test_different_seed_differs(spark, tx):
    other = T.synthesize_transcripts_distributed(
        spark, n_convs=500, mean_turns=20, seed=7
    )
    assert _checksum(tx) != _checksum(other)
