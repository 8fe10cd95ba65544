"""Bucketed feature-matrix storage — co-located, exchange-free access.

SURVEY.md §2.4 Joins: "broadcast small dims, repartition/bucketing for
co-located joins". Writing the per-(conv_id, ts) feature matrix bucketed by
``conv_id`` (and sorted by the stable turn order) means every downstream
conv_id-keyed operation — per-conversation aggregation, windows, equi-joins
against another table bucketed the same way — reads pre-shuffled data:
Catalyst recognizes the bucket spec and plans NO Exchange. At 100 TB that
removes the single biggest cost (the conv_id shuffle) from every consumer
job; the shuffle is paid once at write time.

Local/Iceberg note: locally this uses the Spark session catalog's parquet
bucketing (``bucketBy``); on Iceberg the same layout is
``PARTITIONED BY (bucket(N, conv_id))`` with a sort order of (ts, turn_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "conv_id",
    sort_cols: tuple[str, ...] = ("ts", "turn_idx"),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed by ``key`` and sorted by ``sort_cols``."""
    present_sorts = [c for c in sort_cols if c in df.columns]
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
    )
    if present_sorts:
        writer = writer.sortBy(*present_sorts)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """Inspect the physical plan for shuffle exchanges (test/diagnostic)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
