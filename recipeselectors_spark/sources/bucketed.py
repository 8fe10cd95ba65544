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

from pyspark.sql import DataFrame, SparkSession, functions as F


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


def write_day_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    day_col: str = "ds",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` partitioned by calendar day of ``ts_col`` — the
    parquet analogue of Iceberg's ``days(ts)`` transform partition spec
    (SURVEY.md §2.4). A time-range filter on ``day_col`` then prunes whole
    partitions at planning time (PartitionFilters in the scan node, pinned
    by tests/test_bucketed.py::test_day_partition_pruning), so an
    incremental job touching one day of a 10^12-turn table reads one day's
    files. On Iceberg the engine derives the day from ``ts`` predicates
    automatically; on plain parquet the reader filters ``day_col``
    explicitly — :func:`read_day_partitioned` adds it from a ts range."""
    out = df.withColumn(day_col, F.to_date(F.col(ts_col)))
    out.write.mode(mode).partitionBy(day_col).parquet(path)


def read_day_partitioned(
    spark: SparkSession,
    path: str,
    ts_from=None,
    ts_to=None,
    ts_col: str = "ts",
    day_col: str = "ds",
) -> DataFrame:
    """Read a day-partitioned table with BOTH the row-level ts filter and
    the partition-level day filter derived from it — the day predicate is
    what Catalyst turns into partition pruning."""
    df = spark.read.parquet(path)
    if ts_from is not None:
        df = df.where(
            (F.col(ts_col) >= F.lit(ts_from))
            & (F.col(day_col) >= F.to_date(F.lit(ts_from)))
        )
    if ts_to is not None:
        # ts_to is EXCLUSIVE, so the last day that can contain a matching
        # row is the day of (ts_to - 1 microsecond): an exact-midnight
        # ts_to must not admit (and scan) the whole following day
        last_day = F.to_date(
            F.lit(ts_to).cast("timestamp") - F.expr("INTERVAL 1 MICROSECOND")
        )
        df = df.where(
            (F.col(ts_col) < F.lit(ts_to)) & (F.col(day_col) <= last_day)
        )
    return df
