"""Scan-parallelism guard for CPU-heavy narrow stages.

A parquet file written as one (or few) row groups scans as one (or few)
tasks — Spark cannot split inside a row group — so any expensive per-row
work that precedes the first exchange (minhash signatures, LSH banding,
pandas-UDF kernels, regex chains) serializes onto a handful of cores no
matter how large the cluster is (guide §2.5 "input skew": fix at the
source, otherwise repartition immediately after the read).

``ensure_parallelism`` is the scale-adaptive form of that repartition: it
round-robins the frame up to the cluster's default parallelism ONLY when
the planned scan has materially fewer partitions, and is a no-op on inputs
that already split well (at real scale a 100 TB table scans as 10^5+
tasks, so this never fires there). Round-robin keeps its deterministic
sort-before-repartition behavior (SPARK-23207), and every operator using
it is layout-invariant by construction, so results are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` when its planned
    partition count is below ``min_ratio`` of it. Batch frames only
    (streaming frames cannot be probed; callers on streaming paths must
    not use this)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.isStreaming:
        return df
    n = df.rdd.getNumPartitions()
    if n < target * min_ratio:
        return df.repartition(target)
    return df
