"""Distributed seeded column permutation (shadow features, permutation
importance).

Replaces the round-1 pattern ``row_number().over(Window.orderBy(...))`` with
no partitionBy — a SINGLE-PARTITION global sort that cannot run beyond one
executor's memory — with a two-part scheme that is shuffle-free per call:

1. the caller round-robin-repartitions the input ONCE
   (``df.repartition(n)``): each target partition receives every n-th row of
   every source partition, i.e. a systematic sample of the whole dataset, so
   any global ordering (by label, by time) is dispersed across partitions;
2. each permutation is then a seeded PARTITION-LOCAL shuffle inside
   ``mapInPandas`` (Arrow batches, numpy ``rng.permutation``) — no shuffle,
   no join, no global sort. Statistically this matches a global permutation
   for the purposes served here (breaking the feature↔outcome association):
   after step 1 every partition's outcome mix approximates the global mix.

Determinism: the RNG is seeded per (seed, partition_id) and consumed
sequentially over the partition's batches, so results are stable across runs
of the same input/config.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType


def _permute_map(cols: list[str], out_names: list[str], seed: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        rng = np.random.default_rng([seed, pid])
        for pdf in batches:
            n = len(pdf)
            for c, o in zip(cols, out_names):
                pdf[o] = pdf[c].to_numpy()[rng.permutation(n)]
            yield pdf

    return gen


def with_permuted(
    df: DataFrame, cols: list[str], seed: int, prefix: str = "__shadow_"
) -> tuple[DataFrame, list[str]]:
    """Append ``prefix<c>`` = seeded partition-local permutation of each
    column in ``cols``. Map-only: no shuffle, no single-partition stage."""
    out_names = [f"{prefix}{c}" for c in cols]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    schema = StructType(
        list(df.schema.fields)
        + [StructField(o, dtypes[c], True) for c, o in zip(cols, out_names)]
    )
    return df.mapInPandas(_permute_map(cols, out_names, seed), schema), out_names


def permute_columns(df: DataFrame, cols: list[str], seed: int) -> DataFrame:
    """Replace ``cols`` in-place with seeded partition-local permutations.
    Map-only: no shuffle, no single-partition stage."""
    return df.mapInPandas(_permute_map(cols, cols, seed), df.schema)
