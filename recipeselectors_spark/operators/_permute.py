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


def rotate_columns(
    df: DataFrame,
    cols: list[str],
    id_cols: list[str],
    seed: int = 42,
    bucket_chars: int = 3,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Content-deterministic column permutation — the REPLAYABLE alternative
    to the partition-local shuffle above.

    Rows are bucketed by the leading ``bucket_chars`` hex chars of
    ``md5(seed|id...)`` (16**bucket_chars buckets) and, within each bucket
    ordered by that hash, every column in ``cols`` is cyclically rotated by
    one position (the last row takes the first row's value). Properties:

    - a true permutation per column (the multiset of values is preserved);
    - layout-invariant: the mapping depends only on row CONTENT (the id
      columns), never on partitioning, scan order, or cluster size — the
      same input gives the same permutation on 1 core or 1000 executors,
      and the whole thing replays in plain SQL (the driver oracle does);
    - scale-safe: ONE exchange on the bucket key; each window partition
      holds ~n/16**bucket_chars rows, no global sort, no driver collect.

    Pick ``bucket_chars`` so the mean bucket occupancy λ = n/16**chars is
    comfortably above ~8: a singleton bucket rotates onto itself (keeps its
    value), and the fraction of such rows is ≈ e^-λ (Poisson) — negligible
    at λ=15 (default 3 chars ≈ 4096 buckets is sized for n ≥ ~50k; use 2
    for small frames, 4+ when a bucket's rows would not fit one task).

    Trade-off vs :func:`permute_columns`: the local shuffle is map-only
    (cheapest) but depends on the physical layout; rotation costs one
    bounded exchange and buys bit-reproducibility. ``id_cols`` should be a
    row-unique key with a stable string rendering (ints/strings — doubles
    would format differently across engines). If ``id_cols`` may collide,
    pass every downstream-relevant column as ``tiebreak_cols``: they join
    the ORDER BY (numeric comparison — engine-identical, no string
    rendering), and rows that tie on key + ids + tiebreaks are identical
    in every column that matters, so any residual tie order is harmless.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols]
        )
    )
    kc, bc = "__rot_key__", "__rot_bucket__"
    rn, cnt = "__rot_rn__", "__rot_cnt__"
    out = df.withColumn(kc, key).withColumn(bc, F.substring(F.col(kc), 1, bucket_chars))
    w = Window.partitionBy(bc).orderBy(kc, *id_cols, *(tiebreak_cols or []))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # wraparound by POSITION (last row takes the first row's value), not by
    # coalesce(lead, first): a genuine NULL value in `c` would make lead()
    # NULL mid-bucket and coalesce would silently swap it for the bucket's
    # first value — destroying the NULL and breaking the permutation
    out = out.withColumn(rn, F.row_number().over(w)).withColumn(
        cnt, F.count(F.lit(1)).over(w_full)
    )
    for c in cols:
        out = out.withColumn(
            c,
            F.when(F.col(rn) == F.col(cnt), F.first(c).over(w_full)).otherwise(
                F.lead(c, 1).over(w)
            ),
        )
    return out.drop(kc, bc, rn, cnt)
