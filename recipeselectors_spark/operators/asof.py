"""Point-in-time as-of join — the north-rule centerpiece.

Spark has no native as-of join (SURVEY.md §2.4 "Joins"). Two strategies:

* ``asof_join_union`` — the pure-Catalyst form: tag + union both sides,
  one window per conversation ordered by ``(ts, side, turn order)``, and
  ``last(value, ignorenulls=True)`` carries the latest feature row with
  ``feature.ts <= spine.ts`` onto each spine row. ONE shuffle, whole-stage
  codegen, no Python. Preferred whenever the value columns are simple.

* ``asof_join_cogroup`` — the general scalable form the north rule names
  ("sorted-merge over range-partitioned, salt-balanced conv_id shards"):
  a driver-side shard map packs conversations into balanced shards by row
  count (hot conversations get dedicated shards — explicit skew split;
  conversations are never split across shards, preserving whole-conversation
  locality that as-of correctness requires), the map is broadcast-joined to
  both sides, and each shard is sorted-merged with ``pandas.merge_asof``
  inside ``cogroup(...).applyInPandas`` (Arrow-vectorized, no per-row
  Python). Supports tolerance and arbitrary value columns.

At 10^12 turns the shard map is computed from approximate per-conversation
counts (a seeded sample) — only *balance* depends on it, never correctness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

CONV = "conv_id"


def asof_join_union(
    spine: DataFrame,
    features: DataFrame,
    value_cols: list[str],
    on: str = CONV,
    ts: str = "ts",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join, exact matches allowed (feature.ts <= spine.ts).

    Result: every spine row + ``value_cols`` from the latest qualifying
    feature row (NULL when none). Catalyst-only: union + one window.
    """
    spine_cols = spine.columns
    s = spine.withColumn("__side__", F.lit(1))
    f = features.select(
        on, ts, *value_cols
    ).withColumn("__side__", F.lit(0))

    for c in spine_cols:
        if c not in f.columns:
            f = f.withColumn(c, F.lit(None).cast(dict(spine.dtypes)[c]))
    for c in value_cols:
        if c not in s.columns:
            s = s.withColumn(c, F.lit(None).cast(dict(f.dtypes)[c]))

    unioned = s.select(*spine_cols, "__side__", *value_cols).unionByName(
        f.select(*spine_cols, "__side__", *value_cols)
    )

    # features sort before spine rows at equal ts => exact matches visible
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side__"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if tolerance_s is not None:
        out = out.withColumn(
            "__feat_ts__",
            F.last(
                F.when(F.col("__side__") == 0, F.col(ts)), ignorenulls=True
            ).over(w),
        )
        age = F.col(ts).cast("timestamp").cast("long") - F.col("__feat_ts__").cast("timestamp").cast("long")
        for c in value_cols:
            out = out.withColumn(
                c, F.when(age <= tolerance_s, F.col(c)).otherwise(F.lit(None))
            )
        out = out.drop("__feat_ts__")
    return out.where(F.col("__side__") == 1).drop("__side__")


def build_shard_map(
    left: DataFrame,
    right: DataFrame,
    num_shards: int,
    on: str = CONV,
    sample_frac: float | None = None,
    seed: int = 42,
    skew_factor: float = 2.0,
) -> pd.DataFrame:
    """Greedy balanced bin-packing of conversations into shards by row count.

    Conversations whose count exceeds ``skew_factor × (total/num_shards)``
    are isolated into dedicated shards (explicit skew split). Returns a small
    pandas frame (conv_id, shard). With ``sample_frac`` the counts come from
    a seeded sample — at 10^12 rows balance is approximate, correctness is
    unaffected (every conversation still maps to exactly one shard).
    """
    l = left.select(on) if sample_frac is None else left.select(on).sample(
        fraction=sample_frac, seed=seed
    )
    r = right.select(on) if sample_frac is None else right.select(on).sample(
        fraction=sample_frac, seed=seed
    )
    counts = (
        l.unionByName(r).groupBy(on).agg(F.count("*").alias("n")).toPandas()
    )
    counts = counts.sort_values(["n", on], ascending=[False, True]).reset_index(
        drop=True
    )
    total = counts["n"].sum()
    cap = total / max(num_shards, 1)

    shard_of: dict[str, int] = {}
    loads: list[float] = []
    for conv, n in zip(counts[on], counts["n"]):
        if n > skew_factor * cap or not loads:
            if n > skew_factor * cap:
                shard_of[conv] = len(loads)
                loads.append(float(n))
                continue
        # greedy: lightest shard among the regular pool
        if len(loads) < num_shards:
            shard_of[conv] = len(loads)
            loads.append(float(n))
        else:
            i = int(np.argmin(loads))
            shard_of[conv] = i
            loads[i] += float(n)
    return pd.DataFrame(
        {on: list(shard_of.keys()), "shard": list(shard_of.values())}
    )


def asof_join_cogroup(
    spine: DataFrame,
    features: DataFrame,
    value_cols: list[str],
    on: str = CONV,
    ts: str = "ts",
    tolerance_s: int | None = None,
    num_shards: int | None = None,
    sample_frac: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """General sorted-merge as-of join over salt-balanced conv_id shards."""
    spark = spine.sparkSession
    if num_shards is None:
        num_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    shard_pdf = build_shard_map(
        spine, features, num_shards, on=on, sample_frac=sample_frac
    )
    # two independent map frames: both sides often share lineage (derived
    # from the same scan), and a shared broadcast frame would trip Spark's
    # ambiguous-self-join analysis inside the cogroup
    shard_l = F.broadcast(spark.createDataFrame(shard_pdf))
    shard_r = F.broadcast(spark.createDataFrame(shard_pdf.copy()))

    def _fresh(df: DataFrame) -> DataFrame:
        # re-alias every column: fresh expression IDs, so two sides sharing
        # one scan don't trip the ambiguous-self-join analysis in the cogroup
        return df.select([F.col(c).alias(c) for c in df.columns])

    s = _fresh(spine).join(shard_l, on, "left").fillna({"shard": -1})
    feats = _fresh(features.select(on, ts, *value_cols))
    f = feats.join(shard_r, on, "left").fillna({"shard": -1})

    spine_fields = [fld for fld in spine.schema.fields]
    out_schema_parts = [f"`{fld.name}` {fld.dataType.simpleString()}" for fld in spine_fields]
    fdtypes = dict(feats.dtypes)
    for c in value_cols:
        out_schema_parts.append(f"`{c}` {fdtypes[c]}")
    out_schema = ", ".join(out_schema_parts)
    spine_names = [fld.name for fld in spine_fields]

    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None

    def merge(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame) -> pd.DataFrame:
        left_pdf = left_pdf.drop(columns=["shard"]).sort_values(
            [ts, on], kind="mergesort"
        )
        right_pdf = right_pdf.drop(columns=["shard"]).sort_values(
            [ts, on], kind="mergesort"
        )
        if left_pdf.empty:
            return pd.DataFrame(columns=spine_names + value_cols)
        merged = pd.merge_asof(
            left_pdf,
            right_pdf,
            on=ts,
            by=on,
            direction=direction,
            tolerance=tol,
            allow_exact_matches=True,
        )
        return merged[spine_names + value_cols]

    return (
        s.groupBy("shard")
        .cogroup(f.groupBy("shard"))
        .applyInPandas(merge, schema=out_schema)
    )


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: str = CONV,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the big side with pmod(hash(row), S),
    explode the small side 0..S-1 (SURVEY.md §2.4). For genuinely small dims
    prefer ``big.join(F.broadcast(small), on)`` — Catalyst broadcasts free."""
    b = big.withColumn(
        "__salt__", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt))
    )
    s = small.withColumn(
        "__salt__", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [on, "__salt__"], how).drop("__salt__")
