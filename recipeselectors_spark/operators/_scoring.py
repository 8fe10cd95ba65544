"""Shared distributed-scoring layout.

The filter-style steps (infgain, roc, xtab, mrmr) all reduce to statistics of
per-feature contingency/histogram tables against the outcome. Rather than p
separate jobs, we *melt* the p selected columns into a tall
``(feature, x, y)`` frame with ``stack`` — ONE shuffle then serves every
feature's aggregation (SURVEY.md §4 "single-pass multi-feature contingency
aggregation"). The aggregated histograms (p × bins × classes cells) are tiny
and collected to the driver where the numpy kernels in functions/stats.py
finish the job.

Scale notes (100 TB): the melt multiplies rows by p but the immediate
``groupBy(feature, x, y).count()`` map-side-combines before the shuffle, so
shuffle volume is bounded by distinct cells, not rows. Cut-point learning for
numeric features can run on a seeded sample (``sample_frac``) — cuts are fit
state, exactness of *counts* is preserved because binning is applied
distributed, post-learning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType

from recipeselectors_spark.functions import discretize


def quote(c: str) -> str:
    return f"`{c}`"


def numeric_cols(df: DataFrame, names: list[str]) -> list[str]:
    types = {f.name: f.dataType for f in df.schema.fields}
    return [c for c in names if isinstance(types[c], NumericType)]


def nominal_cols(df: DataFrame, names: list[str]) -> list[str]:
    types = {f.name: f.dataType for f in df.schema.fields}
    return [c for c in names if isinstance(types[c], StringType)]


def melt_numeric(df: DataFrame, x_names: list[str], outcome: str) -> DataFrame:
    """(feature:string, x:double, y:string) tall frame via stack — a
    zero-shuffle generator, codegen'd. Deliberately NOT repartitioned on
    narrow inputs (r6): the melt feeds a map-side-combined aggregation
    whose pre-shuffle work is light, so an extra round-robin exchange costs
    more than the parallelism it buys (measured: chi2/roc regressed ~1 s
    at sf1.0 with it; contrast the minhash/UDF paths where the narrow-stage
    work is seconds and spreading wins 10x)."""
    pairs = ", ".join(f"'{c}', cast({quote(c)} as double)" for c in x_names)
    return df.selectExpr(
        f"stack({len(x_names)}, {pairs}) as (feature, x)",
        f"cast({quote(outcome)} as string) as y",
    )


def melt_nominal(df: DataFrame, x_names: list[str], outcome: str) -> DataFrame:
    pairs = ", ".join(f"'{c}', cast({quote(c)} as string)" for c in x_names)
    return df.selectExpr(
        f"stack({len(x_names)}, {pairs}) as (feature, x)",
        f"cast({quote(outcome)} as string) as y",
    )


def nominal_contingency(
    df: DataFrame,
    x_names: list[str],
    outcome: str,
    max_cells_per_feature: int | None = 100_000,
) -> pd.DataFrame:
    """(feature, level, class) counts, collected for the driver-side test
    kernels. Fine for genuine factors (cells = levels × classes), unbounded
    for an ID-like string column — so any feature whose cell count exceeds
    ``max_cells_per_feature`` fails fast with an actionable error instead of
    flooding the driver (VERDICT r3). The size probe reuses the contingency
    shuffle (two actions, one lineage — skipped stages)."""
    melted = melt_nominal(df, x_names, outcome)
    agg = melted.groupBy("feature", "x", "y").agg(F.count("*").alias("n"))
    if max_cells_per_feature is not None:
        sizes = agg.groupBy("feature").agg(F.count("*").alias("cells")).collect()
        too_big = {
            r["feature"]: r["cells"]
            for r in sizes
            if r["cells"] > max_cells_per_feature
        }
        if too_big:
            raise ValueError(
                f"nominal feature(s) {sorted(too_big)} have "
                f"{max(too_big.values()):,}+ contingency cells "
                f"(> max_cells_per_feature={max_cells_per_feature:,}). "
                "An ID-like string column is not a factor: drop it from the "
                "step's terms, discretize it upstream, or raise "
                "max_cells_per_feature if the cardinality is intentional."
            )
    return agg.toPandas()


def learn_numeric_cuts(
    df: DataFrame,
    x_names: list[str],
    outcome: str,
    method: str = "mdl",
    bins: int = 10,
    sample_frac: float | None = None,
    seed: int = 42,
    mdl_gate_distinct: int = 65536,
    mdl_prebucket_bins: int = 4096,
) -> dict[str, list[float]]:
    """Learn per-feature cut points in one pass over the melted frame
    (small output: p rows of cut arrays).

    ``method="equal"`` is pure Catalyst: ``percentile(x, qs)`` per feature —
    Spark's exact percentile interpolates identically to
    ``np.quantile(method="linear")`` (R type-7 / DuckDB quantile_cont), is
    map-side combined over value-count maps, and never funnels a feature's
    whole column into one Python group. ``method="mdl"`` (Fayyad–Irani
    recursive entropy partitioning) aggregates to the per-(feature, value,
    class) count histogram first — one map-side-combined shuffle — and runs
    the MDLP kernel over DISTINCT-VALUE-sized groups
    (discretize.mdl_cut_points_hist), never raw rows; ``sample_frac``
    additionally bounds distinct-value cardinality for continuous features
    at extreme scale.

    Size gate (100 TB): a *continuous* feature has a data-sized
    distinct-value set, so without a bound one kernel task would hold the
    feature's whole histogram. Features whose approx distinct count exceeds
    ``mdl_gate_distinct`` are pre-bucketed into at most
    ``mdl_prebucket_bins`` candidate bins (boundaries from a distributed
    ``percentile_approx`` sketch over the distinct-value set, assignment via
    JVM binary search, representative value = the bucket's min) BEFORE the
    MDLP kernel, so every kernel group is bounded by
    ``mdl_prebucket_bins × classes`` cells. When every distinct value lands
    in its own bucket (always true once distinct ≤ bins, the gate's whole
    point) the result is bit-identical to the ungated path — pinned by
    tests/test_select_filters.py::test_mdl_gate_agrees_with_ungated via the
    gate=0 trick;
    above the budget, cuts land on bucket-representative midpoints (a
    documented approximation, same spirit as ``sample_frac``).
    ``mdl_gate_distinct=None`` disables the gate."""
    melted = melt_numeric(df, x_names, outcome)
    if sample_frac is not None:
        melted = melted.sample(fraction=sample_frac, seed=seed)

    if method == "equal":
        if bins < 2:
            return {c: [] for c in x_names}
        qs = [float(q) for q in np.linspace(0.0, 1.0, bins + 1)[1:-1]]
        rows = (
            melted.where(F.col("x").isNotNull())
            .groupBy("feature")
            .agg(F.percentile("x", F.lit(qs).cast("array<double>")).alias("qs"))
            .collect()
        )
        out: dict[str, list[float]] = {}
        for r in rows:
            cuts: list[float] = []
            for q in r["qs"] or []:
                # strictly-increasing dedup, as in equal_freq_cut_points
                if q is not None and (not cuts or q > cuts[-1]):
                    cuts.append(float(q))
            out[r["feature"]] = cuts
        return out

    if method != "mdl":
        raise ValueError(f"unknown cut-learning method {method!r}")

    hist = (
        melted.where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("feature", "x", "y")
        .agg(F.count("*").alias("n"))
    )
    if mdl_gate_distinct is not None:
        hist = _prebucket_oversized(hist, mdl_gate_distinct, mdl_prebucket_bins)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        feat = pdf["feature"].iloc[0]
        piv = pdf.pivot_table(
            index="x", columns="y", values="n", aggfunc="sum", fill_value=0
        ).sort_index()
        cuts = discretize.mdl_cut_points_hist(
            piv.index.to_numpy(dtype=float), piv.to_numpy(np.int64)
        )
        return pd.DataFrame({"feature": [feat], "cuts": [cuts]})

    out = (
        hist.groupBy("feature")
        .applyInPandas(kernel, schema="feature string, cuts array<double>")
        .collect()
    )
    found = {r["feature"]: list(r["cuts"]) for r in out}
    # features with no non-null (x, y) rows still get an (empty) entry so
    # downstream binning keeps them (single-bin semantics)
    return {c: found.get(c, []) for c in x_names}


def _prebucket_oversized(
    hist: DataFrame, gate: int, n_bins: int
) -> DataFrame:
    """Bound every feature's (x, y) histogram to ≤ ``n_bins`` distinct values.

    Features whose approx distinct-value count exceeds ``gate`` get their
    values collapsed onto ``n_bins`` percentile buckets: boundaries come from
    one distributed ``percentile_approx`` sketch over the feature's distinct
    values (mergeable GK summary — bounded memory at any scale, and exact
    while the value count stays under its accuracy), assignment is a JVM
    binary search (``ml.feature.Bucketizer``), and each bucket is replaced by
    its minimum actual value so that when distinct ≤ bins every value keeps
    its own bucket and the output is bit-identical to the input. The two
    driver actions (distinct counts, boundaries) reuse the histogram
    shuffle (skipped stages), so the gate costs ~nothing when it never
    fires."""
    counts = (
        hist.groupBy("feature")
        .agg(F.approx_count_distinct("x").alias("d"))
        .collect()
    )
    big = [r["feature"] for r in counts if r["d"] > gate]
    if not big:
        return hist
    from pyspark.ml.feature import Bucketizer

    accuracy = max(10000, 2 * n_bins)
    qs = [j / n_bins for j in range(1, n_bins)]
    bounds_rows = (
        hist.where(F.col("feature").isin(big))
        .select("feature", "x")
        .distinct()
        .groupBy("feature")
        .agg(
            F.percentile_approx(
                "x", F.lit(qs).cast("array<double>"), F.lit(accuracy)
            ).alias("bounds")
        )
        .collect()
    )
    splits = {
        r["feature"]: sorted({float(b) for b in (r["bounds"] or []) if b is not None})
        for r in bounds_rows
    }
    small = hist.where(~F.col("feature").isin(big))
    parts = []
    for feat in big:
        sp = splits.get(feat) or []
        part = hist.where(F.col("feature") == feat)
        if not sp:
            parts.append(part.withColumn("_bin", F.lit(0.0)))
            continue
        buck = Bucketizer(
            splits=[float("-inf"), *sp, float("inf")],
            inputCol="x",
            outputCol="_bin",
            handleInvalid="keep",  # NaN -> own bucket; pivot drops it, as ungated
        )
        parts.append(buck.transform(part))
    bucketed = parts[0]
    for p in parts[1:]:
        bucketed = bucketed.unionByName(p)
    regrouped = bucketed.groupBy("feature", "_bin", "y").agg(
        F.sum("n").alias("n")
    )
    reps = bucketed.groupBy("feature", "_bin").agg(F.min("x").alias("x"))
    rebuilt = regrouped.join(reps, ["feature", "_bin"]).select(
        "feature", "x", "y", "n"
    )
    return small.select("feature", "x", "y", "n").unionByName(rebuilt)


def binned_joint_counts(
    df: DataFrame,
    cuts: dict[str, list[float]],
    outcome: str,
) -> dict[str, np.ndarray]:
    """Apply broadcast cut points to the melted frame with a pure-Catalyst
    array expression (bin = #cuts <= x), then one global
    ``groupBy(feature, bin, y).count()``. Returns {feature: joint matrix}."""
    x_names = list(cuts.keys())
    melted = melt_numeric(df, x_names, outcome)
    spark = df.sparkSession
    cuts_df = spark.createDataFrame(
        [(k, [float(c) for c in v]) for k, v in cuts.items()],
        "feature string, cuts array<double>",
    )
    joined = melted.join(F.broadcast(cuts_df), "feature")
    binned = joined.select(
        "feature",
        F.when(
            F.col("x").isNull(), F.lit(-1)
        ).otherwise(
            F.size(F.filter("cuts", lambda c: F.col("x") >= c))
        ).alias("bin"),
        "y",
    )
    pdf = (
        binned.groupBy("feature", "bin", "y")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    return joint_tables(pdf, bin_col="bin")


def joint_tables(
    pdf: pd.DataFrame, bin_col: str = "x", drop_null_bin: bool = True
) -> dict[str, np.ndarray]:
    """Pivot the collected (feature, bin, y, n) histogram into per-feature
    joint count matrices (rows=bins, cols=classes)."""
    out: dict[str, np.ndarray] = {}
    for feat, g in pdf.groupby("feature"):
        if drop_null_bin:
            g = g[~g[bin_col].isna()]
            if np.issubdtype(g[bin_col].dtype, np.number):
                g = g[g[bin_col] >= 0]
        tab = g.pivot_table(
            index=bin_col, columns="y", values="n", aggfunc="sum", fill_value=0
        )
        out[str(feat)] = tab.to_numpy(dtype=float)
    return out
