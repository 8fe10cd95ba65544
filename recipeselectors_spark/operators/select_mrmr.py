"""mRMR (max-relevance min-redundancy) selection step.

Reference: /root/reference/R/step_select_mrmr.R (prep :116-165; kernel
``praznik::MRMR`` at :129-136 with ``k = p`` so all features are ranked
(:134); greedy score at selection time: score_i = I(Xi;Y) − mean_{s∈S}
I(Xi;Xs); prune via ``select_percentile``, maximize).

Spark plan: discretize numeric predictors once (equal-frequency bins — the MI
estimator's binning; nominal predictors use their levels), materialize a
compact per-row *codes* frame, cache it. Relevance I(Xi;Y) for all i = one
melted shuffle. Redundancy has two paths:

* **all-pairs fast path** (p <= ``all_pairs_max``, default 64): ALL pairwise
  MIs in ONE double-exploded ``groupBy(fa, va, fb, vb).count()`` shuffle —
  the map side emits p(p-1)/2 struct pairs per row but the map-side combine
  collapses them to at most pairs × bins² tiny cells per partition; the
  greedy loop then runs purely driver-side over the cached MI matrix.
  2 Spark jobs total instead of p+1 — at p=500 sequential job launch
  latency alone dominates the per-iteration path.
* **per-iteration path** (p > all_pairs_max): each greedy iteration computes
  I(Xi;Xs_new) for every remaining i against the newly-selected feature with
  ONE melted ``groupBy(feature, code, s_code).count()`` shuffle — p
  iterations ⇒ p shuffles over the cached codes frame, never a p×p row
  blowup in one job (at large p the pair explosion would dwarf the input).

Both paths compute MI from identical contingency tables, so scores agree
exactly (pinned by tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from recipeselectors_spark.functions import stats
from recipeselectors_spark.operators import _scoring
from recipeselectors_spark.plans.step import SelectionStep


class MrmrStep(SelectionStep):
    step_name = "step_select_mrmr"
    prune_mode = "percentile"
    maximize = True

    def __init__(
        self,
        outcome: str,
        terms=None,
        top_p=float("nan"),
        threshold=float("nan"),
        bins: int = 10,
        sample_frac: float | None = None,
        all_pairs_max: int = 64,
        skip: bool = False,
    ) -> None:
        super().__init__(outcome, terms, top_p, threshold, skip)
        self.bins = bins
        self.sample_frac = sample_frac
        self.all_pairs_max = all_pairs_max

    def _codes_frame(self, df: DataFrame, x_names: list[str]) -> DataFrame:
        """Per-row integer codes for every predictor + the outcome."""
        num = _scoring.numeric_cols(df, x_names)
        cols = []
        if num:
            cuts = _scoring.learn_numeric_cuts(
                df, num, self.outcome, method="equal",
                bins=self.bins, sample_frac=self.sample_frac,
            )
        for c in x_names:
            q = _scoring.quote(c)
            if c in (num or []):
                bounds = cuts.get(c, [])
                if bounds:
                    arr = ", ".join(repr(float(b)) for b in bounds)
                    expr = (
                        f"case when {q} is null then '-1' else cast(size(filter("
                        f"array({arr}), b -> cast({q} as double) >= b)) as string) end"
                    )
                else:
                    expr = f"case when {q} is null then '-1' else '0' end"
            else:
                expr = f"coalesce(cast({q} as string), '-1')"
            cols.append(f"{expr} as {q}")
        cols.append(
            f"cast({_scoring.quote(self.outcome)} as string) as `__y__`"
        )
        return df.selectExpr(*cols)

    def score(self, df: DataFrame, x_names: list[str]) -> dict[str, float]:
        codes = self._codes_frame(df, x_names).cache()
        try:
            return self._greedy(codes, x_names)
        finally:
            codes.unpersist()

    def _mi_against(
        self, codes: DataFrame, features: list[str], target_col: str
    ) -> dict[str, float]:
        """I(Xi; target) for all i in one melted shuffle."""
        pairs = ", ".join(
            f"'{c}', {_scoring.quote(c)}" for c in features
        )
        melted = codes.selectExpr(
            f"stack({len(features)}, {pairs}) as (feature, code)",
            f"{_scoring.quote(target_col)} as t",
        )
        pdf = (
            melted.where(F.col("t").isNotNull())
            .groupBy("feature", "code", "t")
            .agg(F.count("*").alias("n"))
            .toPandas()
        )
        out: dict[str, float] = {}
        for feat, g in pdf.groupby("feature"):
            tab = g.pivot_table(
                index="code", columns="t", values="n", aggfunc="sum", fill_value=0
            ).to_numpy(dtype=float)
            out[str(feat)] = stats.mutual_information(tab)
        return out

    def _pairwise_mi(
        self, codes: DataFrame, x_names: list[str]
    ) -> dict[tuple[str, str], float]:
        """ALL pairwise I(Xi;Xj) in one shuffle: explode each row into its
        p(p-1)/2 (feature, code) struct pairs, count the joint cells with a
        map-side-combined groupBy, pivot driver-side. The cell space is
        pairs × bins² — tiny regardless of row count."""
        # the exploded tuples carry FEATURE INDICES, not name strings — the
        # shuffled pair stream is (tinyint, code, tinyint, code); names are
        # mapped back on the p²-sized driver frame (measured ~2× cheaper
        # than struct-of-strings tuples at p=8 × 3.2M rows)
        arr = F.array(*[F.col(c) for c in x_names])
        pairs = (
            codes.select(F.posexplode(arr).alias("i", "va"), arr.alias("__arr__"))
            .select("i", "va", F.posexplode("__arr__").alias("j", "vb"))
            .where(F.col("i") < F.col("j"))
        )
        pdf = (
            pairs.groupBy("i", "va", "j", "vb")
            .agg(F.count("*").alias("n"))
            .toPandas()
        )
        out: dict[tuple[str, str], float] = {}
        for (i, j), g in pdf.groupby(["i", "j"]):
            tab = g.pivot_table(
                index="va", columns="vb", values="n", aggfunc="sum", fill_value=0
            ).to_numpy(dtype=float)
            # store BOTH orientations: mi_between(candidate, selected) must
            # sum the table with the CANDIDATE on the rows, exactly as
            # _mi_against does, so the two paths agree to the last ulp even
            # though MI is mathematically symmetric (float summation order
            # differs under transpose — ADVICE r3)
            out[(x_names[int(i)], x_names[int(j)])] = stats.mutual_information(tab)
            out[(x_names[int(j)], x_names[int(i)])] = stats.mutual_information(tab.T)
        return out

    def _greedy(self, codes: DataFrame, x_names: list[str]) -> dict[str, float]:
        relevance = self._mi_against(codes, x_names, "__y__")
        relevance = {c: relevance.get(c, 0.0) for c in x_names}

        all_pairs = len(x_names) <= self.all_pairs_max
        pair_mi: dict[tuple[str, str], float] = (
            self._pairwise_mi(codes, x_names) if all_pairs and len(x_names) > 1
            else {}
        )

        def mi_between(a: str, b: str) -> float:
            # (a, b) is always present: _pairwise_mi stores both orientations
            return pair_mi.get((a, b), 0.0)

        selected: list[str] = []
        scores: dict[str, float] = {}
        redundancy_sum = {c: 0.0 for c in x_names}
        remaining = list(x_names)

        first = max(remaining, key=lambda c: relevance[c])
        scores[first] = relevance[first]
        selected.append(first)
        remaining.remove(first)

        while remaining:
            if all_pairs:
                for c in remaining:
                    redundancy_sum[c] += mi_between(c, selected[-1])
            else:
                mi_s = self._mi_against(codes, remaining, selected[-1])
                for c in remaining:
                    redundancy_sum[c] += mi_s.get(c, 0.0)
            k = len(selected)
            cand = {
                c: relevance[c] - redundancy_sum[c] / k for c in remaining
            }
            best = max(cand, key=lambda c: cand[c])
            scores[best] = cand[best]
            selected.append(best)
            remaining.remove(best)
        return {c: float(scores[c]) for c in x_names}
