"""mRMR (max-relevance min-redundancy) selection step.

Reference: /root/reference/R/step_select_mrmr.R (prep :116-165; kernel
``praznik::MRMR`` at :129-136 with ``k = p`` so all features are ranked
(:134); greedy score at selection time: score_i = I(Xi;Y) − mean_{s∈S}
I(Xi;Xs); prune via ``select_percentile``, maximize).

Spark plan: discretize numeric predictors once (equal-frequency bins — the MI
estimator's binning; nominal predictors use their levels), materialize a
compact per-row *codes* frame, cache it. Relevance I(Xi;Y) for all i = one
melted shuffle. Each greedy iteration computes I(Xi;Xs_new) for every
remaining i against the newly-selected feature with ONE melted
``groupBy(feature, code, s_code).count()`` shuffle — p iterations ⇒ p
shuffles over the cached codes frame, never a p×p blowup in one job. The
greedy argmax itself is driver-side over the p-sized score vector.
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
        skip: bool = False,
    ) -> None:
        super().__init__(outcome, terms, top_p, threshold, skip)
        self.bins = bins
        self.sample_frac = sample_frac

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

    def _greedy(self, codes: DataFrame, x_names: list[str]) -> dict[str, float]:
        relevance = self._mi_against(codes, x_names, "__y__")
        relevance = {c: relevance.get(c, 0.0) for c in x_names}

        selected: list[str] = []
        scores: dict[str, float] = {}
        redundancy_sum = {c: 0.0 for c in x_names}
        remaining = list(x_names)

        first = max(remaining, key=lambda c: relevance[c])
        scores[first] = relevance[first]
        selected.append(first)
        remaining.remove(first)

        while remaining:
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
