"""CAR-score selection step (regression only).

Reference: /root/reference/R/step_select_carscore.R (prep :125-183; numeric
outcome enforced via ``check_type(quant=TRUE)`` :133; kernel
``care::carscore`` — omega = R_XX^{-1/2} · corr(X, y); optional shrinkage
``lambda`` :141-144; ``diagonal=TRUE`` reduces to marginal correlations :151;
score = abs(omega) :157-160; prune via ``select_percentile``, maximize).

Spark plan: a single sufficient-statistics aggregation computes the full
(p+1)×(p+1) Pearson correlation matrix — sums, squares and cross-products via
one ``agg`` over pairwise products (p is feature-count-sized, data-sized work
is one pass, map-side combined). The p×p eigendecomposition for R^{-1/2} runs
on the driver in numpy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType

from recipeselectors_spark.functions import stats
from recipeselectors_spark.operators import _scoring
from recipeselectors_spark.plans.step import SelectionStep


def correlation_matrix(df: DataFrame, cols: list[str]) -> np.ndarray:
    """Pearson correlation of ``cols`` via one sufficient-stats pass."""
    q = _scoring.quote
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a).cast("double")).alias(f"s_{i}"))
        for j in range(i, len(cols)):
            b = cols[j]
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(
                    f"p_{i}_{j}"
                )
            )
    row = df.agg(*aggs).collect()[0].asDict()
    n = float(row["__n__"])
    p = len(cols)
    s = np.array([row[f"s_{i}"] for i in range(p)], dtype=float)
    cov = np.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            cov[i, j] = cov[j, i] = row[f"p_{i}_{j}"] / n - (s[i] / n) * (s[j] / n)
    d = np.sqrt(np.maximum(np.diag(cov), 1e-300))
    return cov / np.outer(d, d)


class CarScoreStep(SelectionStep):
    step_name = "step_select_carscore"
    prune_mode = "percentile"
    maximize = True

    def __init__(
        self,
        outcome: str,
        terms=None,
        top_p=float("nan"),
        threshold=float("nan"),
        lam: float = 0.0,
        diagonal: bool = False,
        skip: bool = False,
    ) -> None:
        super().__init__(outcome, terms, top_p, threshold, skip)
        self.lam = lam
        self.diagonal = diagonal

    def check_types(self, df: DataFrame, x_names: list[str]) -> None:
        types = {f.name: f.dataType for f in df.schema.fields}
        if not isinstance(types[self.outcome], NumericType):
            # step_select_carscore.R:133 — regression only
            raise TypeError("step_select_carscore requires a numeric outcome")
        bad = [c for c in x_names if not isinstance(types[c], NumericType)]
        if bad:
            raise TypeError(f"step_select_carscore requires numeric predictors: {bad}")

    def score(self, df: DataFrame, x_names: list[str]) -> dict[str, float]:
        cols = list(x_names) + [self.outcome]
        corr = correlation_matrix(df.dropna(subset=cols), cols)
        rxx = corr[:-1, :-1]
        rxy = corr[:-1, -1]
        omega = stats.carscore(rxx, rxy, lam=self.lam, diagonal=self.diagonal)
        return {c: float(w) for c, w in zip(x_names, omega)}
