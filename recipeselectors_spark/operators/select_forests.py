"""Random-forest importance selection step.

Reference: /root/reference/R/step_select_forests.R (prep :140-201; default
engine ranger with ``importance='permutation'`` :73-74; mode inferred from
the outcome type :156; tunable mtry/trees/min_n :242-256; prune via
``select_percentile``, maximize).

MLlib mapping: RandomForestClassifier/Regressor ``featureImportances``
(Gini / variance gain) as the default; ``importance='permutation'`` computes
true permutation importance — per-feature score drop after shuffling that
column (distributed: one scored pass per feature over a seeded per-partition
permutation; documented Gini-vs-permutation delta per SURVEY.md §7/M3).
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, functions as F

from recipeselectors_spark.operators import _mllib, _permute
from recipeselectors_spark.operators.importance import pull_importances
from recipeselectors_spark.plans.step import SelectionStep


class ForestsStep(SelectionStep):
    step_name = "step_select_forests"
    prune_mode = "percentile"
    maximize = True

    def __init__(
        self,
        outcome: str,
        terms=None,
        top_p=float("nan"),
        threshold=float("nan"),
        trees: int = 100,
        mtry: int | None = None,
        min_n: int = 1,
        max_depth: int = 10,
        importance: str = "impurity",  # impurity | permutation
        seed: int = 42,
        skip: bool = False,
    ) -> None:
        super().__init__(outcome, terms, top_p, threshold, skip)
        self.trees = trees
        self.mtry = mtry
        self.min_n = min_n
        self.max_depth = max_depth
        self.importance = importance
        self.seed = seed

    def _estimator(self, kind: str):
        cls = RandomForestClassifier if kind == "classification" else RandomForestRegressor
        kwargs = dict(
            numTrees=self.trees,
            minInstancesPerNode=self.min_n,
            maxDepth=self.max_depth,
            seed=self.seed,
        )
        if self.mtry is not None:
            kwargs["featureSubsetStrategy"] = str(self.mtry)
        return cls(**kwargs)

    def score(self, df: DataFrame, x_names: list[str]) -> dict[str, float]:
        assembled, kind = _mllib.prepare(df, x_names, self.outcome)
        model = _mllib.fit_estimator(self._estimator(kind), assembled)
        if self.importance == "impurity":
            return pull_importances(model, x_names, scaled=True)
        return self._permutation_importance(df, model, x_names, kind)

    def _metric(self, model, scored_input: DataFrame, kind: str) -> float:
        pred = model.transform(scored_input)
        if kind == "classification":
            return (
                pred.select(
                    F.avg(
                        (F.col(_mllib.LABEL_COL) == F.col("prediction")).cast("double")
                    ).alias("m")
                ).collect()[0]["m"]
            )
        return pred.select(
            (-F.avg((F.col(_mllib.LABEL_COL) - F.col("prediction")) ** 2)).alias("m")
        ).collect()[0]["m"]

    def _permutation_importance(
        self, df: DataFrame, model, x_names: list[str], kind: str
    ) -> dict[str, float]:
        """Baseline metric minus metric after per-column permutation.

        The input is round-robin repartitioned ONCE (each partition a
        systematic sample of the dataset, dispersing any global ordering)
        and cached; each feature's permutation is then a seeded
        PARTITION-LOCAL shuffle of that column via mapInPandas
        (operators/_permute.py) — map-only scoring pass per feature, no
        global sort, no join, nothing single-partition.
        """
        base_cols = list(x_names) + [self.outcome]
        n_parts = df.sparkSession.sparkContext.defaultParallelism
        clean = df.select(*base_cols).dropna().repartition(n_parts).cache()
        assembled, _ = _mllib.prepare(clean, x_names, self.outcome)
        baseline = self._metric(model, assembled, kind)

        out: dict[str, float] = {}
        for i, c in enumerate(x_names):
            shuffled = _permute.permute_columns(clean, [c], seed=self.seed + i)
            assembled_i, _ = _mllib.prepare(shuffled, x_names, self.outcome)
            out[c] = float(baseline - self._metric(model, assembled_i, kind))
        clean.unpersist()
        return out

    def tunable(self):
        base = super().tunable()
        base["mtry"] = {"type": "int", "range": (1, 20), "finalize": "data_dim"}
        base["trees"] = {"type": "int", "range": (1, 2000)}
        base["min_n"] = {"type": "int", "range": (2, 40)}
        return base
