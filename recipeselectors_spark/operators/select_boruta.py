"""Boruta all-relevant selection step.

Reference: /root/reference/R/step_select_boruta.R (prep :97-133; kernel
``Boruta::Boruta`` with defaults ``pValue=0.01, mcAdj=TRUE, maxRuns=100``
(:55); keeps Confirmed **and Tentative**, excludes only
``finalDecision == "Rejected"`` (:116)).

Algorithm (Kursa & Rudnicki 2010, re-implemented Spark-first):
each run builds shadow features — seeded permutations of every real column —
fits a random forest on [real + shadow], and marks a "hit" for every real
feature whose importance exceeds max(shadow importances). After each run,
two exact binomial tail tests at p=0.5 over accumulated hits decide features:
too many hits → Confirmed, too few → Rejected (two one-sided tests at
pValue/2, Bonferroni-adjusted across undecided features when mcAdj).
The loop stops when all features are decided or maxRuns is reached;
undecided features remain Tentative and are KEPT.

Spark plan: the shadow permutation realigns each column against a seeded
random row order (row_number over rand(seed) — a true global permutation);
each run is one MLlib RF fit. The driver orchestrates ≤ maxRuns fits
(SURVEY.md §2.2 #9) with early stopping.
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from recipeselectors_spark.functions import stats
from recipeselectors_spark.operators import _mllib
from recipeselectors_spark.plans.step import FittedStep, SelectionStep


class BorutaStep(SelectionStep):
    step_name = "step_select_boruta"
    prune_mode = "decision"
    maximize = True
    needs_criteria = False  # no top_p/threshold (:55), no tunable

    def __init__(
        self,
        outcome: str,
        terms=None,
        p_value: float = 0.01,
        mc_adj: bool = True,
        max_runs: int = 100,
        trees: int = 100,
        max_depth: int = 7,
        seed: int = 42,
        options: dict | None = None,  # reference-style options list (:55)
        skip: bool = False,
    ) -> None:
        super().__init__(outcome, terms, skip=skip)
        if options:
            p_value = options.get("pValue", p_value)
            mc_adj = options.get("mcAdj", mc_adj)
            max_runs = options.get("maxRuns", max_runs)
        self.p_value = p_value
        self.mc_adj = mc_adj
        self.max_runs = max_runs
        self.trees = trees
        self.max_depth = max_depth
        self.seed = seed

    def _with_shadows(self, df: DataFrame, x_names: list[str], run: int):
        """Append one seeded global permutation of every real column."""
        keyed = df.withColumn(
            "__rid__",
            F.row_number().over(Window.orderBy(F.monotonically_increasing_id())),
        )
        shadows = (
            keyed.select("__rid__", *x_names)
            .withColumn("__r__", F.rand(self.seed * 1000 + run))
            .withColumn("__srid__", F.row_number().over(Window.orderBy("__r__")))
            .select(
                F.col("__srid__").alias("__rid__"),
                *[F.col(c).alias(f"__shadow_{c}") for c in x_names],
            )
        )
        return keyed.join(shadows, "__rid__").drop("__rid__"), [
            f"__shadow_{c}" for c in x_names
        ]

    def _fit_importances(
        self, df: DataFrame, all_feats: list[str], kind: str
    ) -> np.ndarray:
        assembled, _ = _mllib.prepare(df, all_feats, self.outcome)
        cls = RandomForestClassifier if kind == "classification" else RandomForestRegressor
        model = _mllib.fit_estimator(
            cls(numTrees=self.trees, maxDepth=self.max_depth, seed=self.seed)
        , assembled)
        return model.featureImportances.toArray()

    def prep(self, df: DataFrame, roles=None) -> FittedStep:
        from recipeselectors_spark.plans import roles as roles_mod

        if roles is None:
            roles = {
                c: (roles_mod.OUTCOME if c == self.outcome else roles_mod.PREDICTOR)
                for c in df.columns
            }
        x_names = roles_mod.resolve_terms(self.terms, df.schema, roles, self.outcome)
        if not x_names:
            return FittedStep(self.step_name, self.outcome, [], {}, self.skip)

        kind = _mllib.outcome_kind(df, self.outcome)
        clean = df.select(*x_names, self.outcome).dropna().cache()

        hits = {c: 0 for c in x_names}
        decision = {c: "Tentative" for c in x_names}
        imp_history: list[dict[str, float]] = []
        runs = 0
        try:
            while runs < self.max_runs and any(
                d == "Tentative" for d in decision.values()
            ):
                runs += 1
                shadowed, shadow_names = self._with_shadows(clean, x_names, runs)
                imps = self._fit_importances(
                    shadowed, list(x_names) + shadow_names, kind
                )
                real_imp = dict(zip(x_names, imps[: len(x_names)]))
                shadow_max = float(np.max(imps[len(x_names):])) if shadow_names else 0.0
                imp_history.append({**real_imp, "__shadow_max__": shadow_max})
                for c in x_names:
                    if real_imp[c] > shadow_max:
                        hits[c] += 1

                undecided = [c for c, d in decision.items() if d == "Tentative"]
                alpha = self.p_value / (len(undecided) if self.mc_adj and undecided else 1)
                for c in undecided:
                    # too many hits: P(X >= hits) small → Confirmed
                    if stats.binom_sf(hits[c] - 1, runs, 0.5) < alpha / 2:
                        decision[c] = "Confirmed"
                    # too few hits: P(X <= hits) small → Rejected
                    elif stats.binom_cdf(hits[c], runs, 0.5) < alpha / 2:
                        decision[c] = "Rejected"
        finally:
            clean.unpersist()

        exclude = [c for c in x_names if decision[c] == "Rejected"]  # :116
        mean_imp = {
            c: float(np.mean([h[c] for h in imp_history])) if imp_history else float("nan")
            for c in x_names
        }
        return FittedStep(
            self.step_name,
            self.outcome,
            exclude,
            mean_imp,
            self.skip,
            params={"p_value": self.p_value, "runs": runs},
            extras={"decision": decision, "hits": hits},
        )
