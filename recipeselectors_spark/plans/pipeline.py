"""Recipe / FittedRecipe — ordered step lists with prep/bake/juice.

Mirrors the recipes accumulation contract (``add_step``,
/root/reference/R/step_select_infgain.R:83-99): ``prep`` runs steps in order,
each seeing the training data *as transformed by all prior steps*
(evidenced by /root/reference/tests/testthat/test_step_select_linear.R:13-17);
``bake`` applies only stored decisions. ``juice`` = bake on the training set.

Steps may be SelectionSteps (prep/bake) or plain transform steps exposing
``transform(df) -> df`` (e.g. normalize, feature assembly) — those are
stateless pass-throughs at bake unless they implement prep themselves.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

from recipeselectors_spark.plans.step import FittedStep, SelectionStep


class NormalizeStep:
    """z-score normalization of the given columns — a minimal analogue of
    recipes::step_normalize, needed because the linear step's reference test
    normalizes first (test_step_select_linear.R:13). Fit state = per-column
    mean/std from training (leakage-safe)."""

    step_name = "step_normalize"

    def __init__(self, cols: list[str] | None = None):
        self.cols = cols

    def prep(self, df: DataFrame, roles=None) -> "FittedNormalize":
        from pyspark.sql import functions as F
        from pyspark.sql.types import NumericType

        cols = self.cols or [
            f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
        ]
        aggs = []
        for c in cols:
            aggs += [F.avg(c).alias(f"{c}__mu"), F.stddev_samp(c).alias(f"{c}__sd")]
        row = df.agg(*aggs).collect()[0].asDict()
        stats = {
            c: (row[f"{c}__mu"], row[f"{c}__sd"] or 1.0) for c in cols
        }
        return FittedNormalize(stats)


class FittedNormalize:
    step_name = "step_normalize"
    exclude: list[str] = []

    def __init__(self, stats: dict[str, tuple[float, float]]):
        self.stats = stats

    def bake(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        for c, (mu, sd) in self.stats.items():
            if c in df.columns:
                df = df.withColumn(c, (F.col(c) - F.lit(mu)) / F.lit(sd if sd else 1.0))
        return df


class Recipe:
    """An untrained ordered list of steps bound to a roles map."""

    def __init__(self, roles: dict[str, str] | None = None):
        self.roles = roles
        self.steps: list[Any] = []

    def add(self, step: Any) -> "Recipe":
        self.steps.append(step)
        return self

    def prep(self, training: DataFrame) -> "FittedRecipe":
        fitted: list[Any] = []
        current = training
        for step in self.steps:
            if hasattr(step, "prep"):
                f = step.prep(current, self.roles)
            elif hasattr(step, "transform"):
                f = _TransformAdapter(step)
            else:
                raise TypeError(f"step {step!r} has neither prep nor transform")
            fitted.append(f)
            current = f.bake(current)
        return FittedRecipe(fitted, training=current)


class _TransformAdapter:
    """Wraps a stateless transform as a fitted step."""

    step_name = "transform"
    exclude: list[str] = []

    def __init__(self, step: Any):
        self.step = step

    def bake(self, df: DataFrame) -> DataFrame:
        return self.step.transform(df)


class FittedRecipe:
    def __init__(self, steps: list[Any], training: DataFrame | None = None):
        self.steps = steps
        self._training = training

    def bake(self, new_data: DataFrame) -> DataFrame:
        """Apply stored decisions only. Steps fitted with ``skip=True`` are
        applied during prep but skipped at bake (step_select_infgain.R:36-40)."""
        df = new_data
        for f in self.steps:
            if getattr(f, "skip", False):
                continue
            df = f.bake(df)
        return df

    def juice(self) -> DataFrame:
        """The retained training data (bake on train, skip honored during
        prep already) — test_step_select_infgain.R:24."""
        if self._training is None:
            raise ValueError("recipe was not prepped with retain")
        return self._training

    @property
    def exclude(self) -> list[str]:
        out: list[str] = []
        for f in self.steps:
            for c in getattr(f, "exclude", []):
                if c not in out:
                    out.append(c)
        return out

    def tidy(self) -> list[dict[str, Any]]:
        return [
            {"step": f.step_name, "excluded": list(getattr(f, "exclude", []))}
            for f in self.steps
        ]

    def to_json(self) -> str:
        parts = []
        for f in self.steps:
            if isinstance(f, FittedStep):
                parts.append({"kind": "selection", "data": json.loads(f.to_json())})
            elif isinstance(f, FittedNormalize):
                parts.append({"kind": "normalize", "data": f.stats})
            else:
                raise TypeError(f"cannot serialize fitted step {f!r}")
        return json.dumps(parts)

    @classmethod
    def from_json(cls, s: str) -> "FittedRecipe":
        steps: list[Any] = []
        for part in json.loads(s):
            if part["kind"] == "selection":
                steps.append(FittedStep.from_json(json.dumps(part["data"])))
            elif part["kind"] == "normalize":
                steps.append(
                    FittedNormalize({k: tuple(v) for k, v in part["data"].items()})
                )
        return cls(steps)


__all__ = ["Recipe", "FittedRecipe", "NormalizeStep", "SelectionStep"]
