"""SelectionStep / FittedStep — the prep/bake contract.

Mirrors the reference's step lifecycle (/root/reference/R/step_select_infgain.R):

* an untrained step holds a terms selector, the outcome name, and prune
  hyperparameters (``top_p`` / ``threshold``), validated eagerly
  (misc.R:36-46 fail-fast);
* ``prep(df, roles)`` resolves selectors against the schema, computes a
  per-feature ``{variable: score}`` via a distributed scoring pass, prunes on
  the driver, and returns a ``FittedStep`` holding only ``exclude`` +
  ``scores`` (step_select_infgain.R:165-178);
* ``FittedStep.bake(df)`` drops the excluded columns — a pure Catalyst
  projection, no recomputation on new data, hence zero leakage by
  construction (step_select_infgain.R:182-187).

FittedStep is JSON-serializable for checkpoint/resume.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from recipeselectors_spark.functions import pruning
from recipeselectors_spark.plans import roles as roles_mod

NA = float("nan")


def _is_na(x) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


@dataclass
class FittedStep:
    """Trained state: the pruning decision plus the evidence behind it."""

    step_name: str
    outcome: str
    exclude: list[str]
    scores: dict[str, float]
    skip: bool = False
    params: dict[str, Any] = field(default_factory=dict)
    extras: dict[str, Any] = field(default_factory=dict)

    def bake(self, df: DataFrame) -> DataFrame:
        """Drop excluded columns (step_select_infgain.R:182-187). Columns not
        present are ignored, matching R's ``%in%`` mask semantics."""
        present = [c for c in self.exclude if c in df.columns]
        return df.drop(*present) if present else df

    def tidy(self) -> list[dict[str, Any]]:
        """step_select_infgain.R:205-214 — the excluded terms."""
        return [{"terms": t} for t in self.exclude]

    def __repr__(self) -> str:  # print analogue, step_select_infgain.R:190-200
        return f"<{self.step_name} trained ({len(self.exclude)} excluded)>"

    def to_json(self) -> str:
        payload = {
            "step_name": self.step_name,
            "outcome": self.outcome,
            "exclude": self.exclude,
            "scores": {
                k: (None if _is_na(v) else v) for k, v in self.scores.items()
            },
            "skip": self.skip,
            "params": self.params,
        }
        return json.dumps(payload, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "FittedStep":
        d = json.loads(s)
        d["scores"] = {
            k: (NA if v is None else float(v)) for k, v in d["scores"].items()
        }
        return cls(**d)


class SelectionStep:
    """Base class for the ten selection steps.

    Subclasses implement ``score(df, x_names) -> dict[str, float]`` (the
    distributed pass) and declare ``prune_mode`` ('percentile' | 'dual' |
    'decision') and ``maximize``. The prune itself is driver-side
    (functions/pruning.py).
    """

    step_name = "step_select_base"
    prune_mode = "percentile"
    maximize = True
    #: require both criteria check (boruta sets False — decision-based)
    needs_criteria = True

    def __init__(
        self,
        outcome: str,
        terms=None,
        top_p=NA,
        threshold=NA,
        skip: bool = False,
        **kwargs: Any,
    ) -> None:
        self.outcome = outcome
        self.terms = terms
        self.threshold = pruning.check_zero_one(threshold)
        self.top_p = top_p  # clamped at prep time once p is known (misc.R:16)
        self.skip = skip
        self.options = kwargs
        if self.needs_criteria:
            pruning.check_criteria(self.top_p, self.threshold, self.step_name)

    # -- subclass surface ---------------------------------------------------
    def score(self, df: DataFrame, x_names: list[str]) -> dict[str, float]:
        raise NotImplementedError

    def check_types(self, df: DataFrame, x_names: list[str]) -> None:
        """Subclasses enforce numeric/nominal requirements (recipes check_type)."""

    def extra_exclude(
        self, scores: dict[str, float], x_names: list[str]
    ) -> list[str]:
        """Hook: e.g. linear force-excludes NaN-coef features
        (step_select_linear.R:188-189)."""
        return []

    def tunable(self) -> dict[str, Any]:
        """step_select_infgain.R:217-228 — hyperparameter search spaces."""
        return {
            "top_p": {"type": "int", "range": (1, 4), "finalize": "data_dim"},
            "threshold": {"type": "double", "range": (0.0, 1.0)},
        }

    # -- lifecycle ----------------------------------------------------------
    def prep(self, df: DataFrame, roles: dict[str, str] | None = None) -> FittedStep:
        if roles is None:
            roles = {
                c: (roles_mod.OUTCOME if c == self.outcome else roles_mod.PREDICTOR)
                for c in df.columns
            }
        x_names = roles_mod.resolve_terms(
            self.terms, df.schema, roles, self.outcome
        )
        if not x_names:
            # empty selection => pass-through (step_select_infgain.R:161-163)
            return FittedStep(self.step_name, self.outcome, [], {}, self.skip)
        self.check_types(df, x_names)

        top_p = self.top_p
        if self.prune_mode != "decision":
            top_p = pruning.check_top_p(top_p, len(x_names))

        scores = self.score(df, x_names)

        if self.prune_mode == "percentile":
            exclude = pruning.select_percentile(
                scores, top_p, self.threshold, self.maximize
            )
        elif self.prune_mode == "dual":
            exclude = pruning.dual_filter(
                scores, top_p, self.threshold, self.maximize
            )
        elif self.prune_mode == "decision":
            exclude = [k for k, v in scores.items() if v is not None and v < 0]
        else:
            raise ValueError(self.prune_mode)

        for name in self.extra_exclude(scores, x_names):
            if name not in exclude:
                exclude.append(name)

        return FittedStep(
            self.step_name,
            self.outcome,
            exclude,
            scores,
            self.skip,
            params={"top_p": None if _is_na(top_p) else top_p,
                    "threshold": None if _is_na(self.threshold) else self.threshold},
        )
