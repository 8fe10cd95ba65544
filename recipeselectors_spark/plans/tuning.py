"""Hyperparameter tuning over prune criteria — the EP3 optimization.

The reference re-runs the full scoring kernel for every (top_p, threshold)
candidate because praznik/FSelectorRcpp are re-invoked on each prep
(SURVEY.md §3 EP3). Here scores are independent of the prune criteria for
every ``select_percentile``/``dual_filter`` step, so tuning those params is
a **driver-only re-prune over the cached scores dict — zero extra Spark
jobs**. ``tunable()`` on each step declares the search space
(step_select_infgain.R:217-228 analogue; ranges finalized against the data
dimensionality like dials::get_p, parameters.R:19-28).
"""

from __future__ import annotations

import math
from typing import Any, Iterable

from recipeselectors_spark.functions import pruning
from recipeselectors_spark.plans.step import FittedStep


def reprune(
    fitted: FittedStep,
    top_p=float("nan"),
    threshold=float("nan"),
    prune_mode: str = "percentile",
    maximize: bool = True,
) -> FittedStep:
    """New FittedStep with the same scores but a different prune decision.
    Pure driver-side; no Spark job."""
    pruning.check_criteria(top_p, threshold, fitted.step_name)
    threshold = pruning.check_zero_one(threshold)
    if not (isinstance(top_p, float) and math.isnan(top_p)):
        top_p = pruning.check_top_p(top_p, len(fitted.scores))
    if prune_mode == "percentile":
        exclude = pruning.select_percentile(
            fitted.scores, top_p, threshold, maximize
        )
    elif prune_mode == "dual":
        exclude = pruning.dual_filter(fitted.scores, top_p, threshold, maximize)
    else:
        raise ValueError(prune_mode)
    return FittedStep(
        fitted.step_name,
        fitted.outcome,
        exclude,
        dict(fitted.scores),
        fitted.skip,
        params={
            "top_p": None if (isinstance(top_p, float) and math.isnan(top_p)) else top_p,
            "threshold": threshold if not (isinstance(threshold, float) and math.isnan(threshold)) else None,
        },
    )


def grid(
    fitted: FittedStep,
    top_p_values: Iterable[int] = (),
    threshold_values: Iterable[float] = (),
    prune_mode: str = "percentile",
    maximize: bool = True,
) -> list[dict[str, Any]]:
    """Evaluate every candidate prune criterion against the cached scores.
    Returns [{top_p, threshold, exclude, n_kept}] — the tune-grid loop that
    costs the reference one kernel invocation per cell costs us nothing."""
    out: list[dict[str, Any]] = []
    NA = float("nan")
    candidates = [(tp, NA) for tp in top_p_values] + [
        (NA, th) for th in threshold_values
    ]
    for tp, th in candidates:
        f = reprune(fitted, tp, th, prune_mode, maximize)
        out.append(
            {
                "top_p": None if (isinstance(tp, float) and math.isnan(tp)) else tp,
                "threshold": None if (isinstance(th, float) and math.isnan(th)) else th,
                "exclude": f.exclude,
                "n_kept": len(f.scores) - len(f.exclude),
            }
        )
    return out


def expand_candidates(spec: dict[str, Any], n: int = 5) -> list[float]:
    """Regular grid of ``n`` candidates from one tunable() param spec,
    honoring the declared transform: a ``trans: log10`` space (e.g.
    step_select_xtab's threshold, range (-10,-1) per
    step_select_xtab.R:206-217) yields 10^x candidates; untransformed
    spaces yield the raw grid. Int spaces round."""
    lo, hi = spec["range"]
    if n == 1:
        xs = [lo]
    else:
        xs = [lo + (hi - lo) * i / (n - 1) for i in range(n)]
    if spec.get("trans") == "log10":
        xs = [10.0 ** x for x in xs]
    if spec.get("type") == "int":
        xs = sorted({int(round(x)) for x in xs})
    return xs


def finalize_top_p_range(n_predictors: int) -> tuple[int, int]:
    """parameters.R:19-28 — default [1,4], finalized by data dimensionality."""
    return (1, max(1, min(4, n_predictors) if n_predictors < 4 else n_predictors))
