"""pull_importances — one registry for extracting (feature, importance).

Reference: /root/reference/R/pull_importances.R (generic :33-51; 13 engine
methods :52-302). MLlib collapses the engine zoo into two families:

* tree family (DecisionTree / RandomForest / GBT) → ``featureImportances``
  (Gini/variance gain), rescaled to 0..100 by default like the reference's
  tree/forest/xgb methods (:71-151, rescale rule :57-58);
* linear family (LinearRegression / LogisticRegression incl. elastic net) →
  ``coefficients`` with the intercept dropped (:190-191), NOT rescaled by
  default, matching the lm/glm/elnet methods (:179-275).

Users can register extractors for their own model classes — the reference's
user-extensible S3 method surface reborn (README.md:98-117).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from recipeselectors_spark.functions.pruning import rescale_importance

Extractor = Callable[[Any, list[str]], dict[str, float]]

_REGISTRY: list[tuple[type | str, Extractor, bool]] = []


def register_extractor(
    model_cls: type | str, fn: Extractor, scaled_default: bool = True
) -> None:
    _REGISTRY.append((model_cls, fn, scaled_default))


def _tree_extract(model: Any, names: list[str]) -> dict[str, float]:
    imps = model.featureImportances.toArray()
    return {n: float(v) for n, v in zip(names, imps)}


def _linear_extract(model: Any, names: list[str]) -> dict[str, float]:
    coefs = np.asarray(model.coefficients.toArray() if hasattr(model, "coefficients") else [])
    if coefs.ndim > 1:  # multinomial — not supported by the reference either
        coefs = np.abs(coefs).sum(axis=0)
    return {n: float(v) for n, v in zip(names, coefs)}


def pull_importances(
    model: Any, feature_names: list[str], scaled: bool | None = None
) -> dict[str, float]:
    """Extract per-feature importances from a fitted MLlib model."""
    for cls, fn, scaled_default in _REGISTRY:
        matched = (
            isinstance(cls, str) and type(model).__name__ == cls
        ) or (not isinstance(cls, str) and isinstance(model, cls))
        if matched:
            out = fn(model, feature_names)
            return rescale_importance(out) if (scaled if scaled is not None else scaled_default) else out

    if hasattr(model, "featureImportances"):
        out = _tree_extract(model, feature_names)
        use_scaled = True if scaled is None else scaled  # :71-151 default TRUE
    elif hasattr(model, "coefficients"):
        out = _linear_extract(model, feature_names)
        use_scaled = False if scaled is None else scaled  # :179-275 default FALSE
    else:
        raise TypeError(
            f"no importance extractor for {type(model).__name__}; "
            "register one with register_extractor()"
        )
    return rescale_importance(out) if use_scaled else out
