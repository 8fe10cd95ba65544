"""The prep/bake (fit/transform) contract: Recipe, SelectionStep, FittedStep."""

from recipeselectors_spark.plans.roles import (  # noqa: F401
    all_numeric,
    all_nominal,
    all_predictors,
    all_outcomes,
    has_role,
    resolve_terms,
)
from recipeselectors_spark.plans.step import FittedStep, SelectionStep  # noqa: F401
from recipeselectors_spark.plans.pipeline import FittedRecipe, Recipe  # noqa: F401
