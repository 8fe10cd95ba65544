"""Distributed operators: selection steps + point-in-time assembly layer."""

from recipeselectors_spark.operators.select_infgain import InfGainStep  # noqa: F401
from recipeselectors_spark.operators.select_roc import RocStep  # noqa: F401
from recipeselectors_spark.operators.select_xtab import XtabStep  # noqa: F401
from recipeselectors_spark.operators.select_mrmr import MrmrStep  # noqa: F401
from recipeselectors_spark.operators.select_carscore import CarScoreStep  # noqa: F401
from recipeselectors_spark.operators.select_linear import LinearStep  # noqa: F401
from recipeselectors_spark.operators.select_tree import TreeStep  # noqa: F401
from recipeselectors_spark.operators.select_forests import ForestsStep  # noqa: F401
from recipeselectors_spark.operators.select_vip import VipStep  # noqa: F401
from recipeselectors_spark.operators.select_boruta import BorutaStep  # noqa: F401
from recipeselectors_spark.operators.select_custom import CustomScoreStep  # noqa: F401
