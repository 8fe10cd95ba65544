"""Driver-side pruning semantics vs /root/reference/R/misc.R (no Spark)."""

import math

import numpy as np
import pytest

from recipeselectors_spark.functions.pruning import (
    check_criteria,
    check_top_p,
    check_zero_one,
    dual_filter,
    rescale_importance,
    select_percentile,
)

NA = float("nan")


def test_check_zero_one():
    assert check_zero_one(0.5) == 0.5
    assert math.isnan(check_zero_one(NA))
    for bad in (0.0, 1.0, -1, 2):
        with pytest.raises(ValueError):
            check_zero_one(bad)
    with pytest.raises(TypeError):
        check_zero_one("x")


def test_check_top_p_clamps():
    assert check_top_p(2, 5) == 2
    assert math.isnan(check_top_p(NA, 5))
    with pytest.warns(UserWarning):
        assert check_top_p(7, 5) == 4  # misc.R:27 clamp to n-1
    with pytest.warns(UserWarning):
        assert check_top_p(5, 5) == 4


def test_check_criteria():
    with pytest.raises(ValueError):
        check_criteria(NA, NA, "step_select_test")
    check_criteria(2, NA, "s")  # ok


SCORES = {"a": 0.9, "b": 0.7, "c": 0.5, "d": 0.3, "e": NA}


def test_dual_filter_or_semantics():
    # top_p=1 keeps a; threshold=0.6 keeps a,b; union keep={a,b}; NA always out
    removed = dual_filter(SCORES, 1, 0.6, maximize=True)
    assert set(removed) == {"c", "d", "e"}
    # top_p only
    assert set(dual_filter(SCORES, 2, NA, True)) == {"c", "d", "e"}
    # threshold only, minimize (p-values)
    pv = {"a": 0.001, "b": 0.2, "c": 0.9}
    assert set(dual_filter(pv, NA, 0.05, maximize=False)) == {"b", "c"}


def test_select_percentile_threshold_overrides_top_p():
    s = {"a": 4.0, "b": 3.0, "c": 2.0, "d": 1.0}
    # threshold .5 => cutoff = type-7 quantile = 2.5 => remove below
    removed = select_percentile(s, 1, 0.5, maximize=True)
    assert set(removed) == {"c", "d"}
    # matches R: quantile(c(4,3,2,1), .5) == 2.5
    assert np.isclose(np.quantile([4.0, 3.0, 2.0, 1.0], 0.5, method="linear"), 2.5)


def test_select_percentile_top_p_and_nan_kept():
    removed = select_percentile(SCORES, 2, NA, maximize=True)
    # NA-scored 'e' is dropped from consideration => KEPT (misc.R:80)
    assert set(removed) == {"c", "d"}
    removed_min = select_percentile(SCORES, 1, NA, maximize=False)
    assert set(removed_min) == {"a", "b", "c"}


def test_rescale():
    out = rescale_importance({"a": 1.0, "b": 3.0, "c": 2.0})
    assert out == {"a": 0.0, "b": 100.0, "c": 50.0}
