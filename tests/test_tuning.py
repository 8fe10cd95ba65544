"""Driver-only re-prune tuning (EP3) + hypothesis property tests for the
pruning kernels vs brute-force re-implementations."""

import math

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from recipeselectors_spark.functions import pruning
from recipeselectors_spark.plans import tuning
from recipeselectors_spark.plans.step import FittedStep

NA = float("nan")


def _fitted(scores):
    return FittedStep("step_select_test", "y", [], scores)


def test_reprune_no_spark():
    f = _fitted({"a": 4.0, "b": 3.0, "c": 2.0, "d": 1.0})
    r1 = tuning.reprune(f, top_p=2)
    assert set(r1.exclude) == {"c", "d"}
    r2 = tuning.reprune(f, threshold=0.5)
    assert set(r2.exclude) == {"c", "d"}
    r3 = tuning.reprune(f, top_p=1, threshold=0.9, prune_mode="dual")
    # dual: keep top-1 OR >= 0.9 absolute
    assert set(r3.exclude) == {"c", "d"} or "a" not in r3.exclude


def test_grid_covers_candidates():
    f = _fitted({"a": 4.0, "b": 3.0, "c": 2.0})
    g = tuning.grid(f, top_p_values=[1, 2], threshold_values=[0.5])
    assert len(g) == 3
    assert g[0]["n_kept"] == 1 and g[1]["n_kept"] == 2


def test_grid_matches_full_reprep(spark):
    """The zero-job grid must agree with actually re-prepping the step."""
    from recipeselectors_spark.operators import InfGainStep
    from tests import fixtures

    pdf = fixtures.iris_like()
    df = spark.createDataFrame(pdf)
    base = InfGainStep("species", top_p=2).prep(df)
    for tp in (1, 2, 3):
        fast = tuning.reprune(base, top_p=tp)
        slow = InfGainStep("species", top_p=tp).prep(df)
        assert sorted(fast.exclude) == sorted(slow.exclude)


# ---- hypothesis properties ------------------------------------------------

scores_strategy = st.dictionaries(
    st.text(alphabet="abcdefghij", min_size=1, max_size=3),
    st.one_of(
        st.floats(min_value=-100, max_value=100, allow_nan=False), st.just(NA)
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=200, deadline=None)
@given(scores=scores_strategy, top_p=st.integers(1, 12))
def test_select_percentile_top_p_property(scores, top_p):
    """Brute force: keep the top_p largest non-NaN scores; NaN always kept."""
    removed = pruning.select_percentile(scores, top_p, NA, maximize=True)
    ok = {k: v for k, v in scores.items() if not math.isnan(v)}
    kept = set(scores) - set(removed)
    # NaN-scored features are never removed
    assert all(k in kept for k, v in scores.items() if math.isnan(v))
    assert len([k for k in kept if k in ok]) == min(top_p, len(ok))
    if removed:
        worst_kept = min(ok[k] for k in kept if k in ok)
        best_removed = max(ok[k] for k in removed)
        assert best_removed <= worst_kept


@settings(max_examples=200, deadline=None)
@given(
    scores=scores_strategy,
    threshold=st.floats(min_value=0.01, max_value=0.99),
)
def test_select_percentile_threshold_property(scores, threshold):
    removed = pruning.select_percentile(scores, NA, threshold, maximize=True)
    ok = {k: v for k, v in scores.items() if not math.isnan(v)}
    if not ok:
        assert removed == []
        return
    cutoff = float(np.quantile(list(ok.values()), threshold, method="linear"))
    assert set(removed) == {k for k, v in ok.items() if v < cutoff}


@settings(max_examples=200, deadline=None)
@given(
    scores=scores_strategy,
    top_p=st.one_of(st.just(NA), st.integers(1, 12)),
    threshold=st.one_of(st.just(NA), st.floats(-50, 50)),
)
def test_dual_filter_property(scores, top_p, threshold):
    if (isinstance(top_p, float) and math.isnan(top_p)) and (
        isinstance(threshold, float) and math.isnan(threshold)
    ):
        return
    ok = {k: v for k, v in scores.items() if not math.isnan(v)}
    # ties at the top_p boundary make "which tied feature survives"
    # implementation-defined (R sorts unstably too) — restrict to unique
    assume(len(set(ok.values())) == len(ok))
    removed = pruning.dual_filter(scores, top_p, threshold, maximize=True)
    na = [k for k, v in scores.items() if math.isnan(v)]
    # NaN always removed (misc.R:73)
    assert all(k in removed for k in na)
    kept = set(ok) - set(removed)
    ranked = sorted(ok, key=lambda k: -ok[k])
    has_top = not (isinstance(top_p, float) and math.isnan(top_p))
    has_thr = not (isinstance(threshold, float) and math.isnan(threshold))
    top_set = set(ranked[: int(top_p)]) if has_top else set()
    for k in ok:
        in_top = has_top and k in top_set
        passes_thr = has_thr and ok[k] >= threshold
        assert (k in kept) == (in_top or passes_thr)


def test_xtab_tunable_log10_threshold():
    """step_select_xtab.R:206-217: threshold tunes over (-10,-1) on the
    log10 scale — candidates are 10^x, not a linear (0,1) grid."""
    from recipeselectors_spark.operators.select_xtab import XtabStep
    from recipeselectors_spark.plans import tuning

    spec = XtabStep("y", top_p=2).tunable()["threshold"]
    assert spec["range"] == (-10.0, -1.0)
    assert spec["trans"] == "log10"
    cands = tuning.expand_candidates(spec, n=4)
    assert cands[0] == 10.0 ** -10 and cands[-1] == 10.0 ** -1
    assert all(0 < c <= 0.1 for c in cands)


def test_expand_candidates_int_space():
    from recipeselectors_spark.plans import tuning

    assert tuning.expand_candidates(
        {"type": "int", "range": (1, 4)}, n=4
    ) == [1, 2, 3, 4]
