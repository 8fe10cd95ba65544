"""Partition-local seeded permutation: exact-marginal preservation,
determinism, association broken, and — the round-1 scale fix — NO
single-partition stage or global sort anywhere in the plan."""

import numpy as np
import pandas as pd
import pytest

from recipeselectors_spark.operators import _permute


@pytest.fixture(scope="module")
def df(spark):
    rng = np.random.default_rng(7)
    n = 4000
    signal = rng.normal(size=n)
    pdf = pd.DataFrame(
        {
            "x1": signal + rng.normal(scale=0.1, size=n),
            "x2": rng.normal(size=n),
            "y": (signal > 0).astype(int),
        }
    )
    # adversarial layout: globally sorted by outcome — a naive partition-
    # local permutation on the raw layout would preserve label clustering
    pdf = pdf.sort_values("y").reset_index(drop=True)
    return spark.createDataFrame(pdf).repartition(8).cache()


def _plan(d):
    return d._jdf.queryExecution().executedPlan().toString()


def test_no_single_partition_stage(df):
    shadowed, names = _permute.with_permuted(df, ["x1", "x2"], seed=1)
    plan = _plan(shadowed)
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    assert "Sort" not in plan  # no global (or any) sort
    assert "Join" not in plan  # no rid-realignment join

    replaced = _permute.permute_columns(df, ["x1"], seed=1)
    plan2 = _plan(replaced)
    assert "SinglePartition" not in plan2
    assert "Window" not in plan2


def test_marginal_preserved_exactly(df):
    shadowed, names = _permute.with_permuted(df, ["x1"], seed=3)
    pdf = shadowed.toPandas()
    # the shadow is a permutation: identical multiset of values
    assert sorted(pdf["x1"].tolist()) == sorted(pdf["__shadow_x1"].tolist())


def test_deterministic(df):
    a = _permute.permute_columns(df, ["x1"], seed=9).toPandas()
    b = _permute.permute_columns(df, ["x1"], seed=9).toPandas()
    assert (a["x1"].to_numpy() == b["x1"].to_numpy()).all()


def test_association_broken_even_when_sorted_by_label(df):
    """x1 predicts y (|corr| large); its shadow must not (|corr| ~ 0),
    even though the source frame arrived globally sorted by y."""
    shadowed, _ = _permute.with_permuted(df, ["x1"], seed=5)
    pdf = shadowed.toPandas()
    real = abs(np.corrcoef(pdf["x1"], pdf["y"])[0, 1])
    shadow = abs(np.corrcoef(pdf["__shadow_x1"], pdf["y"])[0, 1])
    assert real > 0.5
    assert shadow < 0.1


# ---------------------------------------------------------------------------
# content-deterministic rotation (_permute.rotate_columns)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iddf(spark):
    rng = np.random.default_rng(11)
    n = 3000
    signal = rng.normal(size=n)
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "x1": signal + rng.normal(scale=0.1, size=n),
            "x2": rng.normal(size=n),
            "y": (signal > 0).astype(int),
        }
    ).sort_values("y").reset_index(drop=True)
    return spark.createDataFrame(pdf).repartition(8).cache()


def test_rotation_is_permutation(iddf):
    rot = _permute.rotate_columns(iddf, ["x1"], ["rid"], seed=3).toPandas()
    src = iddf.toPandas()
    assert sorted(rot["x1"].tolist()) == sorted(src["x1"].tolist())
    # y and x2 untouched, row identity preserved
    merged = rot.set_index("rid").join(src.set_index("rid"), rsuffix="_s")
    assert (merged["y"] == merged["y_s"]).all()
    assert (merged["x2"] == merged["x2_s"]).all()


def test_rotation_layout_invariant(iddf):
    """The defining property vs the partition-local shuffle: the SAME
    content gives the SAME permutation regardless of physical layout or
    parallelism."""
    a = (
        _permute.rotate_columns(iddf, ["x1"], ["rid"], seed=3)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    b = (
        _permute.rotate_columns(iddf.repartition(3), ["x1"], ["rid"], seed=3)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    c = (
        _permute.rotate_columns(iddf.coalesce(1), ["x1"], ["rid"], seed=3)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    assert (a["x1"].to_numpy() == b["x1"].to_numpy()).all()
    assert (a["x1"].to_numpy() == c["x1"].to_numpy()).all()


def test_rotation_seed_changes_permutation(iddf):
    a = _permute.rotate_columns(iddf, ["x1"], ["rid"], seed=3).toPandas()
    b = _permute.rotate_columns(iddf, ["x1"], ["rid"], seed=4).toPandas()
    am = a.set_index("rid")["x1"]
    bm = b.set_index("rid")["x1"]
    assert (am != bm.reindex(am.index)).any()


def test_rotation_breaks_association(iddf):
    rot = _permute.rotate_columns(iddf, ["x1"], ["rid"], seed=5, bucket_chars=2).toPandas()
    real = abs(np.corrcoef(iddf.toPandas()["x1"], iddf.toPandas()["y"])[0, 1])
    rotted = abs(np.corrcoef(rot["x1"], rot["y"])[0, 1])
    assert real > 0.5
    assert rotted < 0.1


def test_rotation_no_global_sort(iddf):
    """Scale guard: the window partitions on the hash bucket — the plan
    must never collapse to a single partition."""
    rot = _permute.rotate_columns(iddf, ["x1"], ["rid"], seed=3)
    plan = _plan(rot)
    assert "SinglePartition" not in plan


def test_rotation_preserves_nulls(spark):
    """A NULL value is part of the multiset and must survive rotation as a
    value, not be swallowed by a wraparound coalesce."""
    pdf = pd.DataFrame(
        {"rid": list(range(9)), "x": [1.0, None, 3.0, 4.0, None, 6.0, 7.0, 8.0, 9.0]}
    )
    df = spark.createDataFrame(pdf)
    rot = _permute.rotate_columns(df, ["x"], ["rid"], seed=1, bucket_chars=1)
    got = rot.toPandas()["x"]
    assert got.isna().sum() == 2
    assert sorted(got.dropna().tolist()) == [1.0, 3.0, 4.0, 6.0, 7.0, 8.0, 9.0]
