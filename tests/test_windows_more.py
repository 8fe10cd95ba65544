"""Window-operator API coverage: lag/lead helper, time-range rolling,
per-group top-k, GBT importances through the registry, VIP regression."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipeselectors_spark.operators import windows as W
from recipeselectors_spark.sources import transcripts as T


@pytest.fixture(scope="module")
def tx(spark):
    return spark.createDataFrame(
        T.synthesize_transcripts_pandas(n_convs=10, seed=17),
        schema=T.TRANSCRIPT_SCHEMA,
    ).withColumn("text_len", F.length("text").cast("double")).cache()


def test_with_lag_lead_multi_k(tx):
    out = (
        W.with_lag_lead(tx, "text_len", ks=(1, 2))
        .where("conv_id = 'conv-000003'")
        .orderBy("ts", "turn_idx")
        .toPandas()
    )
    vals = out["text_len"].tolist()
    assert out["text_len_lag1"].tolist()[1:] == vals[:-1]
    assert out["text_len_lead1"].tolist()[:-1] == vals[1:]
    assert out["text_len_lag2"].tolist()[2:] == vals[:-2]


def test_with_rolling_time(tx):
    out = (
        W.with_rolling_time(tx, "text_len", seconds=120, agg="count")
        .where("conv_id = 'conv-000003'")
        .orderBy("ts", "turn_idx")
        .toPandas()
    )
    # oracle: pandas time-window count
    sec = out["ts"].values.astype("datetime64[s]").astype("int64")
    want = [
        int(((sec >= s - 120) & (sec <= s)).sum()) for s in sec
    ]
    assert out["text_len_roll120s_count"].tolist() == want


def test_top_k_per_group(tx):
    out = W.top_k_per_group(tx, k=2, order_col="text_len").toPandas()
    assert (out.groupby("conv_id").size() <= 2).all()
    # each kept row is among that conversation's top-2 lengths
    full = tx.toPandas()
    for conv, g in out.groupby("conv_id"):
        top2 = full[full["conv_id"] == conv]["text"].str.len().nlargest(2).tolist()
        assert sorted(g["text_len"], reverse=True) == sorted(
            [float(v) for v in top2], reverse=True
        )


def test_gbt_importances_via_vip(spark):
    from pyspark.ml.classification import GBTClassifier

    from recipeselectors_spark.operators import VipStep
    from tests import fixtures

    df = spark.createDataFrame(fixtures.cells_like(n=400))
    sub = ["x01", "x02", "x10", "x11"]
    fitted = VipStep(
        "class", model=GBTClassifier(maxIter=5, maxDepth=3, seed=3),
        terms=sub, top_p=2,
    ).prep(df)
    assert len(fitted.bake(df.select(*sub, "class")).columns) == 3
    # tree-family default: rescaled 0..100 (pull_importances.R:71-151)
    assert max(fitted.scores.values()) == 100.0


def test_vip_regression_mode(spark):
    from pyspark.ml.regression import GBTRegressor

    from recipeselectors_spark.operators import VipStep
    from tests import fixtures

    df = spark.createDataFrame(fixtures.carprices_like(n=300))
    fitted = VipStep(
        "price", model=GBTRegressor(maxIter=5, maxDepth=3, seed=3), top_p=3
    ).prep(df)
    assert len(fitted.exclude) == 7
