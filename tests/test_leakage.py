"""Zero-temporal-leakage contract (north rule).

Two properties:

1. *Feature causality*: a feature value at (conv_id, ts) never changes when
   any strictly-future row of the transcript is mutated.
2. *Fit/transform isolation*: a fitted selection step applied to new data
   recomputes nothing — mutating the new data's values changes the baked
   columns' *content* but never the column *set*, and mutating the training
   data after prep changes nothing at all.
"""

import numpy as np
import pandas as pd
import pytest

from recipeselectors_spark.operators import assembly
from recipeselectors_spark.operators.select_roc import RocStep
from recipeselectors_spark.sources import transcripts as T
from tests import fixtures


@pytest.fixture(scope="module")
def tx_pdf():
    return T.synthesize_transcripts_pandas(n_convs=20, seed=13)


def test_features_do_not_depend_on_future_rows(spark, tx_pdf):
    cutoff = tx_pdf["ts"].quantile(0.6)
    base = spark.createDataFrame(tx_pdf, schema=T.TRANSCRIPT_SCHEMA)

    mutated_pdf = tx_pdf.copy()
    future = mutated_pdf["ts"] > cutoff
    mutated_pdf.loc[future, "text"] = "LEAKED " * 10
    mutated_pdf.loc[future, "tool"] = "leak_tool"
    mutated = spark.createDataFrame(mutated_pdf, schema=T.TRANSCRIPT_SCHEMA)

    key = ["conv_id", "turn_idx"]
    a = (
        assembly.assemble_features(base)
        .where(f"ts <= timestamp'{cutoff}'")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        assembly.assemble_features(mutated)
        .where(f"ts <= timestamp'{cutoff}'")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    for col in assembly.FEATURE_COLS:
        np.testing.assert_allclose(
            a[col].to_numpy(float), b[col].to_numpy(float),
            err_msg=col, equal_nan=True,
        )


def test_fitted_step_never_recomputes(spark):
    pdf = fixtures.cells_like(n=400)
    train = spark.createDataFrame(pdf)
    fitted = RocStep("class", top_p=2).prep(train)
    scores_before = dict(fitted.scores)

    # wildly different "new data": same schema, shuffled values
    new_pdf = pdf.copy()
    new_pdf[fixtures.CELLS_X] = -5.0 * new_pdf[fixtures.CELLS_X].values[::-1]
    new = spark.createDataFrame(new_pdf)

    baked_train_cols = set(fitted.bake(train).columns)
    baked_new_cols = set(fitted.bake(new).columns)
    assert baked_train_cols == baked_new_cols  # decision is frozen
    assert fitted.scores == scores_before  # no state mutation
