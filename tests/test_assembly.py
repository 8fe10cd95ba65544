"""Feature-assembly layer vs the pandas oracle (FIXTURES.md F1 assertions)."""

import numpy as np
import pandas as pd
import pytest

from recipeselectors_spark.operators import assembly, windows as W
from recipeselectors_spark.sources import transcripts as T
from tests import oracles


@pytest.fixture(scope="module")
def tx_pdf():
    return T.synthesize_transcripts_pandas(n_convs=40, seed=7, duplicate_frac=0.02)


@pytest.fixture(scope="module")
def tx_df(spark, tx_pdf):
    return spark.createDataFrame(tx_pdf, schema=T.TRANSCRIPT_SCHEMA).cache()


KEY = ["conv_id", "turn_idx"]


def _aligned(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    a = spark_pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    b = oracle_pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b)
    return a, b


def test_feature_matrix_allclose(tx_df, tx_pdf):
    got = assembly.assemble_features(tx_df).toPandas()
    want = oracles.assemble_features(tx_pdf)
    a, b = _aligned(got, want)
    for col in assembly.FEATURE_COLS:
        np.testing.assert_allclose(
            a[col].to_numpy(dtype=float),
            b[col].to_numpy(dtype=float),
            err_msg=col,
            equal_nan=True,
        )


def test_per_turn_text_equality(tx_df, tx_pdf):
    """input_hint invariant: per-turn text equality under stable ordering."""
    got = (
        W.dedup_turns(tx_df)
        .orderBy("conv_id", "ts", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = oracles.sort_transcripts(oracles.dedup_turns(tx_pdf))[
        ["conv_id", "turn_idx", "text"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_single_turn_conversation(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["hello"],
            "tool": [None],
            "ts": [pd.Timestamp("2026-01-01")],
        }
    )
    df = spark.createDataFrame(pdf, schema=T.TRANSCRIPT_SCHEMA)
    out = assembly.assemble_features(df).toPandas()
    assert len(out) == 1
    assert np.isnan(out["f_lag1_len"].iloc[0])
    assert out["f_sess_turn"].iloc[0] == 0.0


def test_identical_ts_stable_order(spark):
    ts = pd.Timestamp("2026-01-01 10:00:00")
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": [2, 0, 1],
            "role": ["user"] * 3,
            "text": ["cc", "a", "bb"],
            "tool": [None] * 3,
            "ts": [ts, ts, ts],
        }
    )
    df = spark.createDataFrame(pdf, schema=T.TRANSCRIPT_SCHEMA)
    out = (
        assembly.assemble_features(df)
        .orderBy("turn_idx")
        .toPandas()
    )
    # stable ordering falls back to turn_idx: lag of turn 1 is turn 0's len
    assert out["f_lag1_len"].tolist()[1] == 1.0
    assert out["f_lag1_len"].tolist()[2] == 2.0


def test_windows_ffill_bfill(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["user"] * 4,
            "text": ["a"] * 4,
            "tool": [None, "search", None, None],
            "ts": pd.date_range("2026-01-01", periods=4, freq="min"),
        }
    )
    df = spark.createDataFrame(pdf, schema=T.TRANSCRIPT_SCHEMA)
    out = (
        W.with_bfill(W.with_ffill(df, "tool"), "tool")
        .orderBy("turn_idx")
        .toPandas()
    )
    assert out["tool_ffill"].tolist() == [None, "search", "search", "search"]
    assert out["tool_bfill"].tolist() == ["search", "search", None, None]


def test_sessionize_gap(spark):
    base = pd.Timestamp("2026-01-01")
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["user"] * 4,
            "text": ["a"] * 4,
            "tool": [None] * 4,
            "ts": [
                base,
                base + pd.Timedelta(seconds=60),
                base + pd.Timedelta(seconds=60 + 4000),  # > gap => new session
                base + pd.Timedelta(seconds=60 + 4060),
            ],
        }
    )
    df = spark.createDataFrame(pdf, schema=T.TRANSCRIPT_SCHEMA)
    out = W.with_session_id(df, gap_seconds=1800).orderBy("turn_idx").toPandas()
    assert out["session_id"].tolist() == [0, 0, 1, 1]


def test_conversation_rollup(tx_df, tx_pdf):
    got = W.conversation_rollup(tx_df).toPandas().set_index("conv_id").sort_index()
    pdf = tx_pdf
    want_n = pdf.groupby("conv_id").size()
    assert (got["n_turns"].sort_index() == want_n.sort_index()).all()
