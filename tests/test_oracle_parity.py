"""Local replica of the driver's DuckDB-oracle harness.

Runs every ``queries()`` entry on Spark at sf0.001 and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares row count,
column names, and order-insensitive values — catching any mismatch before
the driver's CORRECTNESS gate does (at sf0.01).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")  # unify int32/int64
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


QUERY_NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(entrymod.oracle_sql()[name]).fetchdf())

    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            np.testing.assert_allclose(
                a.to_numpy(), b.to_numpy(), rtol=1e-9, atol=1e-9,
                equal_nan=True, err_msg=f"{name}.{c}",
            )
        else:
            assert a.fillna("__NA__").tolist() == b.fillna("__NA__").tolist(), (
                f"{name}.{c}"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert "conv_id" in df.columns and "ts" in df.columns


def test_rows_only_queries_run(spark):
    """queries() without an oracle entry must still execute and return rows."""
    qs = entrymod.queries()
    missing = set(qs) - set(entrymod.oracle_sql())
    for name in sorted(missing):
        assert qs[name](spark, SF_DIR).count() >= 0, name
