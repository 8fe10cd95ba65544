"""Iceberg round-trip smoke — exercised the moment the environment provides
an Iceberg runtime jar (none exists in this sandbox, so the test SKIPS; the
code path under test is sources/transcripts.py:read_transcripts' table-name
branch, which SURVEY.md §2.4 lists as the 100 TB input format).

Catalog settings (``spark.sql.catalog.*``) are runtime-settable — catalogs
are instantiated lazily on first reference — so the shared session fixture
can be reused; only the SQL-extensions config (MERGE etc.) would need a
fresh JVM, and this smoke intentionally sticks to plain writeTo/read.
"""

from __future__ import annotations

import glob
import os

import pyspark
import pytest

from recipeselectors_spark.sources import transcripts as T


def _iceberg_available() -> bool:
    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(
        glob.glob(os.path.join(jar_dir, "*iceberg*.jar"))
        or os.environ.get("ICEBERG_JAR")
    )


@pytest.mark.skipif(
    not _iceberg_available(),
    reason="no Iceberg runtime jar in this environment (documented in "
    "VERDICT r2 as environmental)",
)
def test_iceberg_transcript_roundtrip(spark, tmp_path):
    spark.conf.set(
        "spark.sql.catalog.smoke", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.smoke.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.smoke.warehouse", str(tmp_path / "warehouse")
    )

    tx = T.synthesize_transcripts_pandas(n_convs=10, seed=7)
    df = spark.createDataFrame(tx)
    df.writeTo("smoke.db.tx").using("iceberg").createOrReplace()

    back = T.read_transcripts(spark, "smoke.db.tx")
    assert back.count() == len(tx)
    got = sorted(map(tuple, back.select("conv_id", "turn_idx").collect()))
    want = sorted(map(tuple, df.select("conv_id", "turn_idx").collect()))
    assert got == want
