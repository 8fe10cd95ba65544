"""Shared MLlib plumbing for the model-based steps.

Assembles the selected numeric predictors into a vector column, indexes a
nominal outcome (the label dictionary is fit state — learned on train only,
the leakage rule), fits the estimator, and returns the model. All heavy
lifting is MLlib's (JVM, distributed); the driver only sees the p-sized
importance vector.
"""

from __future__ import annotations

from typing import Any

from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType


FEATURES_COL = "__features__"
LABEL_COL = "__label__"


def outcome_kind(df: DataFrame, outcome: str) -> str:
    t = {f.name: f.dataType for f in df.schema.fields}[outcome]
    if isinstance(t, NumericType):
        return "regression"
    if isinstance(t, StringType):
        return "classification"
    raise TypeError(f"unsupported outcome type {t}")


def n_classes(df: DataFrame, outcome: str) -> int:
    return df.select(outcome).where(F.col(outcome).isNotNull()).distinct().count()


def label_mapping(df: DataFrame, outcome: str) -> dict[str, int]:
    """Deterministic label index: lexicographic class order (fit state)."""
    classes = sorted(
        r[0]
        for r in df.select(outcome).where(F.col(outcome).isNotNull()).distinct().collect()
    )
    return {c: i for i, c in enumerate(classes)}


def label_expr(outcome: str, mapping: dict[str, int] | None):
    """The label column: mapped class index (classification) or a double
    cast (regression/None mapping)."""
    if mapping is None:
        return F.col(outcome).cast("double")
    expr = F.lit(None).cast("double")
    for cls_name, idx in mapping.items():
        expr = F.when(F.col(outcome) == cls_name, float(idx)).otherwise(expr)
    return expr


def prepare(
    df: DataFrame, x_names: list[str], outcome: str,
    mapping: dict[str, int] | None = None,
) -> tuple[DataFrame, str]:
    """Return (assembled df with __features__/__label__, task kind).

    ``mapping`` lets iterative callers (Boruta runs, per-feature
    permutation passes) compute the label dictionary ONCE and skip the
    per-call distinct job — the outcome column is untouched by shadowing/
    permutation, so the mapping is invariant across their iterations."""
    from recipeselectors_spark.operators._parallel import ensure_parallelism

    kind = outcome_kind(df, outcome)
    cols = list(x_names) + [outcome]
    # MLlib tree/ensemble fits iterate over the INPUT partitioning; a
    # single-row-group parquet scan would serialize the whole fit onto one
    # core (guide §2.5) — spread narrow inputs before assembling. No-op for
    # frames that already arrive partitioned (Boruta's cached repartition,
    # permutation passes, any real-scale scan).
    clean = ensure_parallelism(df.select(*cols).dropna())
    if kind == "classification":
        if mapping is None:
            mapping = label_mapping(clean, outcome)
        clean = clean.withColumn(LABEL_COL, label_expr(outcome, mapping))
    else:
        clean = clean.withColumn(LABEL_COL, label_expr(outcome, None))
    assembler = VectorAssembler(
        inputCols=list(x_names), outputCol=FEATURES_COL, handleInvalid="skip"
    )
    return assembler.transform(clean), kind


def fit_estimator(estimator: Any, assembled: DataFrame) -> Any:
    estimator = estimator.setFeaturesCol(FEATURES_COL).setLabelCol(LABEL_COL)
    return estimator.fit(assembled)
