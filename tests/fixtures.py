"""Deterministic synthetic fixtures per FIXTURES.md F2-F5."""

from __future__ import annotations

import numpy as np
import pandas as pd

IRIS_X = ["sepal_length", "sepal_width", "petal_length", "petal_width"]


def iris_like(seed: int = 1, n_per_class: int = 50) -> pd.DataFrame:
    """4 numeric predictors, 3-class outcome; two strong, one weak, one noise
    (FIXTURES.md F2) so top_p=2 has a stable answer."""
    rng = np.random.default_rng(seed)
    rows = []
    centers = {
        "setosa": (5.0, 3.4, 1.5, 0.2),
        "versicolor": (5.9, 2.8, 4.3, 1.3),
        "virginica": (6.6, 3.0, 5.5, 2.0),
    }
    for sp, (a, b, c, d) in centers.items():
        for _ in range(n_per_class):
            rows.append(
                (
                    a + rng.normal(0, 0.5),       # moderately separating
                    rng.normal(3.0, 0.4),          # near-noise
                    c + rng.normal(0, 0.35),       # strong
                    d + rng.normal(0, 0.15),       # strong
                    sp,
                )
            )
    return pd.DataFrame(rows, columns=IRIS_X + ["species"])


CELLS_X = [f"x{i:02d}" for i in range(1, 21)]


def cells_like(seed: int = 2, n: int = 1200) -> pd.DataFrame:
    """20 numeric predictors, binary outcome ~2:1; x01..x05 signal at
    decreasing strength, (x01,x02) correlated pair for mRMR redundancy
    (FIXTURES.md F3)."""
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 1 / 3).astype(int)
    X = rng.normal(size=(n, 20))
    strengths = [1.6, 1.3, 0.9, 0.6, 0.35]
    for i, s in enumerate(strengths):
        X[:, i] += s * y
    X[:, 1] = 0.7 * X[:, 0] + 0.3 * X[:, 1]  # correlated pair
    df = pd.DataFrame(X, columns=CELLS_X)
    df["class"] = np.where(y == 1, "PS", "WS")
    return df


LENDING_NUM = [f"num{i:02d}" for i in range(1, 9)]
LENDING_CAT = [f"cat{i:02d}" for i in range(1, 7)]


def lending_like(seed: int = 3, n: int = 1000) -> pd.DataFrame:
    """Mixed numeric + categorical, imbalanced binary outcome (~5%)
    (FIXTURES.md F4); cat01 strongly associated, cat06 independent, cat05
    binary for Fisher 2×2."""
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.08).astype(int)
    X = rng.normal(size=(n, 8))
    for i, s in enumerate([1.2, 0.8, 0.5, 0.3]):
        X[:, i] += s * y
    df = pd.DataFrame(X, columns=LENDING_NUM)
    levels = {
        "cat01": 4, "cat02": 3, "cat03": 8, "cat04": 2, "cat05": 2, "cat06": 5,
    }
    for j, (c, k) in enumerate(levels.items()):
        base = rng.integers(0, k, n)
        if c in ("cat01", "cat04", "cat05"):
            strength = {"cat01": 0.75, "cat04": 0.45, "cat05": 0.5}[c]
            shift = (rng.random(n) < strength) & (y == 1)
            base = np.where(shift, 0, base)
        df[c] = pd.Series(base).map(lambda v: f"{c}_l{v}")
    df["Class"] = np.where(y == 1, "bad", "good")
    return df


CAR_X = [f"x{i:02d}" for i in range(1, 11)]


def carprices_like(seed: int = 4, n: int = 800) -> pd.DataFrame:
    """Numeric regression target; x01..x03 correlated block so CAR differs
    from marginal correlation (FIXTURES.md F5)."""
    rng = np.random.default_rng(seed)
    z = rng.normal(size=n)
    X = rng.normal(size=(n, 10))
    for i in range(3):  # correlated block
        X[:, i] = 0.8 * z + 0.6 * rng.normal(size=n)
    df = pd.DataFrame(X, columns=CAR_X)
    df["price"] = (
        2.0 * X[:, 0] + 1.2 * X[:, 1] + 0.8 * X[:, 2] + 0.5 * X[:, 3]
        + rng.normal(0, 1.0, n)
    )
    return df
