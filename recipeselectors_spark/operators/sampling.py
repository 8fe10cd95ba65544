"""Content-deterministic sampling and splitting for training-data pipelines.

``df.sample()`` / ``sampleBy()`` are seed-deterministic only for a FIXED
partitioning — re-layout the table (compaction, different file sizes,
cluster resize) and the sampled set changes. At 100 TB that breaks
resumability and auditability. These operators decide membership from the
CONTENT (a key column) via ``xxhash64(key, salt)``, so the same row lands in
the same sample/split on any layout, any cluster, any engine — and the
decision is replayable in the DuckDB oracle through the bit-exact XXH64 SQL
port (functions/xxh64_sql.py).

* ``deterministic_sample`` — keep a fraction of rows (optionally per
  stratum) by hash bucket: ``pmod(xxhash64(key, salt), 1_000_000) <
  frac * 1_000_000``.
* ``split_by_hash`` — disjoint, exhaustive train/validation/... splits from
  cumulative weight ranges over the same hash buckets; rows of one key
  always co-travel (leakage-free grouped splits when ``key`` is an entity
  id rather than a row id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 1_000_000


def _bucket(key: Column | str, salt: int) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c.cast("string"), F.lit(salt)), F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key: str,
    salt: int = 0,
    strata: dict[str, float] | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by content hash of ``key``.

    With ``strata``/``strata_col``, each stratum value gets its own
    fraction (unlisted strata fall back to ``fraction``) — the reproducible
    analogue of ``sampleBy`` for quality/language-balanced corpus
    downsampling. Pure Catalyst filter: no shuffle, pushdown-friendly.
    """
    b = _bucket(key, salt)
    if strata is None:
        return df.where(b < int(fraction * BUCKETS))
    if strata_col is None:
        raise ValueError("strata requires strata_col")
    cut = F.lit(int(fraction * BUCKETS))
    for val, frac in strata.items():
        cut = F.when(F.col(strata_col) == val, int(frac * BUCKETS)).otherwise(cut)
    return df.where(b < cut)


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float],
    key: str,
    salt: int = 1,
    out: str = "split",
) -> DataFrame:
    """Label every row with a split name; splits are disjoint, exhaustive,
    and deterministic by ``key`` content. Weights are normalized; split
    boundaries are cumulative-weight cutoffs over the hash buckets. Keys
    sort lexicographically for a stable boundary order."""
    total = sum(weights.values())
    names = sorted(weights)
    b = _bucket(key, salt)
    # cumulative cutoffs low->high; chain WHENs so the LOWEST matching
    # cutoff wins (build from the highest outward)
    cuts = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cuts.append((int(acc * BUCKETS), name))
    expr = F.lit(names[-1])
    for cut, name in reversed(cuts):
        expr = F.when(b < cut, name).otherwise(expr)
    return df.withColumn(out, expr)
