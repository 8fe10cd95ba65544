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


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    key: str,
    budget: int,
    salt: int = 0,
    bucket_chars: int = 3,
) -> DataFrame:
    """Concat-and-split sequence packing — assign documents to fixed token
    budgets (training examples), the GPT-style pretraining batching shape.

    Documents are ordered content-deterministically (by ``xxhash64(key)``
    within 16**bucket_chars hash buckets — the same layout-invariant
    discipline as :func:`deterministic_sample`: identical packing on any
    partitioning, any cluster size, replayable in SQL) and packed by
    running token count: a document starts in pack ``floor(cum_before /
    budget)`` of its bucket. A document whose tokens straddle a budget
    boundary is flagged ``straddles`` (trainers either mask across the
    seam or re-chunk those few); a document longer than the whole budget
    always straddles and should be pre-chunked upstream.

    One exchange (the bucket window); cumsum is a per-bucket running sum,
    never a global sort. Output adds ``pack_id`` (string: bucket hex +
    '-' + index) and ``straddles``; the pack universe is
    16**bucket_chars × (bucket tokens / budget).
    """
    from pyspark.sql.window import Window

    kc = F.xxhash64(F.col(key).cast("string"), F.lit(salt))
    b = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, bucket_chars), 16, 10)
    tmp_k, tmp_b = "__pack_key__", "__pack_bucket__"
    out = df.withColumn(tmp_k, kc).withColumn(tmp_b, b)
    w = (
        Window.partitionBy(tmp_b)
        .orderBy(tmp_k, F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_after = F.sum(F.col(token_count_col)).over(w)
    cum_before = cum_after - F.col(token_count_col)
    return (
        out.withColumn(
            "pack_id",
            F.concat_ws(
                "-",
                F.col(tmp_b).cast("string"),
                F.floor(cum_before / F.lit(budget)).cast("string"),
            ),
        )
        .withColumn(
            "straddles",
            F.floor(cum_before / F.lit(budget))
            != F.floor((cum_after - 1) / F.lit(budget)),
        )
        .drop(tmp_k, tmp_b)
    )


def mixture_sample(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    total_fraction: float,
    key: str,
    salt: int = 0,
    allow_repeat: bool = False,
    plan_out: dict | None = None,
) -> DataFrame:
    """Multi-source corpus mixture — sample each source so the blended
    output approximates the target ``weights`` (e.g. web .6 / code .3 /
    books .1) at ``total_fraction`` of the combined volume, with a
    ``source`` column. The per-source keep fraction is derived from the
    actual source sizes (one count() per source — bounded driver work) so
    the OUTPUT proportions match ``weights`` regardless of how unbalanced
    the inputs are. Membership is content-deterministic per source
    (:func:`deterministic_sample`), so the mixture is reproducible across
    layouts and re-runs.

    An undersized source (fraction > 1.0):

    * ``allow_repeat=False`` (default) — clamps to the full source; the
      output mixture drifts from ``weights`` (real training mixtures often
      DO repeat rare high-quality sources — opt in below).
    * ``allow_repeat=True`` — deterministic upsampling: every row emits
      ``floor(frac)`` full copies plus one more iff its content hash lands
      in the fractional remainder (explode over a literal range — still
      layout-invariant, rerun-identical). Output gains a ``copy_idx``
      column (0-based repetition index; 0 for all rows of non-repeated
      sources) so trainers can shuffle or de-weight repeats.

    ``plan_out``, if a dict is passed, is filled with the achieved plan per
    source — ``{name: {"count", "fraction", "expected_rows",
    "achieved_weight", "clamped"}}`` — so callers can detect weight drift
    programmatically (``achieved_weight`` != normalized target weight when
    a source clamped)."""
    if set(sources) != set(weights):
        raise ValueError(
            f"sources {sorted(sources)} and weights {sorted(weights)} differ"
        )
    total_w = sum(weights.values())
    counts = {name: src.count() for name, src in sources.items()}
    target_total = total_fraction * sum(counts.values())

    fracs: dict[str, float] = {}
    for name in sources:
        want = target_total * weights[name] / total_w
        raw = want / max(counts[name], 1)
        fracs[name] = raw if allow_repeat else min(1.0, raw)

    expected = {n: fracs[n] * counts[n] for n in sources}
    exp_total = max(sum(expected.values()), 1e-12)
    if plan_out is not None:
        for name in sources:
            plan_out[name] = {
                "count": counts[name],
                "fraction": round(fracs[name], 9),
                "expected_rows": round(expected[name], 3),
                "achieved_weight": round(expected[name] / exp_total, 9),
                "clamped": (not allow_repeat)
                and target_total * weights[name] / total_w
                > counts[name],
            }

    out = None
    for name, src in sources.items():
        frac = fracs[name]
        if allow_repeat:
            full = int(frac)
            rem = frac - full
            b = _bucket(key, salt)
            n_copies = F.lit(full) + F.when(
                b < int(rem * BUCKETS), F.lit(1)
            ).otherwise(F.lit(0))
            # filter zero-copy rows BEFORE the explode (sequence() with
            # start > stop would descend, not produce an empty array), then
            # explode a per-row literal range: k copies -> k output rows
            part = (
                src.where(n_copies > 0)
                .withColumn(
                    "copy_idx",
                    F.explode(F.sequence(F.lit(0), n_copies - F.lit(1))),
                )
                .withColumn("source", F.lit(name))
            )
        else:
            part = deterministic_sample(src, frac, key, salt=salt).withColumn(
                "source", F.lit(name)
            )
        out = part if out is None else out.unionByName(part)
    return out


def chunk_array(
    text_col: str, max_tokens: int, overlap: int
) -> Column:
    """The chunk list as a Column (pre-explode form of
    :func:`chunk_documents`) — also used by the driver oracle to pin chunk
    CONTENT per document without changing a query's row universe.

    Start indices run 0, step, 2*step, ... capped at ``n - overlap - 1``
    (not ``n - 1``): a start ``s`` with ``s + overlap >= n`` would emit a
    chunk fully contained in the previous one (which already covers
    through ``s + overlap``), duplicating corpus text; for
    ``n <= max_tokens`` the first non-zero start (= step) already exceeds
    the bound, so short docs still yield exactly one chunk."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap={overlap} < max_tokens={max_tokens}")
    from recipeselectors_spark.functions import text as TX

    step = max_tokens - overlap
    toks = TX.tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)
    )
    return F.transform(
        starts,
        lambda s: F.concat_ws(" ", F.slice(toks, s + 1, max_tokens)),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into token-bounded chunks (with optional token
    overlap) — the upstream companion of :func:`pack_sequences`, which
    flags documents longer than a whole pack budget.

    Pure Catalyst: tokenize once, slice by a generated start-index
    sequence, explode — map-only, no shuffle, no Python. Output replaces
    ``text_col`` with the chunk text and adds ``chunk_idx`` and
    ``n_chunks``; short documents pass through as their own single chunk.
    Chunk boundaries are whitespace-token aligned (a tokenizer-exact
    variant would swap in the BPE-ish regex tokens)."""
    chunks = chunk_array(text_col, max_tokens, overlap)
    out_cols = [c for c in df.columns if c != text_col]
    return (
        df.withColumn("__chunks__", chunks)
        .select(
            *out_cols,
            F.size("__chunks__").alias("n_chunks"),
            F.posexplode("__chunks__").alias("chunk_idx", text_col),
        )
    )
