"""Streaming surface.

The reference is batch-only (SURVEY.md §2.4 "Streaming — [ABSENT]"), and the
north rule is batch spark-submit jobs with resumable checkpoints, so this
package holds the 1:1 mapping layer for users who feed transcripts from a
stream, both executed for real in tests/test_streaming.py:

* ``session_window_features`` — how the batch gap-sessionization maps onto
  ``F.session_window`` + watermark (built-in stateful aggregation);
* ``stateful_turn_features`` — a CUSTOM stateful operator via
  ``applyInPandasWithState``: per-conversation running turn index and
  cumulative average text length, state carried across micro-batches (the
  streaming analogue of the assembly layer's running window features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_window_features(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Structured-Streaming analogue of operators.windows.with_session_id:
    per-(conv_id, session) turn counts with late-data handling."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.avg(F.length("text")).alias("avg_text_len"),
        )
    )


STATEFUL_OUT_SCHEMA = (
    "conv_id string, ts timestamp, turn_in_conv int, cum_avg_text_len double"
)
STATEFUL_STATE_SCHEMA = "n long, total_len double"


def stateful_turn_features(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-conversation running turn index and cumulative average text length.

    State = (turn count, total text length) per conv_id, persisted in the
    state store across micro-batches — arriving turns continue the running
    features where the previous batch left off. Within a batch, a
    conversation's rows are processed in (ts, turn_idx) order (Arrow batches
    per key are concatenated and sorted — vectorized cumsum, no per-row
    Python). Append mode, no timeout: conversations never expire here;
    production jobs would set a ProcessingTimeTimeout and flush.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "turn_idx"], kind="mergesort")
        lens = rows["text"].fillna("").str.len().astype("float64")
        idx = n + np.arange(len(rows), dtype="int64")
        cum = float(total) + lens.cumsum().to_numpy()
        out = pd.DataFrame(
            {
                "conv_id": key[0],
                "ts": rows["ts"].values,
                "turn_in_conv": idx.astype("int32"),
                "cum_avg_text_len": cum / (idx + 1),
            }
        )
        state.update((int(n + len(rows)), float(total + lens.sum())))
        yield out

    return stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        STATEFUL_OUT_SCHEMA,
        STATEFUL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
