"""Streaming surface.

The reference is batch-only (SURVEY.md §2.4 "Streaming — [ABSENT]"), and the
north rule is batch spark-submit jobs with resumable checkpoints, so this
package intentionally holds only the 1:1 mapping helpers for users who feed
transcripts from a stream: ``session_window_features`` shows how the batch
sessionize maps onto ``F.session_window`` + watermark. Not part of the
correctness surface.
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
