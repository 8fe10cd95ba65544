"""The streaming mapping helper actually RUNS as a Structured Streaming
query (file source -> availableNow micro-batches -> memory sink) and its
session aggregates agree with the batch gap-sessionization semantics."""

import pandas as pd
import pytest

from recipeselectors_spark.sources import transcripts as T
from recipeselectors_spark.streaming import session_window_features


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    pdf = T.synthesize_transcripts_pandas(n_convs=20, seed=13)
    spark.createDataFrame(pdf, schema=T.TRANSCRIPT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "tx"))
    return str(d / "tx")


def test_session_window_stream_executes(spark, stream_dir):
    stream = spark.readStream.schema(T.TRANSCRIPT_SCHEMA).parquet(stream_dir)
    assert stream.isStreaming
    out = session_window_features(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_stream").toPandas()
    assert len(got) > 0
    assert {"conv_id", "n_turns", "avg_text_len"} <= set(got.columns)

    # semantics: per-conv turn totals equal the batch count, and the number
    # of session windows equals batch gap-sessionization's session count
    batch = spark.read.parquet(stream_dir).toPandas()
    batch_counts = batch.groupby("conv_id").size()
    got_counts = got.groupby("conv_id")["n_turns"].sum()
    assert got_counts.sort_index().equals(batch_counts.sort_index())

    def n_sessions(g: pd.DataFrame) -> int:
        ts = g.sort_values("ts")["ts"]
        gaps = ts.diff().dt.total_seconds()
        return int((gaps.isna() | (gaps > 1800)).sum())

    want_sessions = sum(
        n_sessions(g) for _, g in batch.groupby("conv_id")
    )
    assert len(got) == want_sessions


def test_stateful_turn_features_across_microbatches(spark, tmp_path):
    """applyInPandasWithState carries per-conversation state ACROSS
    micro-batches: three time-ordered parquet files processed one per
    trigger (maxFilesPerTrigger=1, availableNow) must produce exactly the
    single-pass batch computation of running turn index + cumulative
    average text length."""
    import numpy as np

    from recipeselectors_spark.streaming import stateful_turn_features

    pdf = T.synthesize_transcripts_pandas(n_convs=12, seed=21)
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    # split each conversation's timeline into 3 consecutive chunks so the
    # files arrive in ts order per conversation
    d = tmp_path / "tx"
    d.mkdir()
    rank = pdf.groupby("conv_id").cumcount()
    size = pdf.groupby("conv_id")["ts"].transform("size")
    for i in range(3):
        chunk = pdf[(rank * 3 // size) == i]
        spark.createDataFrame(chunk, schema=T.TRANSCRIPT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(str(d / f"f{i}"))

    stream = (
        spark.readStream.schema(T.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "f*"))
    )
    out = stateful_turn_features(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_turns")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # state really crossed batches
    got = (
        spark.sql("SELECT * FROM stateful_turns")
        .toPandas()
        .sort_values(["conv_id", "turn_in_conv"])
        .reset_index(drop=True)
    )

    want = pdf.copy()
    want["len"] = want["text"].fillna("").str.len().astype(float)
    want["turn_in_conv"] = want.groupby("conv_id").cumcount()
    want["cum_avg_text_len"] = (
        want.groupby("conv_id")["len"].cumsum()
        / (want["turn_in_conv"] + 1)
    )
    want = want.sort_values(["conv_id", "turn_in_conv"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_in_conv"].tolist() == want["turn_in_conv"].tolist()
    np.testing.assert_allclose(
        got["cum_avg_text_len"].to_numpy(),
        want["cum_avg_text_len"].to_numpy(),
        rtol=1e-12,
    )
