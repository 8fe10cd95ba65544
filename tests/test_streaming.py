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
