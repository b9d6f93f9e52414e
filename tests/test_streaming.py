"""Streaming extension tests: batch/stream parity of the windowed
aggregations (the batch run is the oracle for the streaming run)."""

import os

import pytest

from lightfusion_spark.streaming import events as ev

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_stats_stream_matches_batch(spark, batch_events, tmp_path):
    stream = ev.read_events_stream(spark, SF_DIR)
    ev.run_available_now(
        ev.windowed_event_stats(stream), "win_stats", str(tmp_path / "ckpt")
    )
    got = spark.sql("SELECT * FROM win_stats")
    expected = ev.windowed_event_stats(batch_events)
    assert _sorted_rows(got) == _sorted_rows(expected)
    assert got.count() > 0


def test_sessionization_stream_matches_batch(spark, batch_events, tmp_path):
    stream = ev.read_events_stream(spark, SF_DIR)
    ev.run_available_now(
        ev.sessionized_user_activity(stream), "sessions", str(tmp_path / "ckpt2")
    )
    got = spark.sql("SELECT * FROM sessions")
    expected = ev.sessionized_user_activity(batch_events)
    assert _sorted_rows(got) == _sorted_rows(expected)
    assert got.count() > 0


def test_event_time_conversion(spark, batch_events):
    from pyspark.sql import functions as F

    df = ev.with_event_time(batch_events)
    row = df.select(F.min("event_time").alias("lo"), F.max("event_time").alias("hi")).first()
    assert row["lo"].year == 2024 and row["hi"].year == 2024


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming exact-dedup: dropDuplicatesWithinWatermark keeps state only
    inside the watermark horizon (the streaming face of exact_dedup)."""
    stream = ev.read_events_stream(spark, SF_DIR)
    deduped = ev.with_event_time(stream).withWatermark(
        "event_time", "10 days"
    ).dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_stream").first()
    assert got["n"] == got["d"] > 0


def test_stateful_user_counts(spark, batch_events, tmp_path):
    """applyInPandasWithState: single availableNow batch -> running counts
    equal the batch aggregation."""
    from pyspark.sql import functions as F

    stream = ev.read_events_stream(spark, SF_DIR)
    counts = ev.stateful_user_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("user_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events, MAX(sum_value) AS sum_value "
            "FROM user_counts GROUP BY user_id"
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum("value") * 1_000_000).cast("bigint") / 1_000_000).alias("s"),
        )
        .collect()
    }
    assert len(got) > 0
    mismatched = {u for u in expected if got.get(u, (None,))[0] != expected[u][0]}
    assert not mismatched


def test_foreach_batch_parquet_sink(spark, batch_events, tmp_path):
    """foreachBatch: checkpointed batch-id-addressed writes — the pattern
    for exactly-once delivery to non-idempotent sinks."""
    out_dir = str(tmp_path / "sink")
    stream = ev.read_events_stream(spark, SF_DIR)
    stats = ev.windowed_event_stats(stream)

    def write_batch(batch_df, batch_id: int):
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        stats.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt5"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out_dir)
    expected = ev.windowed_event_stats(batch_events)
    assert back.drop("batch").count() == expected.count()
    got_total = back.agg({"n_events": "sum"}).first()[0]
    assert got_total == batch_events.count()


def test_stream_stream_join_matches_batch(spark, batch_events, tmp_path):
    """view_click_attribution: watermarked two-stream inner join drained
    with availableNow equals the same function applied in batch."""
    from pyspark.sql import functions as F

    stream = ev.read_events_stream(spark, SF_DIR)
    sv = stream.where(F.col("event_type") == "view")
    sc = stream.where(F.col("event_type") == "click")
    q = (
        ev.view_click_attribution(sv, sc)
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM attr_stream")
    bv = batch_events.where(F.col("event_type") == "view")
    bc = batch_events.where(F.col("event_type") == "click")
    expected = ev.view_click_attribution(bv, bc)
    assert _sorted_rows(got) == _sorted_rows(expected)
    assert got.count() > 0


def test_incremental_minhash_foreachbatch(spark, tmp_path):
    """Continual-ingest FUZZY dedup's streaming face: arriving document
    micro-batches are near-dup-checked against the static historical
    corpus inside foreachBatch — the production pattern for a maintained
    dedup store (the batch operator is the per-micro-batch body).  The
    availableNow run must produce exactly the batch-mode pairs."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    expected = _sorted_rows(
        dedup.minhash_incremental(
            docs.where(F.col("doc_id") % 2 == 1), corpus, "doc_id", "text"
        )
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{SF_DIR}/documents*.parquet")
    )
    got: list[tuple] = []

    def process(batch_df, epoch_id):
        new = batch_df.where(F.col("doc_id") % 2 == 1)
        got.extend(
            tuple(r)
            for r in dedup.minhash_incremental(
                new, corpus, "doc_id", "text"
            ).collect()
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt_mh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(got) == expected and len(expected) > 0


def test_windowed_ohlc_stream_matches_batch_operator(spark, tmp_path):
    """The streaming OHLC face (min_by/max_by declarative aggregates)
    must produce the SAME bars as the batch downsample_ohlc (ROW_NUMBER
    formulation) — the same-timestamp tiebreak included."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.resample import downsample_ohlc
    from lightfusion_spark.streaming import events as ev

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # batch reference via the integer-micros operator
    b = batch.withColumn("ts_us", ev.ts_micros_col(batch))
    want = {
        (r["event_type"], r["ts_us"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["sum_value"]
        )
        for r in downsample_ohlc(
            b.select("event_type", "ts_us", "value", "event_id"),
            "event_type", "ts_us", "value",
            bucket=86_400_000_000, tiebreak_col="event_id",
        ).collect()
    }

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{SF_DIR}/events*.parquet")
    )
    out_dir = str(tmp_path / "ohlc_out")
    q = (
        ev.windowed_ohlc(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_df = spark.read.parquet(out_dir)
    got = {
        (r["event_type"], int(r["window_start"].timestamp() * 1_000_000)): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["sum_value"]
        )
        for r in got_df.collect()
    }
    # append mode only emits windows the watermark closed: the final
    # ~(watermark + 1 window) days stay open at stream end, i.e. up to
    # 3 days x 5 event types = 15 unemitted bars over the 30-day corpus.
    # Every bar that IS emitted must match its batch counterpart exactly.
    assert len(got) >= len(want) - 15 and len(got) > 0
    for key, bar in got.items():
        assert want[key] == bar, f"bar mismatch at {key}"
