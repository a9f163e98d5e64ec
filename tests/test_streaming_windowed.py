"""Windowed streaming agg == equivalent batch agg on the same data."""

from pyspark.sql import functions as F

from rkmh_spark.streaming.windowed import windowed_event_counts

SF = "/root/testdata/sf0.001"


def test_windowed_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet").limit(2000)
    src = str(tmp_path / "ev")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema).format("parquet").load(src)
    )
    out = windowed_event_counts(stream, "5 minutes", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expect_df = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .select(
            F.col("window.start").alias("ws"), "event_type", "n", "s"
        )
    )
    expect = {
        (r["ws"], r["event_type"]): (r["n"], r["s"]) for r in expect_df.collect()
    }
    assert got == expect
    assert len(got) > 0
