"""applyInPandasWithState: state persists across micro-batches."""

from pyspark.sql import functions as F

from rkmh_spark.streaming.stateful import running_event_totals

SF = "/root/testdata/sf0.001"


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet").limit(1000)
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    # two separate files → at least two input splits; availableNow drains all
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(events.schema).format("parquet").load(src)
    q = (
        running_event_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per key == full-batch totals
    rows = spark.sql("select * from running_totals").collect()
    last = {}
    for r in rows:  # memory sink appends update rows in emission order
        last[r["event_type"]] = (r["n"], r["total"])

    expect = {
        r["event_type"]: (r["n"], r["total"])
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    assert last == expect
