"""Stream-stream interval join: watermarked, event-time bounded."""

from __future__ import annotations

from pyspark.sql import types as T

from sstable_migrator_spark.streaming.joins import interval_stream_join

CLICKS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("click_ts", T.TimestampType()),
        T.StructField("click_id", T.LongType()),
    ]
)
BUYS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("buy_ts", T.TimestampType()),
        T.StructField("buy_id", T.LongType()),
    ]
)


def test_interval_stream_join(spark, tmp_path):
    c_dir = tmp_path / "clicks"
    b_dir = tmp_path / "buys"
    c_dir.mkdir()
    b_dir.mkdir()
    c_dir.joinpath("c.csv").write_text(
        "1,2024-01-01T10:00:00,100\n"  # matched by buy at 10:30
        "1,2024-01-01T12:00:00,101\n"  # buy at 14:00 outside 1h window
        "2,2024-01-01T10:00:00,102\n"  # other user's buy must not match
    )
    b_dir.joinpath("b.csv").write_text(
        "1,2024-01-01T10:30:00,900\n"
        "1,2024-01-01T14:00:00,901\n"
        "3,2024-01-01T10:10:00,902\n"
    )
    clicks = spark.readStream.schema(CLICKS).csv(str(c_dir) + "/*.csv")
    buys = spark.readStream.schema(BUYS).csv(str(b_dir) + "/*.csv")

    joined = interval_stream_join(
        clicks, buys, on="user_id", left_ts="click_ts", right_ts="buy_ts",
        max_delay="1 hour", watermark="2 hours",
    ).select("click_id", "buy_id")

    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["click_id"], r["buy_id"]) for r in spark.sql("SELECT * FROM attrib").collect()}
    assert rows == {(100, 900)}


def test_stream_join_requires_streaming_plan(spark, tmp_path):
    """The operator produces a streaming plan (state-store join), not a
    batch join."""
    clicks = spark.readStream.schema(CLICKS).csv(str(tmp_path) + "/*.csv")
    buys = spark.readStream.schema(BUYS).csv(str(tmp_path) + "/*.csv")
    out = interval_stream_join(
        clicks, buys, on="user_id", left_ts="click_ts", right_ts="buy_ts"
    )
    assert out.isStreaming


def test_stream_static_enrich_picks_up_dim(spark, tmp_path):
    """Stream-static join is stateless and re-reads the static plan per
    batch: rows join the dimension as of their batch."""
    from pyspark.sql import types as T

    from sstable_migrator_spark.streaming.joins import stream_static_enrich

    in_dir = tmp_path / "s"
    in_dir.mkdir()
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ck")
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("com", "generic"), ("de", "country")], "tld string, kind string"
    ).write.parquet(dim_path)

    schema = T.StructType([T.StructField("domain", T.StringType()),
                           T.StructField("tld", T.StringType())])
    (in_dir / "b1.csv").write_text("a.com,com\nb.de,de\nc.xyz,xyz\n")

    dim = spark.read.parquet(dim_path)
    stream = spark.readStream.schema(schema).csv(str(in_dir) + "/*.csv")
    q = (
        stream_static_enrich(stream, dim, "tld")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["domain"], r["kind"]) for r in spark.read.parquet(out).collect()}
    assert got == {("a.com", "generic"), ("b.de", "country"), ("c.xyz", None)}
