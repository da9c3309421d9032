package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSession

/** File-source Structured Streaming E2E: replays the events table as a
  * parquet file stream, runs the watermarked tumbling-window aggregation,
  * and writes an append-mode parquet sink with checkpointing — the full
  * production wiring around the transformations StreamingSpec unit-tests
  * via MemoryStream.
  *
  *   sbt "runMain graft.streaming.StreamDemo /root/testdata/sf0.001 /tmp/stream-out"
  *
  * Scale notes: the file source paces itself with maxFilesPerTrigger;
  * state is bounded by the 10-minute watermark; the sink commits
  * per-micro-batch atomically via the checkpoint WAL, giving exactly-once
  * file output — the streaming rendering of the batch pipeline's
  * idempotent-load contract.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamDemo <sfDir> <outDir>")
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    // file stream sources read DIRECTORIES of arriving files; stage the
    // static table into a landing dir to replay it (this is also the
    // production shape: upstream drops files, the stream picks them up)
    val landing = java.nio.file.Paths.get(outDir, "landing")
    java.nio.file.Files.createDirectories(landing)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "events.parquet"),
      landing.resolve("events-000.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(landing.toString).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)
      .withColumn("ts",
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("timestamp_micros(ts div 1000)")
        else col("ts"))

    // chained stateful operators: watermarked dedup feeding the windowed
    // aggregation — the standard at-least-once-upstream ingest shape
    val query = EventStreams.hourlyTumbling(EventStreams.dedupEvents(stream))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$outDir/hourly")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .start()

    // one replay pass over the static file set, then drain and stop
    query.processAllAvailable()
    query.stop()

    val result = spark.read.parquet(s"$outDir/hourly")
    println(s"[stream-demo] windows written: ${result.count()}")
    result.orderBy("hour", "event_type").show(5, truncate = false)
    spark.stop()
  }
}
