package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the harness testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom —
  * never cache here; the caller decides materialization.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** Session conf every graft entrypoint sets at SparkSession construction.
    * events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects outright
    * (PARQUET_TYPE_ILLEGAL); nanosAsLong reads it as long (harmless for the
    * µs/ms timestamps in every other table). Set once up front — per-read
    * conf mutation would race under concurrent queries (ADVICE r1). */
  val requiredConf: Map[String, String] =
    Map(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      // Testdata timestamps are parquet timestamp[us] WITHOUT a timezone
      // (isAdjustedToUTC=false). Spark 4 would infer TIMESTAMP_NTZ for
      // those; DuckDB reads them as naive TIMESTAMP. Reading them as
      // session-local TIMESTAMP under the UTC session timezone keeps the
      // wall-clock values identical on both sides AND keeps the columns
      // usable where NTZ is not (RANGE window cast to bigint, the as-of
      // operator's time ordinal).
      "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false")

  /** events.ts nanos → Spark-native µs truncation — the same truncation
    * DuckDB applies, so oracles agree. The nanosAsLong flag must already be
    * set ([[requiredConf]]); if a caller-supplied session lacks it, set it
    * idempotently here (same value always — no behavior change mid-session,
    * unlike the r1 version that flipped it as a read side effect). */
  def events(s: SparkSession, d: String): DataFrame = {
    requiredConf.foreach { case (k, v) =>
      if (!s.conf.getOption(k).contains(v)) s.conf.set(k, v)
    }
    val df = apply(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
