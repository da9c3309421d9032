package graft

import org.apache.spark.sql.SparkSession

/** One place that constructs a correctly-configured engine session, so
  * every entrypoint (Verify, Bench, PipelineMain, tests) agrees on:
  *  - UTC session timezone (oracle parity — DuckDB treats the testdata
  *    timestamps as naive),
  *  - [[Tables.requiredConf]] set ONCE at construction instead of as a
  *    hidden per-read side effect (ADVICE r1),
  *  - AQE on (runtime re-planning: skew joins, partition coalescing — the
  *    100 TB posture even though local runs are small),
  *  - shuffle partitions sized to the actual core count, not the 200
  *    default that would fragment local runs.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }

  /** local[cpus] session for harness entrypoints. Also registers graft's
    * native SQL functions (cosine_sim) — cluster deploys get the same via
    * spark.sql.extensions=graft.functions.GraftExtensions. */
  def local(cpus: String): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
