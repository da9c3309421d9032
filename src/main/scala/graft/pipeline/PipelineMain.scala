package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** CLI driver for the batch pipeline — the engine's replacement for the
  * reference's Airflow DAG run (SURVEY.md O-1/O-2: scheduling is an
  * external concern; cron/any scheduler invokes this main per run date).
  *
  * Usage:
  *   PipelineMain <landingDir> <dates,comma,separated> <tablePath> <exportDir> [runDate]
  *
  * `runDate` defaults to today (the reference's `CURRENT_DATE` behavior,
  * dag:87/149); passing it explicitly gives deterministic re-runs — the
  * generalized `{{ ds }}`.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PipelineMain <landingDir> <dates,comma,separated> <tablePath> <exportDir> [runDate]")
    val Array(landingDir, dates, tablePath, exportDir) = args.take(4)
    val runDate =
      if (args.length > 4) LocalDate.parse(args(4)) else LocalDate.now()

    val spark = graft.GraftSession.builder(
        sys.env.getOrElse("SPARK_MASTER", "local[*]"),
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val conf = Pipeline.Config(landingDir, dates.split(",").toSeq, tablePath, exportDir)
    val result = Pipeline.run(spark, conf, runDate)
    // the reference's reconciliation signal: loaded and exported counts
    // must agree (postgres_to_s3_operator.py:46,65-70)
    println(s"[pipeline] runDate=$runDate loaded=${result.loadedRows} " +
      s"exported=${result.exportedRows} -> ${result.exportPath}")
    spark.stop()
  }
}
