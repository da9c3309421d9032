package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SKEWED-DATA STRESS GATE (VERDICT r10 task 4): the salted renderings
  * ([[graft.ops.Skew]]) are proven ROW-EQUAL to their naive forms in
  * SkewSpec and the oracle gate, but the harness testdata is uniform —
  * nothing ever proved the salted plans FASTER on data that is actually
  * skewed. This main generates a derived dataset under `/tmp` (never
  * touching the read-only testdata) with one hot key owning a
  * configurable fraction of the rows, times naive-vs-salted for both
  * the shuffle join and the two-level aggregation at hot fractions
  * 0 %, 30 % and 60 %, asserts result equality, and prints one
  * JSON line per cell — the crossover table PERF.md records.
  *
  * Usage: `runMain graft.SkewStress [rows] [buckets] [hotPcts]`
  * (defaults 2e7, 16, "0,30,60").
  */
object SkewStress {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One hot key (0) owning `hotPct`% of rows; the rest uniform over
    * 100k keys. Deterministic (xxhash64 of the row id, no rand()). */
  private def writeLeft(s: SparkSession, dir: String, rows: Long,
      hotPct: Int): Unit =
    s.range(0, rows)
      .select(
        when(pmod(xxhash64(col("id")), lit(100)) < hotPct, 0L)
          .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(100000L)))
          .as("k"),
        (col("id") % 1000).as("v"),
        col("id").as("tb"))
      .write.mode("overwrite").parquet(dir)

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = "/tmp/skewstress"
    // right side: all 100k keys with a small attribute; the
    // shuffle_merge hint keeps Spark from broadcasting it — this gate
    // is about the both-sides-large case (broadcast is the documented
    // first-choice fix when it fits)
    spark.range(0, 100000L)
      .select(col("id").as("rk"), (col("id") * 7 % 13).as("w"))
      .write.mode("overwrite").parquet(s"$base/right")
    val right = spark.read.parquet(s"$base/right")

    val hotPcts = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(0, 30, 60))
    for (hotPct <- hotPcts) {
      val dir = s"$base/left_$hotPct"
      writeLeft(spark, dir, rows, hotPct)
      val left = spark.read.parquet(dir)

      // JOIN: checksum aggregate forces the full join output
      def naiveJoin: DataFrame = left
        .join(right.hint("shuffle_merge"), col("k") === col("rk"))
        .agg(sum(col("v") * col("w")).as("chk"), count(lit(1)).as("n"))
      def saltedJoin: DataFrame = graft.ops.Skew.saltedJoinLarge(
          left, "k", "tb", right.hint("shuffle_merge"), "rk", buckets)
        .agg(sum(col("v") * col("w")).as("chk"), count(lit(1)).as("n"))
      // AGG: algebraic sum/count per key (map-side combinable — the
      // case partial aggregation should already defuse)
      def naiveAgg: DataFrame = left.groupBy("k")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("c"))
        .agg(sum(col("sv")).as("chk"), count(lit(1)).as("n"))
      def saltedAgg: DataFrame = graft.ops.Skew.saltedAggregate(
          left, col("k"), col("tb"), buckets,
          Seq(("sv", sum(col("v")), sum(col("sv"))),
            ("c", count(lit(1)), sum(col("c")))))
        .agg(sum(col("sv")).as("chk"), count(lit(1)).as("n"))

      val cells = Seq(
        ("join_naive", () => naiveJoin), ("join_salted", () => saltedJoin),
        ("agg_naive", () => naiveAgg), ("agg_salted", () => saltedAgg))
      val out = cells.map { case (name, q) =>
        q().collect() // warm plan+codegen once; timing below is best-of-2
        val samples = (1 to 2).map(_ => time(q().collect().head))
        val best = samples.minBy(_._2)
        (name, best._1, best._2)
      }
      // equality gate: salted must be invisible in the results
      require(out(0)._2.toSeq == out(1)._2.toSeq,
        s"join results differ at hot=$hotPct: ${out(0)._2} vs ${out(1)._2}")
      require(out(2)._2.toSeq == out(3)._2.toSeq,
        s"agg results differ at hot=$hotPct: ${out(2)._2} vs ${out(3)._2}")
      val times = out.map(o => "\"" + o._1 + "\":" +
        BigDecimal(o._3).setScale(3, BigDecimal.RoundingMode.HALF_UP))
        .mkString(",")
      println(s"""{"metric":"skew_stress","rows":$rows,"hot_pct":$hotPct,"buckets":$buckets,$times}""")
    }
    spark.stop()
  }
}
