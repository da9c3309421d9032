package graft

/** Dev tool: time + explain individual SparkEntry queries.
  *
  *   sbt "runMain graft.Explain q_dedup_jaccard [sfDir] [--plan]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <query|all> [sfDir] [--plan]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = args.drop(1).filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val showPlan = args.contains("--plan")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = if (name == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown query '$n'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm (plan compile etc.) then measure
      val t0 = System.nanoTime(); val c = fn(spark, sfDir).count()
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"[explain] $n%-18s rows=$c%-9d cold=${(t1 - t0) / 1e9}%6.2fs warm=${(t2 - t1) / 1e9}%6.2fs")
      if (showPlan) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
