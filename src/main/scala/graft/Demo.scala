package graft

/** Library-surface smoke demo: exercises the public API the way a user
  * would — SQL-registered native functions, the mapPartitions multimodal
  * path, and a streaming-equivalent batch query. Run:
  *
  *   sbt "runMain graft.Demo /root/testdata/sf0.001"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    spark.read.parquet(s"$d/embeddings.parquet").createOrReplaceTempView("embeddings")
    println("== cosine_sim via SQL registry ==")
    spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, a.embedding), 6) AS self_sim
        |FROM embeddings a ORDER BY a.vec_id LIMIT 3""".stripMargin).show()

    println("== cosine_sim error surfaces ==")
    Seq(
      "SELECT cosine_sim(embedding) FROM embeddings",
      "SELECT cosine_sim(vec_id, embedding) FROM embeddings").foreach { q =>
      try { spark.sql(q).collect(); println(s"UNEXPECTED OK: $q") }
      catch { case e: Exception =>
        println(s"expected error: ${e.getMessage.linesIterator.next().take(160)}") }
    }

    println("== multimodal decode (mapPartitions batch path) ==")
    val feats = multimodal.Multimodal.decodeFeatures(spark, d)
    feats.printSchema()
    feats.orderBy("media_id").show(3, truncate = false)

    println("== optimizer rule: cosine_sim(x, x) -> self_cosine(x) ==")
    println(spark.sql("SELECT cosine_sim(embedding, embedding) AS s FROM embeddings")
      .queryExecution.optimizedPlan.toString.linesIterator.next())

    println("== multimodal frame sampling (video-decode shape) ==")
    multimodal.Multimodal.sampleFrames(spark, d)
      .orderBy("media_id", "frame_idx").show(4, truncate = 40)

    println("== approximate vs exact knn: recall@k ==")
    val exact = similarity.Similarity.bruteForceTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = similarity.Similarity.lshTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    println(f"lsh recall@${similarity.Similarity.topK}: " +
      f"${exact.intersect(approx).size.toDouble / exact.size}%.2f " +
      f"(${approx.size} approx pairs, ${exact.size} exact)")
    val ivf = similarity.Similarity.ivfTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    println(f"ivf recall@${similarity.Similarity.topK} (nProbe=3/10 partitions): " +
      f"${exact.intersect(ivf).size.toDouble / exact.size}%.2f")

    println("== plan check: brute-force knn should broadcast + codegen ==")
    similarity.Similarity.bruteForceTopK(spark, d).explain("formatted")

    println("== transitive dedup clusters (pairs -> connected components) ==")
    dedup.Dedup.dedupClusters(spark, d)
      .orderBy(org.apache.spark.sql.functions.col("cluster_size").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .show(6)

    println("== per-column profile audit ==")
    ops.Profile.profileCustomer(spark, d).show(truncate = false)

    println("== k-anonymized extract (suppression rate) ==")
    val kanon = ops.Privacy.kAnonymize(spark, d)
    val n = kanon.count()
    val suppressed = kanon.filter(org.apache.spark.sql.functions.col("nationkey").isNull).count()
    println(f"suppressed $suppressed of $n rows (k=${ops.Privacy.kThreshold})")

    println("== CDC merge (insert/update/keep split) ==")
    ops.Merge.cdcMerge(spark, d).groupBy("action").count().orderBy("action").show()

    println("== funnel: view -> click -> purchase ==")
    ops.Behavior.funnelCounts(spark, d).show()

    println("== repetition quality filters (most repetitive docs) ==")
    text.TextAnalysis.repetitionStats(spark, d)
      .orderBy(org.apache.spark.sql.functions.col("top_tok_frac").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .show(5)

    println("== small-file compaction + range clustering ==")
    val cdir = "/tmp/graft-demo-compact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cdir))
    Tables.orders(spark, d).repartition(32).write.parquet(s"$cdir/frag")
    ops.Compaction.compact(spark, s"$cdir/frag", s"$cdir/out", 10000)
    print("fragmented:  "); ops.Compaction.layoutStats(spark, s"$cdir/frag").show()
    print("compacted:   "); ops.Compaction.layoutStats(spark, s"$cdir/out").show()

    spark.stop()
  }
}
