package graft.text

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class DecontamSpec extends GraftTestBase {

  behavior of "ngramOverlap"

  it should "exclude eval docs and bound overlap by the gram count" in {
    val out = Decontam.ngramOverlap(spark, sf).cache()
    out.filter(col("doc_id") % Decontam.evalMod === 0).count() shouldBe 0
    out.filter(col("n_overlap") > col("n_grams")).count() shouldBe 0
    out.filter(col("overlap_bp") < 0 || col("overlap_bp") > 10000)
      .count() shouldBe 0
    // flag definition: 5*overlap >= grams, never on zero-gram docs
    out.filter(col("contaminated") =!=
        (col("n_grams") > 0 &&
         col("n_overlap") * Decontam.contamPctX5 >= col("n_grams")))
      .count() shouldBe 0
  }

  it should "cover every train doc exactly once, including short ones" in {
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % Decontam.evalMod =!= 0).count()
    val out = Decontam.ngramOverlap(spark, sf)
    out.count() shouldBe docs
    out.select("doc_id").distinct().count() shouldBe docs
  }

  it should "flag a planted verbatim copy of an eval doc" in {
    import spark.implicits._
    // doc 0 is in the eval slice (0 % 97 == 0); a verbatim copy under a
    // train id must come back fully contaminated (overlap_bp = 10000)
    val evalText = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select("text").as[String].head()
    val planted = Seq((0L, evalText), (1L, evalText),
      (2L, "completely disjoint vocabulary zyx wvu tsr qpo nml kji hgf edc"))
      .toDF("doc_id", "text")
    val w = split(col("text"), " ")
    val grams = planted.select(col("doc_id"),
      Decontam.gramsFromWords(w).as("grams"))
    val evalG = grams.filter(col("doc_id") === 0L)
      .select(explode(col("grams")).as("g")).distinct()
    val train = grams.filter(col("doc_id") =!= 0L)
      .select(col("doc_id"), explode_outer(col("grams")).as("g"))
      .join(evalG.withColumn("hit", lit(1)), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("g")).as("n_grams"), count(col("hit")).as("n_overlap"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    train(1L)._1 shouldBe train(1L)._2 // copy: every gram overlaps
    train(2L)._2 shouldBe 0L           // disjoint: none do
  }

  behavior of "gramsFromWords"

  it should "return an empty array below the gram length, not a reversed sequence" in {
    import spark.implicits._
    val out = Seq("one two three", "a b c d e", "a b c d e f")
      .toDF("text")
      .select(Decontam.gramsFromWords(split(col("text"), " ")).as("g"))
      .select(org.apache.spark.sql.functions.size(col("g")).as("n"))
      .as[Int].collect()
    out shouldBe Array(0, 1, 2)
  }

  behavior of "minhashDecontam"

  it should "only flag train docs, with bands within the signature width" in {
    val out = Decontam.minhashDecontam(spark, sf).cache()
    out.filter(col("doc_id") % Decontam.evalMod === 0).count() shouldBe 0
    out.filter(col("max_bands") < 1 ||
      col("max_bands") > graft.dedup.Dedup.numBands).count() shouldBe 0
    out.filter(col("n_eval_matches") < 1).count() shouldBe 0
  }

  it should "broadcast the eval side (no shuffle of train bands for the join)" in {
    val plan = Decontam.minhashDecontam(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  behavior of "decontamStream"

  it should "match the batch flag rule on every micro-batch prefix" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val query = Decontam
      .decontamStream(input.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("decontam_spec")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "a b c d e f"),   // verbatim copy: both grams collide
        (2L, "a b c d x y"),   // shares no full 5-gram
        (3L, "a b"))           // below gram length: zero grams
      query.processAllAvailable()
      input.addData(
        (4L, "z a b c d e"))   // suffix overlap: 1 of 2 grams collides
      query.processAllAvailable()
      val got = spark.table("decontam_spec").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_overlap"),
            r.getAs[Long]("overlap_bp"), r.getAs[Boolean]("contaminated"))))
        .toMap
      got(1L) shouldBe ((2L, 2L, 10000L, true))
      got(2L) shouldBe ((2L, 0L, 0L, false))
      got(3L) shouldBe ((0L, 0L, 0L, false))
      got(4L) shouldBe ((2L, 1L, 5000L, true)) // 5*1 >= 2
    } finally query.stop()
  }
}
