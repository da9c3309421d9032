package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Component contracts for the round-6 additions; exact values are
  * graded by the DuckDB oracle — these assert the internal invariants
  * the oracle can't see. */
class NewOpsR6Spec extends GraftTestBase {

  behavior of "Curation.padWaste"

  it should "conserve tokens and respect bucket arithmetic" in {
    val rows = graft.text.Curation.padWaste(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val (b, n, real, padded) = (r.getAs[Long]("bucket_len"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("real_tokens"),
        r.getAs[Long]("padded_tokens"))
      b % graft.text.Curation.padBucket shouldBe 0
      b should be <= graft.text.Curation.padMaxLen
      padded shouldBe n * b            // every doc pads to its bucket len
      real should be <= padded
      real should be > (padded - n * graft.text.Curation.padBucket) // within one bucket step
      r.getAs[Double]("waste_ratio") should (be >= 0.0 and be < 1.0)
    }
  }

  behavior of "Dedup.boilerplateRatio"

  it should "bound the ratio and agree with a driver-side df replica on totals" in {
    val rows = graft.dedup.Dedup.boilerplateRatio(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_boiler"))
      b should be <= n
      r.getAs[Double]("boiler_ratio") should (be >= 0.0 and be <= 1.0)
    }
    // the corpus plants near-dup docs, so SOME boilerplate must surface
    rows.map(_.getAs[Long]("n_boiler")).sum should be > 0L
  }

  behavior of "TextAnalysis.scriptProfile"

  it should "emit ratios that partition the character mass" in {
    val rows = graft.text.TextAnalysis.scriptProfile(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val sum = r.getAs[Double]("letter_ratio") + r.getAs[Double]("digit_ratio") +
        r.getAs[Double]("space_ratio") + r.getAs[Double]("other_ratio")
      sum shouldBe 1.0 +- 3e-6 // four independent 6-dp roundings
      r.getAs[Long]("chars_total") should be > 0L
    }
  }

  behavior of "Similarity.mmrSelect"

  it should "pick k distinct candidates, starting from the pure-relevance argmax" in {
    import graft.functions.GraftFunctions.cosineSim
    val rows = graft.similarity.Similarity.mmrSelect(spark, sf).collect()
      .sortBy(_.getAs[Long]("sel_round"))
    rows should have size graft.similarity.Similarity.mmrK.toLong.toInt
    rows.map(_.getAs[Long]("vec_id")).distinct should have size rows.length
    // round 1 has no diversity penalty: it must be the plain top-1 by
    // rounded query similarity
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val top1 = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), round(cosineSim(col("embedding"),
        org.apache.spark.sql.functions.typedLit(q)), 4).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(1).head().getAs[Long]("vec_id")
    rows.head.getAs[Long]("vec_id") shouldBe top1
  }

  behavior of "Curation.temperatureMixture"

  it should "boost low-resource strata and keep both share columns normalized" in {
    val rows = graft.text.Curation.temperatureMixture(spark, sf).collect()
    rows should not be empty
    rows.map(_.getAs[Double]("p_raw")).sum shouldBe 1.0 +- 1e-4
    rows.map(_.getAs[Double]("p_temp")).sum shouldBe 1.0 +- 1e-4
    // temperature flattens: the smallest stratum boosts, the largest shrinks
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTok.head.getAs[Double]("boost") should be >= byTok.last.getAs[Double]("boost")
  }

  behavior of "Graph.neighborhoodFunction"

  it should "grow monotonically and keep the HLL estimate inside its bound" in {
    val rows = graft.ops.Graph.neighborhoodFunction(spark, sf).collect()
      .sortBy(_.getAs[Long]("hop"))
    rows should not be empty
    rows.map(_.getAs[Long]("n_reach")).toSeq shouldBe sorted
    // hop 0 is exactly the seed set (capped)
    rows.head.getAs[Long]("n_reach") should be <= graft.ops.Graph.seedCap.toLong
    // the HyperBall estimator must hold its documented error contract
    rows.foreach(_.getAs[Boolean]("hll_ok") shouldBe true)
  }
}
