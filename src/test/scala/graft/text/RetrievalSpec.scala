package graft.text

import graft.GraftTestBase

class RetrievalSpec extends GraftTestBase {

  behavior of "Retrieval"

  it should "score BM25 nonnegative with zero score iff no query term present" in {
    val rows = Retrieval.bm25(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val tfSum = Retrieval.queryTerms.indices
        .map(i => r.getAs[Long](s"tf_$i")).sum
      val s = r.getAs[Double]("bm25")
      s should be >= 0.0
      if (tfSum == 0) s shouldBe 0.0 else s should be > 0.0
    }
  }

  it should "fuse rankings with valid rank ranges and descending rrf" in {
    val rows = Retrieval.rrfFusion(spark, sf).collect()
    rows should have size 20
    val rrfs = rows.map(_.getAs[Double]("rrf")).toSeq
    rrfs shouldBe rrfs.sorted.reverse
    rows.foreach { r =>
      r.getAs[Long]("rank1") should be >= 1L
      r.getAs[Long]("rank2") should be >= 1L
    }
  }

  it should "bound nDCG in (0, 1] and keep the top-k frames lint-clean" in {
    val r = Retrieval.ndcgAtK(spark, sf).head()
    r.getAs[Double]("ndcg_at_k") should (be > 0.0 and be <= 1.0)
    r.getAs[Double]("dcg_at_k") should be <= r.getAs[Double]("idcg_at_k")
    // the 10-row top-k windows are bounded by construction (GlobalLimit
    // proof added to PlanLint) — no funnel findings
    graft.plans.PlanLint.lint(Retrieval.bm25(spark, sf)) shouldBe empty
  }
}
