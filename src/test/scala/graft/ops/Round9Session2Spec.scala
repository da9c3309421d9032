package graft.ops

import graft.GraftTestBase

/** Property specs for the round-9 session-2 catalog additions — each
  * asserts the operator's defining mathematical invariant on real data,
  * beyond the row-level oracle equality the driver grades. */
class Round9Session2Spec extends GraftTestBase {

  behavior of "andersonDarling (q_anderson_darling)"

  it should "produce a nonnegative A2 over the full purchase sample" in {
    val r = Behavior.andersonDarling(spark, sf).head()
    r.getAs[Double]("ad_a2") should be >= 0.0
    (r.getAs[Long]("n_a") + r.getAs[Long]("n_b")) should be > 0L
  }

  behavior of "kendallW (q_kendall_w)"

  it should "bound W to [0, 1] and carry the chi-square link" in {
    val r = Analytics.kendallW(spark, sf).head()
    val w = r.getAs[Double]("kendall_w")
    w should (be >= 0.0 and be <= 1.0)
    val k = r.getAs[Long]("k"); val n = r.getAs[Long]("n")
    r.getAs[Double]("chi2_w") shouldBe
      (n * (k - 1) * w +- 1e-4) // both rounded at 6 dp
  }

  behavior of "pageTrend (q_page_trend)"

  it should "keep L inside its combinatorial bounds" in {
    val r = Analytics.pageTrend(spark, sf).head()
    val k = r.getAs[Long]("k"); val n = r.getAs[Long]("n")
    val l = r.getAs[Double]("l")
    // L = Σ c_j R_j with midrank sums: extremes are the sorted and
    // anti-sorted pairings of c = 1..k with rank sums summing to
    // n·k(k+1)/2 overall
    val rankTotal = n.toDouble * k * (k + 1) / 2
    l should be > 0.0
    l should be < rankTotal * k // loose sanity ceiling
    r.getAs[Double]("page_z").isNaN shouldBe false
  }

  behavior of "jaroWinklerPairs (q_jaro_winkler)"

  it should "emit only same-block pairs above the threshold" in {
    val rows = graft.dedup.Dedup.jaroWinklerPairs(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val a = r.getAs[String]("name_a"); val b = r.getAs[String]("name_b")
      a.split(" ").head shouldBe b.split(" ").head
      val jw = r.getAs[Double]("jw_sim")
      jw should (be >= 0.8 and be <= 1.0)
      a should be < b
    }
  }

  behavior of "goodTuring (q_good_turing)"

  it should "keep adjusted counts and masses inside probability bounds" in {
    val rows = graft.text.TextAnalysis.goodTuring(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Long]("n_r") should be > 0L
      r.getAs[Double]("r_star") should be >= 0.0
      val p = r.getAs[Double]("p_gt")
      p should (be >= 0.0 and be <= 1.0)
      val p0 = r.getAs[Double]("p0_unseen")
      p0 should (be > 0.0 and be < 1.0)
    }
  }

  behavior of "tokenizerFertility (q_fertility)"

  it should "bound fertility below by 1 and compression by the merge rate" in {
    val rows = graft.text.TextAnalysis.tokenizerFertility(spark, sf).collect()
    rows should have size 5
    rows.foreach { r =>
      // every nonempty token yields >= 1 subword
      r.getAs[Double]("fertility") should be >= 1.0
      // chars (incl. separators) per ~3-char subword can't exceed 6
      val cps = r.getAs[Double]("chars_per_subword")
      cps should (be > 0.0 and be <= 6.0)
    }
  }

  behavior of "burrowsDelta (q_burrows_delta)"

  it should "score every unordered source pair exactly once, nonnegatively" in {
    val rows = graft.text.TextAnalysis.burrowsDelta(spark, sf).collect()
    rows should have size 190 // C(20, 2)
    rows.foreach { r =>
      r.getAs[String]("source_a") should be < r.getAs[String]("source_b")
      r.getAs[Double]("burrows_delta") should be >= 0.0
      r.getAs[Long]("n_words") shouldBe 20L
    }
  }

  behavior of "ecodOutliers (q_ecod)"

  it should "rank the max of two nonnegative tail aggregations" in {
    val rows = graft.similarity.Similarity.ecodOutliers(spark, sf).collect()
    rows should have size 20
    rows.foreach { r =>
      val l = r.getAs[Double]("o_left"); val rt = r.getAs[Double]("o_right")
      l should be >= 0.0
      rt should be >= 0.0
      r.getAs[Double]("ecod_score") shouldBe (math.max(l, rt) +- 1e-3)
    }
  }

  behavior of "ccfClicksPurchases (q_ccf)"

  it should "emit 15 lags of correlations inside [-1, 1]" in {
    val rows = TimeSeries.ccfClicksPurchases(spark, sf).collect()
    rows should have size 15
    rows.foreach { r =>
      math.abs(r.getAs[Double]("ccf")) should be <= 1.0
      r.getAs[Long]("n_pairs") should be > 0L
    }
  }

  behavior of "ipwAte (q_ipw_ate)"

  it should "agree with the naive contrast on independent treatment" in {
    val r = Analytics.ipwAte(spark, sf).head()
    // discount ⟂ quantity in this corpus → near-flat propensity → IPW
    // must reproduce the naive difference (the A/A-calibration shape)
    val naive = r.getAs[Double]("naive_diff")
    r.getAs[Double]("ate_hajek") shouldBe (naive +- 0.05)
    r.getAs[Double]("ate_ht") shouldBe (naive +- 0.05)
    r.getAs[Long]("n_treated") should be > 0L
  }

  behavior of "brunnerMunzel (q_brunner_munzel)"

  it should "point its statistic the same way as the stochastic order" in {
    val r = Behavior.brunnerMunzel(spark, sf).head()
    val p = r.getAs[Double]("p_hat")
    p should (be >= 0.0 and be <= 1.0)
    r.getAs[Double]("df") should be > 0.0
    // sign(W) = sign(p̂ − ½): both ∝ R̄₂ − (N+1)/2 (rank-total identity)
    val w = r.getAs[Double]("bm_w")
    if (math.abs(p - 0.5) > 1e-9) math.signum(w) shouldBe math.signum(p - 0.5)
  }

  behavior of "metaFixedEffect (q_meta_fixed)"

  it should "nest the pooled estimate inside its own CI with bounded I2" in {
    val r = Behavior.metaFixedEffect(spark, sf).head()
    val or = r.getAs[Double]("pooled_or")
    r.getAs[Double]("ci_low") should be <= or
    r.getAs[Double]("ci_high") should be >= or
    val i2 = r.getAs[Double]("i_squared")
    i2 should (be >= 0.0 and be < 1.0)
    r.getAs[Double]("cochran_q") should be >= 0.0
    r.getAs[Long]("n_weeks") should be > 0L
  }
}
