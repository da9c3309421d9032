package graft.ops

import graft.GraftTestBase

/** Property specs for the round-9 catalog additions — each asserts the
  * operator's defining mathematical invariant on real data, beyond the
  * row-level oracle equality the driver grades. */
class Round9AdditionsSpec extends GraftTestBase {

  behavior of "giniRevenue (q_gini_dist)"

  it should "produce a Gini inside [0, 1) with positive mass" in {
    val r = Analytics.giniRevenue(spark, sf).head()
    r.getAs[Long]("total_cents") should be > 0L
    val g = r.getAs[Double]("gini")
    g should be >= 0.0
    g should be < 1.0
  }

  behavior of "winsorizedStats (q_trimmed_mean)"

  it should "bound both robust means by the clip percentiles" in {
    val r = Analytics.winsorizedStats(spark, sf).head()
    val lo = r.getAs[Long]("p05_cents").toDouble
    val hi = r.getAs[Long]("p95_cents").toDouble
    lo should be < hi
    val wm = r.getAs[Double]("winsor_mean_cents")
    val tm = r.getAs[Double]("trimmed_mean_cents")
    wm should (be >= lo and be <= hi)
    tm should (be >= lo and be <= hi)
  }

  behavior of "kalmanLevel (q_kalman)"

  it should "converge its gain to the steady-state Riccati fixed point" in {
    val r = TimeSeries.kalmanLevel(spark, sf).head()
    val q = TimeSeries.kalmanQ; val rr = TimeSeries.kalmanR
    // steady state: P* = (1-K)(P*+Q), K = (P*+Q)/(P*+Q+R)
    // => P*^2 + Q P* - Q R = 0
    val pStar = (-q + math.sqrt(q * q + 4 * q * rr)) / 2
    val kStar = (pStar + q) / (pStar + q + rr)
    val gain = r.getAs[Double]("gain")
    gain should (be > 0.0 and be < 1.0)
    // geometric convergence: at sf0.001's series length the gain sits
    // within ~5e-4 of the fixed point; the bound is the CONVERGENCE
    // claim, not machine precision
    math.abs(gain - kStar) should be < 1e-3
    r.getAs[Double]("p_var") should be > 0.0
  }

  behavior of "jsDivergence (q_js_div)"

  it should "stay inside [0, ln 2] with nonnegative one-sided KLs" in {
    val r = Behavior.jsDivergence(spark, sf).head()
    r.getAs[Double]("kl_a_to_mix") should be >= 0.0
    r.getAs[Double]("kl_b_to_mix") should be >= 0.0
    val js = r.getAs[Double]("js_nats")
    js should be >= 0.0
    js should be <= math.log(2.0) + 1e-9
  }

  behavior of "vocabRichness (q_chao1)"

  it should "estimate at least the observed vocabulary and bound the rates" in {
    val r = graft.text.TextAnalysis.vocabRichness(spark, sf).head()
    val v = r.getAs[Long]("v_types")
    r.getAs[Double]("chao1") should be >= v.toDouble
    val cov = r.getAs[Double]("gt_coverage")
    cov should (be >= 0.0 and be <= 1.0)
    val simp = r.getAs[Double]("simpson")
    simp should (be >= 0.0 and be <= 1.0)
  }

  behavior of "fleissKappa (q_fleiss)"

  it should "sum the vote histogram to N and keep kappa <= 1" in {
    val r = graft.text.TextAnalysis.fleissKappa(spark, sf).head()
    val n = r.getAs[Long]("n_docs")
    (r.getAs[Long]("v0") + r.getAs[Long]("v1") +
      r.getAs[Long]("v2") + r.getAs[Long]("v3")) shouldBe n
    r.getAs[Double]("fleiss_kappa") should be <= 1.0
    r.getAs[Double]("p_bar") should (be >= 0.0 and be <= 1.0)
  }

  behavior of "rmst (q_rmst)"

  it should "integrate to a value inside [0, tau] with a valid tail survival" in {
    val r = Behavior.rmst(spark, sf).head()
    val tau = Behavior.rmstTauH.toDouble
    val a = r.getAs[Double]("rmst_h")
    a should (be >= 0.0 and be <= tau)
    val sTau = r.getAs[Double]("s_at_tau")
    sTau should (be >= 0.0 and be <= 1.0)
  }

  behavior of "egoBetweenness (q_ego_betweenness)"

  it should "credit only nonnegative pair mass" in {
    val rows = Graph.egoBetweenness(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("n_pairs") should be > 0L
      r.getAs[Double]("ego_betweenness") should be >= 0.0
      // each pair contributes at most 1 (k >= 1)
      r.getAs[Double]("ego_betweenness") should be <=
        r.getAs[Long]("n_pairs").toDouble + 1e-9
    }
  }

  behavior of "pacfDailyRevenue (q_pacf)"

  it should "stay inside the correlation range at every lag" in {
    val rows = TimeSeries.pacfDailyRevenue(spark, sf).collect()
    rows.length shouldBe TimeSeries.pacfMaxLag
    rows.foreach(r => math.abs(r.getAs[Double]("pacf")) should be <= 1.05)
  }

  behavior of "bradleyTerry (q_bradley_terry)"

  it should "produce a normalized strength simplex consistent with wins" in {
    val rows = Analytics.bradleyTerry(spark, sf).collect()
    rows.length should be > 0
    val total = rows.map(_.getAs[Double]("bt_strength")).sum
    // strengths ship rounded to 6dp — 25 of them can drift ±25·5e-7
    total shouldBe 1.0 +- 2e-5
    rows.foreach(_.getAs[Double]("bt_strength") should be >= 0.0)
    // a nation with zero wins cannot out-rank one with wins
    val zeroMax = rows.filter(_.getAs[Long]("total_wins") == 0L)
      .map(_.getAs[Double]("bt_strength")).maxOption.getOrElse(0.0)
    val winMin = rows.filter(_.getAs[Long]("total_wins") > 0L)
      .map(_.getAs[Double]("bt_strength")).minOption.getOrElse(1.0)
    zeroMax should be <= winMin + 1e-9
  }
}
