package graft.ops

import graft.GraftTestBase
import graft.similarity.Similarity

/** Property specs for the round-8 late additions — each asserts the
  * operator's defining mathematical invariant on real data, beyond the
  * row-level oracle equality the driver grades. */
class Round8AdditionsSpec extends GraftTestBase {

  behavior of "shapleyAttribution"

  it should "satisfy the efficiency axiom: shares sum to v(full) - v(empty)" in {
    val rows = Behavior.shapleyAttribution(spark, sf).collect()
    rows should have length 4
    val total = rows.head.getAs[Long]("total_attributed")
    rows.map(_.getAs[Long]("shapley_x24")).sum shouldBe 24L * total
    // attributions are a credit SPLIT of real conversions
    total should be > 0L
  }

  behavior of "conformalIntervals"

  it should "cover the test split at roughly the nominal 90% rate" in {
    val rows = Analytics.conformalIntervals(spark, sf).collect()
    rows.length should be > 0
    val n = rows.map(_.getAs[Long]("n_test")).sum
    val cov = rows.map(_.getAs[Long]("covered")).sum
    // the marginal guarantee is >= 0.9 in expectation over calibration
    // draws; on one fixed split allow sampling slack below, none above 1
    cov.toDouble / n should be >= 0.75
    cov should be <= n
    rows.foreach(_.getAs[Long]("qhat_cents") should be >= 0L)
  }

  behavior of "dtwDistance"

  it should "never exceed the lockstep L1 and report a sane day count" in {
    val r = TimeSeries.dtwDistance(spark, sf).head()
    r.getAs[Boolean]("contained") shouldBe true
    r.getAs[Long]("dtw") should be <= r.getAs[Long]("lockstep_l1")
    r.getAs[Long]("dtw") should be >= 0L
    r.getAs[Int]("n_days") shouldBe 30
  }

  behavior of "cliffDelta"

  it should "stay in [-1, 1] and agree with its integer classification" in {
    val r = Behavior.cliffDelta(spark, sf).head()
    val den = r.getAs[Long]("n0") * r.getAs[Long]("n1")
    math.abs(r.getAs[Long]("delta_num")) should be <= den
    val d = math.abs(r.getAs[Double]("cliff_delta"))
    val expected =
      if (d < 0.147) "negligible"
      else if (d < 0.33) "small"
      else if (d < 0.474) "medium"
      else "large"
    r.getAs[String]("magnitude") shouldBe expected
  }

  behavior of "tripletMining"

  it should "order positives, semi-hards, and hard negatives correctly" in {
    val rows = Similarity.tripletMining(spark, sf).collect()
    rows should have length Similarity.tripletAnchorCap
    rows.foreach { r =>
      // the semi-hard negative, when present, sits strictly inside the
      // (pos - margin, pos) band and never beats the hard negative
      if (!r.isNullAt(r.fieldIndex("semi_id"))) {
        val pos = r.getAs[Double]("pos_cos")
        val semi = r.getAs[Double]("semi_cos")
        semi should be < pos
        semi should be > pos - Similarity.tripletMarginMilli / 1000.0
        semi should be <= r.getAs[Double]("neg_cos")
      }
    }
  }

  behavior of "brierCalibration"

  it should "produce basis-point probabilities and a bounded Brier score" in {
    val rows = Behavior.brierCalibration(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val p = r.getAs[Long]("p_bp")
      p should be >= 0L
      p should be <= 10000L
      val b = r.getAs[Double]("brier")
      b should be >= 0.0
      b should be <= 1.0
    }
  }

  behavior of "jackknifeClusterSe"

  it should "report positive SEs and a positive design effect" in {
    val r = Analytics.jackknifeClusterSe(spark, sf).head()
    r.getAs[Long]("g_clusters") should be > 1L
    r.getAs[Double]("se_iid_cents") should be > 0.0
    r.getAs[Double]("se_jack_cents") should be > 0.0
    r.getAs[Double]("design_effect") should be > 0.0
  }

  behavior of "wassersteinDistance vs cramerDistance"

  it should "bound W1 by the value range and keep Cramer below W1's scale" in {
    val w = Behavior.wassersteinDistance(spark, sf).head()
    w.getAs[Long]("w1_scaled") should be >= 0L
    // W1 between distributions on [min, max] cents is at most the range
    val c = Behavior.cramerDistance(spark, sf).head()
    c.getAs[Double]("cramer_cents") should be >= 0.0
    // energy = 2 * cramer by construction
    c.getAs[Double]("energy_cents") shouldBe
      (2.0 * c.getAs[Double]("cramer_cents") +- 1e-5)
    // |F_A - F_B| <= 1 everywhere, so the Cramer integral (of the
    // SQUARED gap) never exceeds the W1 integral (of the plain gap)
    c.getAs[Double]("cramer_cents") should be <=
      w.getAs[Double]("w1_cents") + 1e-6
  }

  behavior of "permutationTest"

  it should "produce a valid add-one p-value consistent with its count" in {
    val r = Behavior.permutationTest(spark, sf).head()
    val k = r.getAs[Long]("k_perms")
    k shouldBe Behavior.permK.toLong
    val nGe = r.getAs[Long]("n_ge")
    nGe should be >= 0L
    nGe should be <= k
    r.getAs[Double]("p_value") shouldBe
      ((1.0 + nGe) / (k + 1.0) +- 1e-6)
  }

  behavior of "aaCalibration"

  it should "run 8 null experiments with a plausible false-positive count" in {
    val rows = Behavior.aaCalibration(spark, sf).collect()
    rows should have length 8
    // expectation is 5% of 8 = 0.4; allow up to half firing before
    // calling the assignment broken
    rows.count(_.getAs[Boolean]("false_positive")) should be <= 4
  }

  behavior of "priceIndices"

  it should "keep Fisher between Laspeyres and Paasche in every month" in {
    val rows = Analytics.priceIndices(spark, sf).collect()
    rows.length should be > 12
    rows.foreach { r =>
      val l = r.getAs[Double]("laspeyres")
      val p = r.getAs[Double]("paasche")
      val f = r.getAs[Double]("fisher")
      f should be >= math.min(l, p) - 1e-6
      f should be <= math.max(l, p) + 1e-6
    }
  }

  behavior of "hitsBipartite"

  it should "rank authorities with consistent shares and degrees" in {
    val rows = graft.ops.Graph.hitsBipartite(spark, sf).collect()
    rows should have length 20
    val walks = rows.map(_.getAs[Long]("authority_walks"))
    walks.toSeq shouldBe walks.sorted.reverse.toSeq
    rows.foreach { r =>
      r.getAs[Long]("degree") should be > 0L
      r.getAs[Long]("share_ppm") should be <= 1000000L
    }
  }

  behavior of "ahash suite"

  it should "bound hash bits and keep the funnel monotone" in {
    val h = graft.multimodal.Multimodal.ahashCensus(spark, sf).collect()
    h.foreach { r =>
      val bits = r.getAs[Int]("bits_set")
      bits should be >= 0
      bits should be <= 64
      java.lang.Long.bitCount(r.getAs[Long]("ahash_hi")) +
        java.lang.Long.bitCount(r.getAs[Long]("ahash_lo")) shouldBe bits
      r.getAs[Long]("ahash_hi") should be < 4294967296L
      r.getAs[Long]("ahash_lo") should be < 4294967296L
    }
    val f = graft.multimodal.Multimodal.mediaCurationFunnel(spark, sf)
      .collect().sortBy(_.getAs[Int]("stage_id")).map(_.getAs[Long]("n_images"))
    f(0) should be >= f(1)
    f(1) should be >= f(2)
    f(2) should be > 0L
  }

  behavior of "bitextMining"

  it should "bound margins by mutuality arithmetic and accept only mutual pairs" in {
    val rows = Similarity.bitextMining(spark, sf).collect()
    rows should have length (Similarity.bitextQueryCap / 2)
    rows.foreach { r =>
      // 2k·cos(top1) over the sum of two top-k neighborhoods that BOTH
      // contain a cosine >= cos(top1) on the forward side keeps the
      // margin positive and finite
      r.getAs[Double]("margin") should be > 0.0
      if (r.getAs[Boolean]("accepted")) {
        r.getAs[Boolean]("mutual") shouldBe true
        r.getAs[Double]("margin") should be > 1.06
      }
    }
  }

  behavior of "deterministic sketches"

  it should "keep detHll registers coherent and inside its error bound" in {
    val r = Sketches.detHll(spark, sf).head()
    r.getAs[Int]("m") shouldBe Sketches.hllDetM
    val v = r.getAs[Long]("v_empty")
    v should (be >= 0L and be <= Sketches.hllDetM.toLong)
    // sum over 64 registers of 2^-M_j with M_j in [0, 27]
    val sumInv = r.getAs[Double]("sum_inv")
    sumInv should (be > 0.0 and be <= Sketches.hllDetM.toDouble)
    // at sf0.001 (150 keys over 64 registers) the small-range
    // linear-counting branch must be the one that fired
    v should be > 0L
    r.getAs[Boolean]("hll_ok") shouldBe true
    val est = r.getAs[Double]("hll_est")
    val n = r.getAs[Long]("n_exact").toDouble
    math.abs(est - n) / n should be <= Sketches.hllDetBound
  }

  it should "make kmvDistinct exact below k and never overrun the heap" in {
    val r = Sketches.kmvDistinct(spark, sf).head()
    val seen = r.getAs[Long]("k_seen")
    seen should be <= Sketches.kmvK.toLong
    r.getAs[Long]("hk") should (be >= 0L and be < (1L << 60))
    // 15 users at sf0.001: the under-filled sketch IS the exact count
    if (seen < Sketches.kmvK) {
      r.getAs[Double]("kmv_est") shouldBe r.getAs[Long]("n_exact").toDouble
      r.getAs[Double]("rel_err") shouldBe 0.0
    }
    r.getAs[Boolean]("kmv_ok") shouldBe true
  }

  behavior of "paired and ordered nonparametric tests"

  it should "keep McNemar consistent with its discordant cells" in {
    val r = Behavior.mcnemarTest(spark, sf).head()
    val b = r.getAs[Long]("b_count"); val c = r.getAs[Long]("c_count")
    b should be >= 0L; c should be >= 0L
    (b + c) should be <= r.getAs[Long]("n_pairs")
    if (b + c > 0) {
      val chi2 = r.getAs[Double]("chi2")
      chi2 shouldBe ((b - c) * (b - c)).toDouble / (b + c) +- 1e-9
      // continuity correction can only shrink the statistic
      r.getAs[Double]("chi2_cc") should be <= chi2
    }
  }

  it should "bound Cochran's Q below its algebraic maximum" in {
    val r = Behavior.cochranQ(spark, sf).head()
    r.getAs[Int]("k") shouldBe 3
    r.getAs[Long]("t_total") should be <= 3L * r.getAs[Long]("n_users")
    val q = r.getAs[Double]("q_stat")
    q should be >= 0.0
    // Q <= (k-1) * n_users always (each block contributes at most k-1)
    q should be <= 2.0 * r.getAs[Long]("n_users")
  }

  it should "split Mood's median table in half by construction" in {
    val r = Behavior.moodMedianTest(spark, sf).head()
    r.getAs[Int]("k_groups") shouldBe 5
    val n = r.getAs[Long]("n"); val a = r.getAs[Long]("a_total")
    // strictly-above count can never reach half plus the median's mass
    a should be < n
    a should be <= n / 2
    r.getAs[Double]("chi2") should be >= 0.0
    r.getAs[Double]("median_value") should be > 0.0
  }

  it should "keep Jonckheere's JT2 inside [0, 2·E2] with a coherent direction" in {
    val r = Analytics.jonckheereTerpstra(spark, sf).head()
    val jt2 = r.getAs[Long]("jt2"); val e2 = r.getAs[Long]("e2")
    e2 should be > 0L
    jt2 should be >= 0L
    jt2 should be <= 2 * e2 // max JT = sum of all cross-group pairs
    val z = r.getAs[Double]("z_stat")
    r.getAs[String]("direction") shouldBe
      (if (z > 0) "increasing" else "decreasing")
  }

  it should "keep Durbin-Watson inside [0, 4] with rho = 1 - dw/2" in {
    val r = TimeSeries.durbinWatson(spark, sf).head()
    r.getAs[Long]("n_days") should be > 2L
    val dw = r.getAs[Double]("dw")
    dw should be >= 0.0
    dw should be <= 4.0
    r.getAs[Double]("rho_hat") shouldBe (1.0 - dw / 2.0) +- 1e-6
  }

  behavior of "readability, CEM, and MASE"

  it should "reproduce Flesch from its own counted inputs" in {
    val rows = graft.text.TextAnalysis.readability(spark, sf).collect()
    rows.length should be > 400
    rows.foreach { r =>
      val w = r.getAs[Long]("words"); val sy = r.getAs[Long]("syllables")
      val se = r.getAs[Long]("sentences")
      w should be > 0L
      // corpus has no terminal punctuation: chunk fallback everywhere
      se shouldBe (w + 19) / 20
      val expected = 206.835 - 1.015 * (w.toDouble / se) -
        84.6 * (sy.toDouble / w)
      r.getAs[Double]("flesch") shouldBe expected +- 1e-5
      r.getAs[Boolean]("easy_read") shouldBe (expected >= 60.0)
    }
  }

  it should "conserve treated units across CEM matching and pruning" in {
    val r = Behavior.cemAtt(spark, sf).head()
    r.getAs[Long]("strata_matched") should be <=
      r.getAs[Long]("strata_total")
    val treatedTotal = graft.Tables.customer(spark, sf)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .count()
    r.getAs[Long]("treated_matched") +
      r.getAs[Long]("treated_pruned") shouldBe treatedTotal
    r.getAs[Long]("control_matched") should be > 0L
  }

  it should "agree MASE with its integer-sum closed form" in {
    val r = TimeSeries.maseForecast(spark, sf).head()
    val n = r.getAs[Long]("n_days")
    val n7 = r.getAs[Long]("n7")
    n7 shouldBe math.max(0L, n - 7)
    if (n7 > 0 && r.getAs[Long]("sae1") > 0) {
      r.getAs[Double]("mase") shouldBe
        (r.getAs[Long]("sae7").toDouble * (n - 1)) /
          (r.getAs[Long]("sae1").toDouble * n7) +- 1e-5
    }
  }

  behavior of "textrank, changepoint, capture-recapture, rate test"

  it should "conserve TextRank mass within the damping envelope" in {
    val rows = graft.text.TextAnalysis.textRank(spark, sf).collect()
    rows.length shouldBe 15
    rows.foreach { r =>
      val rank = r.getAs[Long]("rank_scaled")
      // every node's floor-division fixed point sits in [0.15, ~k]·scale
      rank should be >= 150000L
      rank should be < 31L * 1000000L
      r.getAs[Long]("cooc_weight") should be > 0L
    }
    // ordered by rank descending
    val ranks = rows.map(_.getAs[Long]("rank_scaled")).toSeq
    ranks shouldBe ranks.sorted.reverse
  }

  it should "flag exactly one best split with R2 in [0,1]" in {
    val rows = TimeSeries.changepoint(spark, sf).collect()
    rows.length should be > 100
    rows.count(_.getAs[Boolean]("is_best_split")) shouldBe 1
    rows.foreach { r =>
      val g = r.getAs[Double]("gain_r2")
      g should be >= 0.0
      g should be <= 1.0
      r.getAs[Long]("n_left") + r.getAs[Long]("n_right") shouldBe
        rows.length + 1L
    }
  }

  it should "keep Chapman's estimator at least the overlap size" in {
    val r = Behavior.captureRecapture(spark, sf).head()
    val m = r.getAs[Long]("m_both")
    m should be <= r.getAs[Long]("n1")
    m should be <= r.getAs[Long]("n2")
    val nHat = r.getAs[Double]("n_hat")
    // N-hat >= max(n1, n2) whenever m <= min(n1, n2)
    nHat should be >= math.max(r.getAs[Long]("n1"),
      r.getAs[Long]("n2")).toDouble - 1e-9
  }

  it should "nest the rate-ratio CI around the point estimate" in {
    val r = Behavior.poissonRateTest(spark, sf).head()
    r.getAs[Long]("k1") should be > 0L
    r.getAs[Long]("k2") should be > 0L
    r.getAs[Double]("ci_lo") should be < r.getAs[Double]("rate_ratio")
    r.getAs[Double]("ci_hi") should be > r.getAs[Double]("rate_ratio")
    // z and the CI must agree on significance up to rounding: CI
    // excludes 1 iff |z'| > 1.96 for the Wald z', and the conditional
    // z is close to it on balanced counts
    if (r.getAs[Boolean]("significant_95"))
      (r.getAs[Double]("ci_lo") > 1.0 || r.getAs[Double]("ci_hi") < 1.0) shouldBe true
  }

  it should "hold the F2 identities around the AMS estimate" in {
    val r = Sketches.amsF2(spark, sf).head()
    val f2 = r.getAs[Long]("f2_exact")
    val rows = graft.Tables.events(spark, sf).count()
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // Cauchy-Schwarz sandwich: F1²/F0 <= F2 <= F1²
    f2 should be >= rows * rows / users
    f2 should be <= rows * rows
    r.getAs[Double]("f2_ams") should be > 0.0
    r.getAs[Boolean]("ams_ok") shouldBe true
  }
}
