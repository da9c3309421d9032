package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class AnalyticsSpec extends GraftTestBase {

  behavior of "pivotOrderCounts"

  it should "put every order in exactly one status column" in {
    val rows = Analytics.pivotOrderCounts(spark, sf).collect()
    val total = rows.map(r =>
      r.getAs[Long]("n_f") + r.getAs[Long]("n_o") + r.getAs[Long]("n_p")).sum
    total shouldBe graft.Tables.orders(spark, sf).count()
  }

  behavior of "unpivotOrderMeasures"

  it should "emit one long row per (status, measure) cell" in {
    val df = Analytics.unpivotOrderMeasures(spark, sf)
    val statuses = graft.Tables.orders(spark, sf)
      .select("o_orderstatus").distinct().count()
    df.count() shouldBe statuses * 2
    df.select("measure").distinct().collect().map(_.getString(0)).sorted shouldBe
      Array("n_orders", "sum_price")
  }

  behavior of "groupingSetsCustomers"

  it should "produce leaf, per-region, and grand-total levels with matching totals" in {
    val rows = Analytics.groupingSetsCustomers(spark, sf).collect()
    val byGid = rows.groupBy(_.getAs[Int]("gid"))
    byGid.keySet shouldBe Set(0, 1, 3)
    val grand = byGid(3).head.getAs[Long]("n_customers")
    byGid(1).map(_.getAs[Long]("n_customers")).sum shouldBe grand
    byGid(0).map(_.getAs[Long]("n_customers")).sum shouldBe grand
    grand shouldBe graft.Tables.customer(spark, sf).count()
  }

  behavior of "percentilesByStatus"

  it should "order p50 <= p90 within [min, max]" in {
    Analytics.percentilesByStatus(spark, sf).collect().foreach { r =>
      val (p50, p90) = (r.getAs[Double]("price_p50"), r.getAs[Double]("price_p90"))
      p50 should be <= p90
      p50 should be >= r.getAs[Double]("price_min")
      p90 should be <= r.getAs[Double]("price_max")
    }
  }

  behavior of "momentsByReturnFlag"

  it should "match Spark's native var_samp/stddev_samp/corr to float tolerance" in {
    val ours = Analytics.momentsByReturnFlag(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(var_samp("l_quantity").as("v"), stddev_samp("l_extendedprice").as("s"),
        corr("l_quantity", "l_extendedprice").as("c"))
      .collect().foreach { r =>
        val o = ours(r.getString(0))
        o.getAs[Double]("var_qty") shouldBe r.getAs[Double]("v") +- 1e-6
        o.getAs[Double]("std_price") shouldBe r.getAs[Double]("s") +- 1e-4
        o.getAs[Double]("corr_qty_price") shouldBe r.getAs[Double]("c") +- 1e-9
      }
  }

  behavior of "nationsPerRegion"

  it should "sort nation names inside each region roster" in {
    Analytics.nationsPerRegion(spark, sf).collect().foreach { r =>
      val names = r.getAs[String]("nations").split(",")
      names.length.toLong shouldBe r.getAs[Long]("n_nations")
      names.toSeq shouldBe names.toSeq.sorted
    }
  }

  behavior of "windowFrameBattery"

  it should "satisfy the per-partition frame invariants" in {
    val rows = Analytics.windowFrameBattery(spark, sf).collect()
    rows should not be empty
    rows.groupBy(_.getAs[String]("o_orderstatus")).foreach { case (_, part) =>
      // last/second value are whole-partition constants
      part.map(_.getAs[Double]("last_price")).distinct should have length 1
      if (part.length >= 2)
        part.map(_.getAs[Double]("second_price")).distinct should have length 1
      // exactly the partition-first row has an empty (-3,-1) frame,
      // exactly the partition-last row has no lead
      val firsts = part.filter(r => r.isNullAt(r.fieldIndex("trailing3_price")))
      firsts should have length 1
      part.count(r => r.isNullAt(r.fieldIndex("next_price"))) shouldBe 1
      // the partition-first row's running first_value is its own price
      firsts.head.getAs[Double]("first_price") shouldBe
        firsts.head.getAs[Double]("o_totalprice")
    }
  }

  behavior of "conditionalAggBattery"

  it should "agree with direct filters per priority" in {
    val rows = Analytics.conditionalAggBattery(spark, sf).collect()
    val orders = graft.Tables.orders(spark, sf)
    rows.foreach { r =>
      val pri = r.getAs[String]("o_orderpriority")
      val grp = orders.filter(col("o_orderpriority") === pri)
      r.getAs[Long]("n_big") shouldBe grp.filter(col("o_totalprice") > 200000).count()
      r.getAs[Boolean]("all_positive") shouldBe true
      // top_order really is the max-price row of the group (price ties
      // broken by key, so compare via the same composite)
      val top = grp.orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
        .select("o_orderkey").head.getLong(0)
      r.getAs[Long]("top_order") shouldBe top
    }
  }

  behavior of "checksumAudit"

  it should "change when any row changes and be partitioning-invariant" in {
    val a = Analytics.checksumAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Analytics.checksumAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    a shouldBe b // deterministic across runs
    a.size should be >= 2
  }

  behavior of "regexpBattery"

  it should "extract anchored words consistent with split" in {
    Analytics.regexpBattery(spark, sf)
      .join(graft.Tables.part(spark, sf), "p_partkey")
      .select("p_name", "first_word", "last_word", "starts_early")
      .collect().foreach { r =>
        val words = r.getString(0).split(" ")
        r.getString(1) shouldBe words.head
        r.getString(2) shouldBe words.last
        r.getBoolean(3) shouldBe (r.getString(0).head <= 'g')
      }
  }

  it should "plan one Window node / one sort exchange for all five functions" in {
    val plan = Analytics.windowFrameBattery(spark, sf)
      .queryExecution.executedPlan.toString
    "Window \\[".r.findAllIn(plan).size shouldBe 1
  }

  behavior of "zscorePrices"

  it should "standardize against agreeing group stats and broadcast the stats join" in {
    val out = Analytics.zscorePrices(spark, sf).cache()
    try {
      // recompute mean/std per flag with Spark's native aggregates; the
      // power-sum rendering must agree to float tolerance
      val native = graft.Tables.lineitem(spark, sf)
        .groupBy("l_returnflag")
        .agg(avg("l_extendedprice").as("m"), stddev_samp("l_extendedprice").as("s"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      out.collect().foreach { r =>
        val (m, s) = native(r.getAs[String]("l_returnflag"))
        val expected = (r.getAs[Double]("l_extendedprice") - m) / s
        r.getAs[Double]("z_price") shouldBe expected +- 1e-3
      }
      out.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
    } finally out.unpersist()
  }

  behavior of "weightedMedianPrice"

  it should "pick the smallest price whose cumulative weight reaches half the total" in {
    val rows = Analytics.weightedMedianPrice(spark, sf).collect()
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.length shouldBe 3
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val wm = r.getAs[Double]("weighted_median_price")
      val grp = li.filter(_._1 == flag)
      val tot = grp.map(_._3).sum // integral doubles: exact
      (grp.filter(_._2 <= wm).map(_._3).sum * 2) should be >= tot
      val smaller = grp.map(_._2).filter(_ < wm)
      if (smaller.nonEmpty)
        (grp.filter(_._2 <= smaller.max).map(_._3).sum * 2) should be < tot
      r.getAs[Double]("total_weight") shouldBe tot
    }
  }

  behavior of "spearmanPriceQty"

  it should "agree with a driver-side rank correlation and stay in [-1, 1]" in {
    val rows = Analytics.spearmanPriceQty(spark, sf).collect()
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def minRanks(xs: Array[Double]): Array[Long] = {
      val sorted = xs.sorted
      // min-rank = 1 + count of strictly smaller values
      val firstIdx = scala.collection.mutable.HashMap.empty[Double, Long]
      var i = 0
      while (i < sorted.length) {
        firstIdx.getOrElseUpdate(sorted(i), i + 1L); i += 1
      }
      xs.map(firstIdx)
    }
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val rho = r.getAs[Double]("spearman_rho")
      rho should (be >= -1.0 and be <= 1.0)
      val grp = li.filter(_._1 == flag)
      val rp = minRanks(grp.map(_._2)).map(_.toDouble)
      val rq = minRanks(grp.map(_._3)).map(_.toDouble)
      val n = grp.length.toDouble
      val (sx, sy) = (rp.sum, rq.sum)
      val sxy = rp.zip(rq).map { case (a, b) => a * b }.sum
      val sxx = rp.map(a => a * a).sum
      val syy = rq.map(a => a * a).sum
      val expected = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      rho shouldBe expected +- 1e-9
    }
  }

  it should "match the windowed reference forms row-for-row (scale renderings)" in {
    // the pre-aggregated forms are what SparkEntry registers; the
    // rank-over-raw-facts windows are the semantic reference
    Analytics.spearmanPriceQty(spark, sf)
      .exceptAll(Analytics.spearmanPriceQtyWindowed(spark, sf)).count() shouldBe 0
    Analytics.weightedMedianPrice(spark, sf)
      .exceptAll(Analytics.weightedMedianPriceWindowed(spark, sf)).count() shouldBe 0
  }

  behavior of "chiSquareStatusPriority"

  it should "agree with a driver-side chi-square and bound Cramér's V in [0, 1]" in {
    val r = Analytics.chiSquareStatusPriority(spark, sf).collect()
    r.length shouldBe 1
    val row = r(0)
    val cells = graft.Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val n = cells.values.sum
    val rT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val chi2 = cells.toSeq.sortBy(_._1).map { case ((st, pr), o) =>
      val num = BigDecimal(o) * BigDecimal(n) - BigDecimal(rT(st)) * BigDecimal(cT(pr))
      (num * num).toDouble / (BigDecimal(n) * BigDecimal(rT(st)) * BigDecimal(cT(pr))).toDouble
    }.sum
    row.getAs[Long]("n_rows") shouldBe n
    row.getAs[Int]("dof") shouldBe (rT.size - 1) * (cT.size - 1)
    row.getAs[Double]("chi2") shouldBe chi2 +- 1e-4
    val v = row.getAs[Double]("cramers_v")
    v should (be >= 0.0 and be <= 1.0)
  }

  behavior of "heavyHitterParts"

  it should "keep every planted guaranteed-heavy item with valid lower bounds" in {
    val rows = Analytics.heavyHitterParts(spark, sf).collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      withClue(s"flag ${r.getAs[String]("l_returnflag")}: ") {
        // three planted hot_* items each carry ~23% of the flag's rows —
        // far above the N/16 SpaceSaving guarantee threshold
        r.getAs[Long]("n_guaranteed") shouldBe 3L
        r.getAs[Boolean]("all_guaranteed_present") shouldBe true
        r.getAs[Boolean]("bounds_valid") shouldBe true
      }
    }
  }

  behavior of "rfmSegments"

  it should "score 1-5 on every axis and conserve customers and spend" in {
    val rows = Analytics.rfmSegments(spark, sf).collect()
    rows.foreach { r =>
      r.getAs[Int]("r") should (be >= 1 and be <= 5)
      r.getAs[Int]("f") should (be >= 1 and be <= 5)
      r.getAs[Int]("m") should (be >= 1 and be <= 5)
    }
    val o = graft.Tables.orders(spark, sf)
    rows.map(_.getAs[Long]("n_customers")).sum shouldBe
      o.select("o_custkey").distinct().count()
    val spend = o.agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    rows.map(_.getAs[Double]("cell_spend")).sum shouldBe spend +- 1e-4
  }

  behavior of "lorenzCustomerRevenue"

  it should "conserve customers and revenue with a monotone share ending at 100%" in {
    val rows = Analytics.lorenzCustomerRevenue(spark, sf).collect()
      .sortBy(_.getAs[Int]("decile"))
    rows.map(_.getAs[Int]("decile")) shouldBe (1 to 10)
    val o = graft.Tables.orders(spark, sf)
    rows.map(_.getAs[Long]("n_customers")).sum shouldBe
      o.select("o_custkey").distinct().count()
    val total = o.agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    rows.map(_.getAs[Double]("decile_revenue")).sum shouldBe total +- 1e-4
    val shares = rows.map(_.getAs[Long]("cum_share_bp"))
    shares.zip(shares.tail).foreach { case (a, b) => b should be >= a }
    shares.last shouldBe 10000L
    // top decile must carry MORE than its population share (skew exists)
    shares.head should be > 1000L
  }

  behavior of "corrMatrixLineitem"

  it should "agree with Spark's native corr on every pair and bound all values" in {
    val got = Analytics.corrMatrixLineitem(spark, sf).collect()
      .map(r => (r.getAs[String]("var_a"), r.getAs[String]("var_b")) ->
        r.getAs[Double]("corr")).toMap
    got.size shouldBe 6
    val li = graft.Tables.lineitem(spark, sf)
    got.foreach { case ((a, b), c) =>
      c should (be >= -1.0 and be <= 1.0)
      val native = li.agg(corr(col(a), col(b))).head().getDouble(0)
      c shouldBe native +- 1e-6
    }
  }

  behavior of "percentileDiscByStatus"

  it should "return values the data contains at the exact discrete rank" in {
    val rows = Analytics.percentileDiscByStatus(spark, sf).collect()
    val byStatus = graft.Tables.orders(spark, sf)
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
    rows.foreach { r =>
      val vs = byStatus(r.getAs[String]("o_orderstatus")).map(_._2).sorted
      Seq(0.25 -> "p25_disc", 0.5 -> "p50_disc", 0.75 -> "p75_disc").foreach {
        case (q, c) =>
          // smallest value whose cumulative share reaches q
          val expect = vs(math.max(0, math.ceil(q * vs.length).toInt - 1))
          r.getAs[Double](c) shouldBe expect
      }
    }
  }

  behavior of "iqrOutliers"

  it should "fence with exact discrete quartiles and count outliers" in {
    val rows = graft.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0),
        java.math.BigDecimal.valueOf(r.getDouble(1))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()))
      .groupBy(_._1)
    val out = Analytics.iqrOutliers(spark, sf).collect()
    out.length shouldBe rows.size
    out.foreach { r =>
      val cents = rows(r.getString(0)).map(_._2).sorted
      val n = cents.length
      // percentile_disc(q): smallest value with cume_dist >= q
      def disc(q: Double) = cents(math.ceil(q * n).toInt.max(1) - 1)
      val (q1, q3) = (disc(0.25), disc(0.75))
      r.getAs[Long]("q1") shouldBe q1
      r.getAs[Long]("q3") shouldBe q3
      r.getAs[Long]("n_orders") shouldBe n.toLong
      r.getAs[Long]("n_low_outliers") shouldBe
        cents.count(c => 2 * c < 2 * q1 - 3 * (q3 - q1)).toLong
      r.getAs[Long]("n_high_outliers") shouldBe
        cents.count(c => 2 * c > 2 * q3 + 3 * (q3 - q1)).toLong
    }
    // a degenerate (zero-width) IQR would make every fence trivial
    out.foreach(r => r.getAs[Long]("q3") should be > r.getAs[Long]("q1"))
  }

  behavior of "theilSenTrend"

  it should "match the brute-force median-of-pairwise-slopes per priority" in {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date](1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    val out = Analytics.theilSenTrend(spark, sf).collect()
    out.length shouldBe daily.size
    out.foreach { r =>
      val series = daily(r.getString(0)).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield (series(j)._2 - series(i)._2).toDouble /
          (series(j)._1 - series(i)._1).toDouble).sorted
      val n = slopes.length
      r.getAs[Long]("n_pairs") shouldBe n.toLong
      val want = (slopes((n - 1) / 2) + slopes(n / 2)) / 2 / 100.0
      r.getAs[Double]("slope_per_day") shouldBe want +- 1e-12
    }
  }

  behavior of "kendallTauQtyDiscount"

  it should "match the naive all-row-pairs tau-b per flag" in {
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    val out = Analytics.kendallTauQtyDiscount(spark, sf).collect()
    out.length shouldBe rows.size
    out.foreach { r =>
      val xs = rows(r.getString(0)).map(t => (t._2, t._3))
      var conc = 0L; var disc = 0L; var tq = 0L; var td = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        val (qi, di) = xs(i); val (qj, dj) = xs(j)
        if (qi == qj) tq += 1
        if (di == dj) td += 1
        if (qi != qj && di != dj) {
          if ((qi < qj) == (di < dj)) conc += 1 else disc += 1
        }
      }
      val n = xs.length.toLong
      val n0 = n * (n - 1) / 2
      // naive tq counts pairs tied on q (including both-tied); the
      // marginal formula in the engine counts the same set
      r.getAs[Long]("n") shouldBe n
      r.getAs[Double]("concordant") shouldBe conc.toDouble
      r.getAs[Double]("discordant") shouldBe disc.toDouble
      val want = (conc - disc).toDouble /
        (math.sqrt((n0 - tq).toDouble) * math.sqrt((n0 - td).toDouble))
      r.getAs[Double]("tau_b") shouldBe want +- 1e-6
    }
  }

  behavior of "hodgesLehmannQty"

  it should "match the naive median of all Walsh averages per flag" in {
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val out = Analytics.hodgesLehmannQty(spark, sf).collect()
    out.length shouldBe rows.size
    out.foreach { r =>
      val xs = rows(r.getString(0)).map(_._2)
      val sums = (for {
        i <- xs.indices; j <- i until xs.length
      } yield xs(i) + xs(j)).sorted
      // lower weighted median: smallest s with 2·(#sums ≤ s) ≥ total,
      // i.e. the sorted element at index ceil(total/2) − 1
      val total = sums.length.toLong
      val want = sums(((total + 1) / 2 - 1).toInt).toDouble / 2.0
      r.getAs[Double]("hl_estimate") shouldBe want
    }
  }

  behavior of "discountElasticity"

  it should "match a naive per-row log-log weighted OLS per flag" in {
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    val out = Analytics.discountElasticity(spark, sf).collect()
    out.length shouldBe rows.size
    out.foreach { r =>
      val xs = rows(r.getString(0))
      val n = xs.size.toDouble
      val lx = xs.map(t => math.log(1.0 - t._3))
      val ly = xs.map(t => math.log(t._2))
      val sx = lx.sum; val sy = ly.sum
      val sxy = lx.zip(ly).map(t => t._1 * t._2).sum
      val sxx = lx.map(x => x * x).sum; val syy = ly.map(y => y * y).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      r.getAs[Long]("n_rows") shouldBe xs.size.toLong
      r.getAs[Double]("elasticity") shouldBe slope +- 1e-4
      r.getAs[Double]("r2") shouldBe r2 +- 1e-4
    }
  }

  behavior of "gumbelMonthlyMax"

  it should "match a driver-side method-of-moments Gumbel fit" in {
    val maxima = graft.Tables.orders(spark, sf)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(max(col("o_totalprice").cast("decimal(18,2)")).as("mx"))
      .collect().map(_.getDecimal(1).doubleValue())
    val n = maxima.length.toDouble
    val mean = maxima.sum / n
    val sd = math.sqrt(maxima.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    val p99 = mu - beta * math.log(-math.log(0.99))
    val r = Analytics.gumbelMonthlyMax(spark, sf).collect().head
    r.getAs[Long]("n_months") shouldBe maxima.length.toLong
    r.getAs[Double]("beta") shouldBe beta +- 1e-4
    r.getAs[Double]("mu") shouldBe mu +- 1e-4
    r.getAs[Double]("return_level_p99") shouldBe p99 +- 1e-4
    // sanity: the fitted 1-in-100 level sits above the fitted location
    r.getAs[Double]("return_level_p99") should be > r.getAs[Double]("mu")
  }

  behavior of "octileShapeByFlag"

  it should "match driver-side discrete octiles and the two ratios" in {
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val out = Analytics.octileShapeByFlag(spark, sf).collect()
    out.length shouldBe rows.size
    out.foreach { r =>
      val xs = rows(r.getString(0))
      def disc(p: Double): Double = xs(math.ceil(p * xs.length).toInt - 1)
      val e = (1 to 7).map(i => disc(i * 0.125))
      r.getAs[Double]("q1") shouldBe e(1)
      r.getAs[Double]("median") shouldBe e(3)
      r.getAs[Double]("q3") shouldBe e(5)
      r.getAs[Double]("bowley_skew") shouldBe
        ((e(5) + e(1) - 2.0 * e(3)) / (e(5) - e(1))) +- 1e-6
      r.getAs[Double]("moors_kurtosis") shouldBe
        (((e(6) - e(4)) + (e(2) - e(0))) / (e(5) - e(1))) +- 1e-6
    }
  }
}
