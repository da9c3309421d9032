package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class SketchesSpec extends GraftTestBase {

  behavior of "orderSketches"

  it should "estimate cardinality within HLL++ error bounds of the exact count" in {
    val rows = Sketches.orderSketches(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val exact = r.getAs[Long]("custkeys_exact")
      val approx = r.getAs[Long]("custkeys_approx")
      // default rsd = 0.05; allow 4 sigma
      math.abs(approx - exact).toDouble / exact should be < 0.2
    }
  }

  it should "produce percentiles inside the observed min/max and ordered" in {
    Sketches.orderSketches(spark, sf).collect().foreach { r =>
      val p50 = r.getAs[Double]("price_p50")
      val p95 = r.getAs[Double]("price_p95")
      p50 should be <= p95
      p50 should be >= r.getAs[Double]("price_min")
      p95 should be <= r.getAs[Double]("price_max")
    }
  }

  it should "aggregate partially (no plain sort-based fallback in the plan)" in {
    val plan = Sketches.orderSketches(spark, sf)
      .queryExecution.executedPlan.toString
    // HLL++ and quantile summaries must partial-aggregate map-side:
    // two HashAggregate/ObjectHashAggregate levels around one exchange
    plan should include("Exchange")
    "(?i)objecthashaggregate|hashaggregate".r
      .findAllIn(plan).size should be >= 2
  }
}
