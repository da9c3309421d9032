package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class SketchesSpec extends GraftTestBase {

  behavior of "orderSketches"

  it should "satisfy every in-query estimator error bound" in {
    val rows = Sketches.orderSketches(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"status ${r.getAs[String]("o_orderstatus")}: ") {
        r.getAs[Boolean]("hll_ok") shouldBe true
        r.getAs[Boolean]("p50_ok") shouldBe true
        r.getAs[Boolean]("p95_ok") shouldBe true
      }
    }
  }

  it should "carry exact companions consistent with the raw table" in {
    val rows = Sketches.orderSketches(spark, sf).collect()
    val nTotal = graft.Tables.orders(spark, sf).count()
    rows.map(_.getAs[Long]("n_rows")).sum shouldBe nTotal
    rows.foreach { r =>
      r.getAs[Long]("custkeys_exact") should be <= r.getAs[Long]("n_rows")
      r.getAs[Double]("price_min") should be <= r.getAs[Double]("price_max")
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
