package graft.ops

import graft.GraftTestBase

class QualitySpec extends GraftTestBase {

  behavior of "dqAudit"

  it should "report a complete, clean audit over the synthetic star schema" in {
    val m = Quality.dqAudit(spark, sf).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations")).toMap
    m.keySet shouldBe Set(
      "orders_null_custkey", "orders_nonpositive_price", "orders_dup_pk",
      "orders_orphan_custkey", "lineitem_orphan_orderkey",
      "lineitem_discount_range", "lineitem_ship_before_order")
    // the generator emits a referentially-intact star schema with unique
    // PKs — any nonzero here is an engine bug, not a data property
    m("orders_orphan_custkey") shouldBe 0L
    m("lineitem_orphan_orderkey") shouldBe 0L
    m("orders_dup_pk") shouldBe 0L
    m("orders_null_custkey") shouldBe 0L
    m.values.foreach(_ should be >= 0L)
  }

  behavior of "benfordAudit"

  it should "emit a leading-digit distribution with coherent frequencies" in {
    val rows = Quality.benfordAudit(spark, sf).collect()
    rows.length should be <= 9
    rows.foreach(_.getAs[String]("digit") should fullyMatch regex "[1-9]")
    rows.map(_.getAs[Double]("observed_freq")).sum shouldBe 1.0 +- 1e-9
    // Benford expectations over all 9 digits telescope to log10(10) = 1
    val expected = (1 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum
    expected shouldBe 1.0 +- 1e-12
    rows.map(_.getAs[Long]("n")).sum shouldBe
      graft.Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 0).count()
  }
}
