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

  behavior of "schemaDiff"

  it should "classify added, removed, and retyped columns" in {
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("legacy", StringType)))
    val v2 = StructType(Seq(
      StructField("id", LongType), StructField("price", DecimalType(10, 2)),
      StructField("added_col", IntegerType)))
    Quality.schemaDiff(v1, v2).toSet shouldBe Set(
      ("added_col", "added", "", "int"),
      ("legacy", "removed", "string", ""),
      ("price", "retyped", "double", "decimal(10,2)"))
    Quality.schemaDiff(v1, v1) shouldBe empty
  }

  behavior of "revenueAnomalies"

  it should "only flag days beyond 2 sigma of their own trailing baseline" in {
    val rows = Quality.revenueAnomalies(spark, sf).collect()
    rows.foreach(r => math.abs(r.getAs[Double]("z")) should be > 2.0)
    // baseline excludes the current day, so a quiet series flags little:
    // the detector must not fire on more than a quarter of days
    val nDays = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    rows.length.toLong should be <= nDays / 4
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

  behavior of "psiDrift"

  it should "emit nonnegative PSI terms that conserve row counts and sum to the total" in {
    val rows = Quality.psiDrift(spark, sf).collect()
    rows should not be empty
    // every (p-q)·ln(p/q) term is >= 0 (both factors share sign); allow
    // the -0.0 of 6-decimal rounding
    rows.foreach(_.getAs[Double]("psi_term") should be >= -1e-6)
    // psi_total is the same constant on every row and equals the term sum
    rows.map(_.getAs[Double]("psi_total")).distinct.length shouldBe 1
    rows.map(_.getAs[Double]("psi_term")).sum shouldBe
      rows.head.getAs[Double]("psi_total") +- 1e-3
    // the two periods partition the orders table exactly
    rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum shouldBe
      graft.Tables.orders(spark, sf).count()
  }
}
