package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** Invariant specs for the round-9 TPC-H closure (Q2/Q9/Q11/Q16/Q20/Q21
  * over the derived partsupp / receipt-commit relations) — each asserts
  * the shape's defining property beyond the row-level oracle equality
  * the driver grades. */
class TpchCloseSpec extends GraftTestBase {

  behavior of "partsupp derivation"

  it should "cover every lineitem (partkey, suppkey) pair with in-range attributes" in {
    val ps = TpchClose.partsupp(spark, sf)
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
    // the dbgen invariant Q9/Q20 rely on: lineitem pairs ⊆ partsupp
    pairs.join(ps, Seq("ps_partkey", "ps_suppkey"), "left_anti").count() shouldBe 0L
    ps.count() shouldBe pairs.count()
    ps.filter(col("ps_availqty") < 1 || col("ps_availqty") > 9999).count() shouldBe 0L
    ps.filter(col("ps_supplycost_cents") < 100 ||
      col("ps_supplycost_cents") > 99999).count() shouldBe 0L
  }

  behavior of "q2MinCostSupplier"

  it should "report, per part, exactly the region-minimum cost (ties included)" in {
    val rows = TpchClose.q2MinCostSupplier(spark, sf).collect()
    rows.length should be > 0
    // per part, every surviving row carries one shared cost — the minimum
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (_, rs) =>
      rs.map(_.getAs[Double]("supplycost")).distinct.length shouldBe 1
    }
  }

  behavior of "q9ProductProfit"

  it should "ship profit as the exact e4 integer and its double rendering" in {
    val rows = TpchClose.q9ProductProfit(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Double]("sum_profit") shouldBe r.getAs[Long]("profit_e4") / 10000.0
    }
    // the color filter restricts parts, so profit rows stay within
    // nations × years bounds
    rows.map(r => (r.getAs[String]("nation"), r.getAs[Int]("o_year")))
      .distinct.length shouldBe rows.length
  }

  behavior of "q11ImportantStock"

  it should "keep exactly the parts above the 1/2000 share threshold" in {
    val kept = TpchClose.q11ImportantStock(spark, sf)
    val n = kept.count()
    n should be > 0L
    // every kept part's value strictly exceeds total/2000 — recompute
    // the total independently from the derived relation
    val asia = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val total = TpchClose.partsupp(spark, sf)
      .join(asia, col("ps_suppkey") === col("s_suppkey"))
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty")))
      .head().getLong(0)
    kept.collect().foreach { r =>
      val v = math.round(r.getAs[Double]("stock_value") * 100)
      (v * 2000L) should be > total
    }
  }

  behavior of "q21WaitingSuppliers"

  it should "count only sole-late suppliers on multi-supplier F orders" in {
    val rows = TpchClose.q21WaitingSuppliers(spark, sf).collect()
    rows.length should be > 0
    rows.foreach(_.getAs[Long]("numwait") should be > 0L)
    // cross-check one structural bound: numwait total cannot exceed the
    // number of late lineitems on F orders
    val li = TpchClose.lineitemDated(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_receiptdate") > col("l_commitdate"))
      .count()
    rows.map(_.getAs[Long]("numwait")).sum should be <= li
  }

  behavior of "q20PotentialPromo"

  it should "only surface suppliers holding over half the shipped quantity" in {
    val rows = TpchClose.q20PotentialPromo(spark, sf).collect()
    rows.length should be > 0
    // distinct supplier projection: no duplicate suppliers
    rows.map(_.getAs[Long]("s_suppkey")).distinct.length shouldBe rows.length
  }
}
