package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class SkewSpec extends GraftTestBase {

  behavior of "saltedAggregate"

  it should "equal the unsalted aggregation exactly" in {
    // decimal sums: exact and associative, so the two-level merge must
    // reproduce the single-level result bit-for-bit (double sums would
    // differ in ulps from reordering alone)
    val li = graft.Tables.lineitem(spark, sf)
    val qty = sum(col("l_quantity").cast("decimal(18,2)"))
    val plain = li.groupBy(col("l_suppkey").as("k"))
      .agg(count("*").as("n"), qty.as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAggregate(
      li, col("l_suppkey"), col("l_orderkey"), buckets = 8,
      Seq(("n", count("*"), sum(col("n"))),
        ("q", qty, sum(col("q")))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    salted shouldBe plain
  }

  it should "actually spread a hot key over multiple salt buckets" in {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val buckets = hot
      .select(Skew.salt(monotonically_increasing_id(), 8).as("s"))
      .distinct().count()
    buckets should be > 4L
  }

  behavior of "saltedJoinLarge"

  it should "equal the plain join exactly" in {
    val o = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.Tables.customer(spark, sf).select("c_custkey", "c_name")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoinLarge(o, "o_custkey", "o_orderkey", c, "c_custkey", 4)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    salted shouldBe plain
  }

  it should "grade the salted-join audit equal to the unsalted form" in {
    val rows = Skew.saltedJoinAudit(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_above_avg")))).toMap
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val byFlag = li.groupBy(_._1)
    rows.keySet shouldBe byFlag.keySet
    byFlag.foreach { case (f, vs) =>
      val avg = vs.map(v => BigDecimal(v._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.length
      rows(f)._1 shouldBe vs.length.toLong
      rows(f)._2 shouldBe vs.count(_._2 > avg).toLong
    }
  }

  it should "be deterministic across retries (salt from hash, not rand)" in {
    val li = graft.Tables.lineitem(spark, sf).limit(100)
    val a = li.select(Skew.salt(col("l_orderkey"), 8).as("s")).collect().map(_.getInt(0))
    val b = li.select(Skew.salt(col("l_orderkey"), 8).as("s")).collect().map(_.getInt(0))
    a shouldBe b
  }
}
