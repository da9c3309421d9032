package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class XorChecksumSpec extends GraftTestBase {
  import spark.implicits._

  behavior of "XorChecksum"

  it should "be invariant under repartitioning (merge order independence)" in {
    val base = (1L to 10000L).toDF("x")
    val agg1 = base.repartition(1)
      .agg(GraftFunctions.xorChecksum(col("x"))).head.getLong(0)
    val agg32 = base.repartition(32)
      .agg(GraftFunctions.xorChecksum(col("x"))).head.getLong(0)
    agg1 shouldBe agg32
  }

  it should "detect any single-row difference and cancel duplicates" in {
    val a = Seq(1L, 2L, 3L).toDF("x")
      .agg(GraftFunctions.xorChecksum(col("x"))).head.getLong(0)
    val b = Seq(1L, 2L, 4L).toDF("x")
      .agg(GraftFunctions.xorChecksum(col("x"))).head.getLong(0)
    a should not be b
    // x ^ x = 0: a row included twice vanishes — checksum equality is
    // row-SET (xor-multiset) equality, the documented audit contract
    val dup = Seq(1L, 2L, 3L, 5L, 5L).toDF("x")
      .agg(GraftFunctions.xorChecksum(col("x"))).head.getLong(0)
    dup shouldBe a
  }

  it should "ignore nulls like SQL aggregates do" in {
    val withNulls = Seq(Some(7L), None, Some(9L)).toDF("x")
      .agg(GraftFunctions.xorChecksum(col("x"))).head.getLong(0)
    withNulls shouldBe (7L ^ 9L)
  }

  it should "be callable from SQL after registration" in {
    GraftFunctions.register(spark)
    Seq(3L, 5L).toDF("x").createOrReplaceTempView("xs")
    spark.sql("SELECT xor_checksum(x) FROM xs").head.getLong(0) shouldBe (3L ^ 5L)
  }
}
