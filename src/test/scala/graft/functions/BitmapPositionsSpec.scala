package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** [[BitmapPositions]] is the decode direction of Spark's builtin bitmap
  * aggregates; its correctness contract is the ROUND-TRIP against
  * `bitmap_construct_agg`'s actual byte layout (LSB-first within a
  * byte), not a layout assumption — so the spec drives the builtin
  * encoder over boundary positions and asserts the decoder returns
  * exactly the input set. */
class BitmapPositionsSpec extends GraftTestBase {

  behavior of "bitmap_positions"

  it should "round-trip bitmap_construct_agg over boundary positions" in {
    // byte boundaries (7/8), word boundaries (31/32/63/64), both ends
    val ps = Seq(0L, 1L, 7L, 8L, 31L, 32L, 63L, 64L, 100L, 32767L)
    import spark.implicits._
    val got = ps.toDF("p")
      .agg(expr("bitmap_construct_agg(p)").as("bm"))
      .select(GraftFunctions.bitmapPositions(col("bm")).as("ps"))
      .head().getSeq[Long](0)
    got shouldBe ps.sorted
  }

  it should "agree with bitmap_count and decode bitmap_or_agg unions" in {
    import spark.implicits._
    val a = Seq(1L, 5L, 9L).toDF("p").agg(expr("bitmap_construct_agg(p)").as("bm"))
    val b = Seq(5L, 6L).toDF("p").agg(expr("bitmap_construct_agg(p)").as("bm"))
    val u = a.unionAll(b).agg(expr("bitmap_or_agg(bm)").as("bm"))
      .select(GraftFunctions.bitmapPositions(col("bm")).as("ps"),
        expr("bitmap_count(bm)").as("n"))
      .head()
    u.getSeq[Long](0) shouldBe Seq(1L, 5L, 6L, 9L)
    u.getLong(1) shouldBe 4L
  }

  it should "decode the empty bitmap to an empty array" in {
    import spark.implicits._
    val got = Seq(3L).toDF("p").filter(col("p") < 0)
      .agg(expr("bitmap_construct_agg(p)").as("bm"))
      .select(GraftFunctions.bitmapPositions(col("bm")).as("ps"))
      .head()
    // empty-group bitmap_construct_agg yields an all-zero (or null) bitmap
    if (!got.isNullAt(0)) got.getSeq[Long](0) shouldBe Seq.empty
  }

  it should "work as the registered SQL function" in {
    spark.sql(
      """SELECT bitmap_positions(bitmap_construct_agg(p)) AS ps
        |FROM VALUES (2L), (11L) AS t(p)""".stripMargin)
      .head().getSeq[Long](0) shouldBe Seq(2L, 11L)
  }
}
