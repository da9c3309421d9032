package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class LayoutSpec extends GraftTestBase {

  behavior of "Layout.zorderKey"

  it should "be a bijection on the 256x256 grid" in {
    import spark.implicits._
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val keys = grid.select(Layout.zorderKey(col("x"), col("y")).as("z"))
    keys.agg(countDistinct("z")).as[Long].head() shouldBe 256L * 256L
    keys.agg(min("z"), max("z")).as[(Long, Long)].head() shouldBe ((0L, 65535L))
  }

  it should "bound every top-8-bit bucket to a 16x16 tile" in {
    val audit = Layout.zorderAudit(spark, sf)
    audit.filter(
      col("max_x") - col("min_x") > 15 || col("max_y") - col("min_y") > 15)
      .count() shouldBe 0
    // and the buckets must actually partition the data
    audit.count() should be > 0L
  }
}
