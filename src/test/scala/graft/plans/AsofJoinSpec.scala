package graft.plans

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class AsofJoinSpec extends GraftTestBase {

  behavior of "AsofJoin.broadcastAsof"

  it should "match the window rendering row-for-row" in {
    val win = graft.ops.TimeSeries.asofLatestClick(spark, sf)
    val bc = graft.ops.TimeSeries.asofLatestClickBroadcast(spark, sf)
    bc.count() shouldBe win.count()
    bc.exceptAll(win).count() shouldBe 0
    win.exceptAll(bc).count() shouldBe 0
  }

  it should "plan as the custom exec with no exchange or sort on the fact side" in {
    val plan = graft.ops.TimeSeries.asofLatestClickBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("AsofJoin")
    // the whole point: the fact side streams through shuffle- and
    // sort-free (the window rendering cannot avoid both)
    plan should not include "Exchange"
    plan should not include regex("(?i)\\bsort\\b")
    val winPlan = graft.ops.TimeSeries.asofLatestClick(spark, sf)
      .queryExecution.executedPlan.toString
    winPlan should include("Exchange")
  }

  it should "emit null payload before the first dimension row and exact matches on ties" in {
    import spark.implicits._
    val fact = Seq(
      (1L, 100L, 10L), (2L, 100L, 20L), (3L, 100L, 30L),
      (4L, 200L, 15L))
      .toDF("f_id", "k", "t")
    val dim = Seq(
      (100L, 20L, 7L, "at20"),  // tie with fact t=20: inclusive match
      (100L, 25L, 8L, "at25"))
      .toDF("k", "t", "s", "tag")
    val out = AsofJoin.broadcastAsof(
      fact.withColumn("s", lit(0L) + col("f_id") + 100), dim,
      key = "k", factTime = "t", factSeq = "s", dimTime = "t", dimSeq = "s",
      payload = Seq("tag" -> "asof_tag"))
      .select("f_id", "asof_tag").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    out(1L) shouldBe None              // before any dim row
    out(2L) shouldBe Some("at20")      // tie at t=20 matches inclusively
    out(3L) shouldBe Some("at25")      // latest at-or-before 30
    out(4L) shouldBe None              // key with no dim rows at all
  }
}
