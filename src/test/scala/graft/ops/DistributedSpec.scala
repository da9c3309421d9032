package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftTestBase

class DistributedSpec extends GraftTestBase {

  behavior of "Distributed.withRunningTotal"

  it should "match the window-form running total exactly, including ties" in {
    import spark.implicits._
    // deterministic synthetic data with duplicate (group, order) keys
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to 500
    } yield (g, (i * 7919) % 97, ((i * 31) % 13 + 1).toLong) // order has many ties
    val df = rows.toDF("g", "ord", "w")
    val got = Distributed.withRunningTotal(df, Seq("g"), Seq("ord"), "w", "cum")
    // ROWS-frame window with the same (implementation-defined but
    // consistent) tie order is not comparable row-by-row under ties —
    // compare at the last row of every (g, ord) key group, where both
    // renderings must agree regardless of intra-tie order
    val wantAtKey = df.groupBy("g", "ord").agg(sum("w").as("kw"))
      .select(col("g"), col("ord"),
        sum("kw").over(Window.partitionBy("g").orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum_at_key"))
    val gotAtKey = got.groupBy("g", "ord").agg(max("cum").as("cum_at_key_got"))
    wantAtKey.join(gotAtKey, Seq("g", "ord"))
      .filter(col("cum_at_key") =!= col("cum_at_key_got"))
      .count() shouldBe 0
  }

  it should "handle the no-group (global prefix sum) form" in {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 17 + 1).toLong)).toDF("k", "w")
    val got = Distributed.withRunningTotal(df, Seq.empty, Seq("k"), "w", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var cum = 0L
    (1 to 1000).foreach { i =>
      cum += i % 17 + 1
      got(i.toLong) shouldBe cum
    }
  }

  it should "spread work across many partitions (no single-task funnel)" in {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, 1L)).toDF("k", "w")
    val out = Distributed.withRunningTotal(df, Seq.empty, Seq("k"), "w", "cum")
    // parallelism = the session's shuffle width (NOT 1, the window form's)
    out.rdd.getNumPartitions shouldBe
      spark.sessionState.conf.numShufflePartitions
    // the final row carries the grand total
    out.agg(max("cum")).collect()(0).getLong(0) shouldBe 10000L
  }

  behavior of "Distributed.withRunningMaxExclusive"

  it should "match the exclusive-frame window max, with MinValue for first rows" in {
    import spark.implicits._
    val rows = for {
      g <- Seq("a", "b")
      i <- 1 to 400
    } yield (g, i, ((i * 7919) % 257).toLong)
    val df = rows.toDF("g", "ord", "w") // unique (g, ord) keys
    val got = Distributed.withRunningMaxExclusive(df, Seq("g"), Seq("ord"), "w", "pmax")
    val want = df.select(col("g"), col("ord"),
      max("w").over(Window.partitionBy("g").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, -1)).as("wmax"))
    got.join(want, Seq("g", "ord"))
      .filter(coalesce(col("wmax"), lit(Long.MinValue)) =!= col("pmax"))
      .count() shouldBe 0
  }

  behavior of "the _dist consumer renderings"

  it should "equal their window forms row-for-row" in {
    Analytics.weightedMedianPriceDist(spark, sf)
      .exceptAll(Analytics.weightedMedianPrice(spark, sf)).count() shouldBe 0
    Analytics.spearmanPriceQtyDist(spark, sf)
      .exceptAll(Analytics.spearmanPriceQty(spark, sf)).count() shouldBe 0
    graft.text.Curation.packShardsDist(spark, sf)
      .exceptAll(graft.text.Curation.packShards(spark, sf)).count() shouldBe 0
    Analytics.rfmSegmentsDist(spark, sf)
      .exceptAll(Analytics.rfmSegments(spark, sf)).count() shouldBe 0
  }

  it should "stay clean under PlanLint (the point of the rendering)" in {
    val lint = graft.plans.PlanLint.lint(
      graft.text.Curation.packShardsDist(spark, sf))
    lint.map(_.rule) should not contain "single-partition-exchange"
    lint.map(_.rule) should not contain "low-cardinality-window"
  }
}
