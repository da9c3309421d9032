package graft.ops

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class BloomPruneSpec extends GraftTestBase {

  behavior of "BloomPrune"

  it should "never produce false negatives and match the exact semi-join" in {
    val fact = graft.Tables.orders(spark, sf)
    // selective dim: customers from one nation only
    val dim = graft.Tables.customer(spark, sf)
      .filter(col("c_nationkey") === 3)
      .select(col("c_custkey").as("o_custkey"))
    val exact = fact.join(dim, Seq("o_custkey"), "left_semi")
    val pruned = BloomPrune.prunedSemiJoin(fact, dim, "o_custkey",
      expectedItems = 1000)
    pruned.count() shouldBe exact.count()
    pruned.exceptAll(exact).count() shouldBe 0
    exact.exceptAll(pruned).count() shouldBe 0
  }

  it should "prune most non-matching rows before the join at the configured fpp" in {
    val fact = graft.Tables.orders(spark, sf)
    val dim = graft.Tables.customer(spark, sf)
      .filter(col("c_nationkey") === 3)
      .select(col("c_custkey").as("o_custkey"))
    val bytes = BloomPrune.buildFilter(dim, "o_custkey", 1000, 0.01)
    val kept = fact.filter(BloomPrune.mightContain(col("o_custkey"), bytes)).count()
    val matching = fact.join(dim, Seq("o_custkey"), "left_semi").count()
    val total = fact.count()
    kept should be >= matching // no false negatives, ever
    // at fpp=1% the bloom pass keeps matches + ~1% of the rest
    kept should be <= (matching + (total - matching) / 20)
  }

  it should "keep the probe inside whole-stage codegen" in {
    val dim = graft.Tables.customer(spark, sf).select(col("c_custkey"))
    val bytes = BloomPrune.buildFilter(dim, "c_custkey", 1000)
    val plan = graft.Tables.orders(spark, sf)
      .filter(BloomPrune.mightContain(col("o_custkey"), bytes))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a whole-stage codegen span
    plan should include regex "\\*\\(\\d+\\) Filter bloom_might_contain"
  }
}
