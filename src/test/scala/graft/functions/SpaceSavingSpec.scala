package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class SpaceSavingSpec extends GraftTestBase {

  behavior of "SpaceSaving"

  it should "keep every guaranteed-heavy item with a valid lower bound on skewed data" in {
    import spark.implicits._
    // Zipf-ish skew: item i appears ~N/i times, far more distinct items
    // than sketch capacity, shuffled deterministically so input order is
    // adversarial rather than grouped
    val items = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
    val shuffled = new scala.util.Random(42).shuffle(items)
    val n = shuffled.length.toLong
    val trueCounts = shuffled.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val sketch = shuffled.toDF("v")
      .repartition(8) // force partial sketches + merges
      .agg(SpaceSaving.udaf(col("v")).as("hh"))
      .head().getAs[Map[String, Long]]("hh")
    sketch.size should be <= SpaceSaving.capacity
    // guarantee 1: true count > N/k => item kept
    val threshold = n / SpaceSaving.capacity
    trueCounts.filter(_._2 > threshold).keys.foreach { k =>
      sketch.keySet should contain(k)
    }
    // guarantee 2: exposed lower bounds never exceed the true count
    sketch.foreach { case (k, lower) =>
      lower should be <= trueCounts(k)
    }
  }

  it should "be callable from SQL after registration" in {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("ss_spec")
    val m = spark.sql("SELECT space_saving(v) AS hh FROM ss_spec")
      .head().getAs[Map[String, Long]]("hh")
    m shouldBe Map("x" -> 2L, "y" -> 1L)
  }

  it should "count exactly when distinct values fit within capacity" in {
    import spark.implicits._
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    val sketch = new scala.util.Random(1).shuffle(items).toDF("v")
      .repartition(4)
      .agg(SpaceSaving.udaf(col("v")).as("hh"))
      .head().getAs[Map[String, Long]]("hh")
    // no evictions ever happen, so errors are zero and counts exact
    sketch shouldBe Map("a" -> 50L, "b" -> 30L, "c" -> 7L)
  }
}
