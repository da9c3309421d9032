package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

class ParetoSpec extends GraftTestBase {

  behavior of "Pareto.skylineParts"

  it should "equal the brute-force non-dominated set" in {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    // brute force: anti-join against dominators
    val dominated = parts.as("p").join(parts.as("q"),
      col("q.p_retailprice") <= col("p.p_retailprice") &&
        col("q.p_size") >= col("p.p_size") &&
        (col("q.p_retailprice") < col("p.p_retailprice") ||
          col("q.p_size") > col("p.p_size")), "left_semi")
      .select(col("p.p_partkey"))
    val want = parts.join(dominated, Seq("p_partkey"), "left_anti")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val got = Pareto.skylineParts(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    got shouldBe want
    got should not be empty
  }

  it should "keep only frontier rows: strictly increasing size as price rises" in {
    val rows = Pareto.skylineParts(spark, sf)
      .select("p_retailprice", "p_size")
      .distinct()
      .orderBy("p_retailprice")
      .collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(0) < b.getDouble(0))
        assert(a.getInt(1) < b.getInt(1),
          s"size must strictly RISE as price rises on a min-price/max-size frontier: $a -> $b")
      case _ => ()
    }
  }
}
