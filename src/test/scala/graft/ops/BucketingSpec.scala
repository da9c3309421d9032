package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

class BucketingSpec extends GraftTestBase {

  behavior of "Bucketing"

  it should "plan a co-located join with zero exchanges and matching results" in {
    // the warehouse location outlives the per-JVM derby metastore; a
    // stale directory makes CREATE TABLE fail with LOCATION_ALREADY_EXISTS
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-bucketdb"))
    spark.sql(
      "CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '/tmp/graft-bucketdb'")
    Bucketing.writeBucketed(
      Tables.orders(spark, sf), "bucketdb.orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf), "bucketdb.lineitem_b", "l_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark,
        "bucketdb.orders_b", "bucketdb.lineitem_b", "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      plan should include("SortMergeJoin")
      plan should not include "Exchange" // neither side shuffles OR broadcasts

      val expected = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
      joined.count() shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  it should "also drop the exchange for aggregation on the bucket key" in {
    val agg = spark.table("bucketdb.lineitem_b")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    agg.count() shouldBe Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
  }
}
