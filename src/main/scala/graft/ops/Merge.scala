package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** CDC merge (upsert) — the MERGE INTO / delta-merge operator every
  * incremental warehouse load needs: a keyed delta batch applied onto a
  * base snapshot, each output row classified insert / update / keep.
  *
  * The testdata has no second table version, so the base/delta split is
  * derived deterministically from `orders` itself: base = the pre-1997
  * snapshot; delta = every fifth order key, re-stated with a bumped
  * status and price (a synthetic CDC batch that both updates existing
  * keys and inserts unseen ones — exactly the mixed batch MERGE exists
  * for).
  *
  * Scale design: merge is ONE full-outer shuffle join on the key — both
  * sides hash-partition on `o_orderkey` and every executor resolves its
  * key range independently; nothing collects. On a partitioned table the
  * same plan narrows to dynamic partition overwrite of only the
  * partitions the delta touches ([[graft.ingest.BatchLoad]] does the
  * write-side half); AQE handles a skewed delta. The classifier column is
  * what a MERGE's WHEN MATCHED / NOT MATCHED arms compile to.
  */
object Merge {

  private val cutoff = "1997-01-01 00:00:00"

  /** Apply the synthetic delta onto the base snapshot: full-outer join on
    * the order key, coalesce-newest wins, action column classifies each
    * row. Price restatement is exact decimal arithmetic (+10.00), so the
    * oracle hash-matches bit-for-bit. */
  def cdcMerge(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .filter(col("o_orderdate") < Relational.ts(cutoff))
      .select(col("o_orderkey").as("b_key"),
        col("o_orderstatus").as("b_status"),
        col("o_totalprice").as("b_price"))
    val delta = Tables.orders(s, d)
      .filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("d_key"),
        lit("U").as("d_status"),
        (col("o_totalprice").cast(DecimalType(18, 2)) +
          lit(10).cast(DecimalType(18, 2))).cast("double").as("d_price"))
    base.join(delta, col("b_key") === col("d_key"), "full_outer")
      .select(
        coalesce(col("b_key"), col("d_key")).as("o_orderkey"),
        coalesce(col("d_status"), col("b_status")).as("o_orderstatus"),
        coalesce(col("d_price"), col("b_price")).as("o_totalprice"),
        when(col("b_key").isNotNull && col("d_key").isNotNull, "update")
          .when(col("d_key").isNotNull, "insert")
          .otherwise("keep").as("action"))
  }

  val cdcMergeSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey AS b_key, o_orderstatus AS b_status,
       |    o_totalprice AS b_price
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$cutoff'),
       |delta AS (
       |  SELECT o_orderkey AS d_key, 'U' AS d_status,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2))
       |      AS DOUBLE) AS d_price
       |  FROM orders WHERE o_orderkey % 5 = 0)
       |SELECT coalesce(b_key, d_key) AS o_orderkey,
       |  coalesce(d_status, b_status) AS o_orderstatus,
       |  coalesce(d_price, b_price) AS o_totalprice,
       |  CASE WHEN b_key IS NOT NULL AND d_key IS NOT NULL THEN 'update'
       |       WHEN d_key IS NOT NULL THEN 'insert'
       |       ELSE 'keep' END AS action
       |FROM base FULL OUTER JOIN delta ON b_key = d_key""".stripMargin
}
