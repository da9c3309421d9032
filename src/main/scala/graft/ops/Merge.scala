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

  /** Mid-month base/delta split for [[incrementalAgg]]. */
  private[ops] val incrCutoff = "1996-07-16 00:00:00"

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

  /** Snapshot DIFF — the inverse of [[cdcMerge]]: given two keyed table
    * versions, classify every key as added / removed / changed /
    * unchanged with before/after values — the reconciliation report
    * behind "what changed between yesterday's load and today's?", and
    * the generator that produces a CDC batch FROM two snapshots when the
    * source system can't emit one (the reference's full-refresh loads
    * are exactly this situation).
    *
    * Versions are derived deterministically from `orders`: v2 restates
    * the price (+10.00 exact decimal) for every 7th key and drops every
    * 11th. Same scale shape as the merge: ONE full-outer shuffle join on
    * the key, value comparison null-safe (`<=>` negation), output
    * filtered to the non-trivial classes (unchanged rows are the bulk at
    * scale and belong in a count, not a report — they're summarized by
    * the caller if needed). */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = Tables.orders(s, d)
      .select(col("o_orderkey").as("k1"),
        col("o_orderstatus").as("status_before"),
        col("o_totalprice").as("price_before"))
    val v2 = Tables.orders(s, d)
      .filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey").as("k2"),
        col("o_orderstatus").as("status_after"),
        when(col("o_orderkey") % 7 === 0,
          (col("o_totalprice").cast(DecimalType(18, 2)) +
            lit(10).cast(DecimalType(18, 2))).cast("double"))
          .otherwise(col("o_totalprice")).as("price_after"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .select(
        coalesce(col("k1"), col("k2")).as("o_orderkey"),
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(!(col("status_before") <=> col("status_after")) ||
            !(col("price_before") <=> col("price_after")), "changed")
          .otherwise("unchanged").as("change_type"),
        col("status_before"), col("status_after"),
        col("price_before"), col("price_after"))
      .filter(col("change_type") =!= "unchanged")
  }

  /** Incremental aggregate maintenance — the partial-merge step behind
    * every incrementally-maintained materialized view: a persisted base
    * aggregate (here the pre-1997 month×status revenue rollup, standing
    * in for yesterday's stored MV) is combined with the aggregate of the
    * new delta alone, WITHOUT rescanning the base facts. The output is
    * proven identical to a full recompute by oracling against the plain
    * GROUP BY over all orders.
    *
    * Scale design: this is THE pattern that makes a 100 TB rollup
    * refresh O(delta) instead of O(history). Both inputs are already
    * aggregates — O(groups) rows, not O(facts) — so the merge join
    * shuffles group keys only; sums are exact DECIMAL so base+delta
    * reassociates bit-identically to the one-shot aggregation (double
    * addition would not reassociate and the oracle hash would diverge).
    * Counts and sums merge by `+`; avg/stddev-style measures would ship
    * as (sum, count) / (sum, sum², count) partials the same way.
    *
    * The split point is deliberately MID-month so the boundary month's
    * group receives contributions from BOTH partials — the merge case
    * that distinguishes this from a disjoint union of aggregates. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_orderstatus"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev"),
        count(lit(1)).as("n"))
    val orders = Tables.orders(s, d)
    val base = partial(orders.filter(col("o_orderdate") < Relational.ts(incrCutoff)))
      .withColumnRenamed("rev", "rev_b").withColumnRenamed("n", "n_b")
    val delta = partial(orders.filter(col("o_orderdate") >= Relational.ts(incrCutoff)))
      .withColumnRenamed("rev", "rev_d").withColumnRenamed("n", "n_d")
    val zero = lit(0).cast(dec)
    base.join(delta, Seq("month", "o_orderstatus"), "full_outer")
      .select(col("month"), col("o_orderstatus"),
        (coalesce(col("rev_b"), zero) + coalesce(col("rev_d"), zero))
          .cast("double").as("revenue"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_orders"))
  }

  /** Oracle = the FULL recompute the incremental path must equal. */
  val incrementalAggSql: String =
    """SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY date_trunc('month', o_orderdate), o_orderstatus""".stripMargin

  val snapshotDiffSql: String =
    """WITH v1 AS (
      |  SELECT o_orderkey AS k1, o_orderstatus AS status_before,
      |    o_totalprice AS price_before
      |  FROM orders),
      |v2 AS (
      |  SELECT o_orderkey AS k2, o_orderstatus AS status_after,
      |    CASE WHEN o_orderkey % 7 = 0
      |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) +
      |                CAST(10 AS DECIMAL(18,2)) AS DOUBLE)
      |      ELSE o_totalprice END AS price_after
      |  FROM orders WHERE o_orderkey % 11 <> 0)
      |SELECT coalesce(k1, k2) AS o_orderkey,
      |  CASE WHEN k1 IS NULL THEN 'added'
      |       WHEN k2 IS NULL THEN 'removed'
      |       WHEN status_before IS DISTINCT FROM status_after
      |         OR price_before IS DISTINCT FROM price_after THEN 'changed'
      |       ELSE 'unchanged' END AS change_type,
      |  status_before, status_after, price_before, price_after
      |FROM v1 FULL OUTER JOIN v2 ON k1 = k2
      |WHERE NOT (k1 IS NOT NULL AND k2 IS NOT NULL
      |  AND status_before IS NOT DISTINCT FROM status_after
      |  AND price_before IS NOT DISTINCT FROM price_after)""".stripMargin
}
