package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pareto-frontier (skyline) operator — "the parts no other part beats on
  * both price and size at once". Skyline is the classic multi-criteria
  * shortlist query (cheapest-largest, fastest-cheapest, …) that SQL can
  * only express as a quadratic NOT EXISTS self-join; engines that matter
  * at scale render it as a sort + sweep.
  *
  * 2-D rendering here: aggregate to one row per price carrying that
  * price's best size (map-side combinable — the fact table collapses to
  * the price domain), then a single price-ordered sweep keeps each row
  * whose size strictly beats the best size among all strictly-cheaper
  * prices. That prefix-max sweep runs through
  * [[Distributed.withRunningMaxExclusive]] — range-partitioned by price,
  * full cluster parallelism — NOT a no-partition window (which would
  * funnel the whole price domain through one task, the PlanLint
  * single-partition smell). The frontier is then tiny by construction
  * (monotone staircase), so rejoining it to recover the winning rows is
  * a broadcast join against the original scan.
  *
  * Correctness: a part is dominated iff a strictly-cheaper part has
  * size >= its size (prefix-max >= size) OR a same-price part has a
  * strictly larger size (size < its price group's max). The kept set is
  * exactly rows with `size == group max > exclusive prefix-max`, which
  * the oracle states as NOT EXISTS domination.
  */
object Pareto {

  /** Skyline of `part`: minimize p_retailprice, maximize p_size. */
  def skylineParts(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
    val byPrice = parts.groupBy("p_retailprice")
      .agg(max(col("p_size").cast("long")).as("max_size"))
    val frontier = Distributed.withRunningMaxExclusive(
        byPrice, Seq.empty, Seq("p_retailprice"), "max_size", "best_cheaper")
      .filter(col("max_size") > col("best_cheaper"))
      .select(col("p_retailprice"), col("max_size"))
    parts
      .join(broadcast(frontier), Seq("p_retailprice"))
      .filter(col("p_size").cast("long") === col("max_size"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size"))
  }

  val skylinePartsSql: String =
    """SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice
      |    AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin
}
