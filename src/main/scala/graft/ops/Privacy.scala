package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Privacy / PII-handling operators — the scrub stage every training-data
  * pipeline runs before a corpus ships. The reference pipeline moves raw
  * customer-grade records (names, host ids, locations) straight to the
  * object store; this module is the engine-native rendering of what a
  * compliant version needs: pseudonymization + generalization +
  * k-anonymity suppression.
  *
  * Scale: pseudonymization is a per-row md5 projection (codegen'd, scan
  * speed); k-group sizing is one window count over the quasi-identifier
  * partition — a single shuffle on the (small-cardinality) QI key, no
  * joins, no driver-side state. Suppression is a row-local CASE on the
  * windowed count. Deterministic end-to-end: no salts, no RNG.
  */
object Privacy {

  /** Minimum group size for a quasi-identifier combination to survive
    * un-suppressed. */
  val kThreshold = 8

  /** k-anonymized customer extract.
    *
    * - identity (c_custkey, c_name) → stable md5 pseudonym (joinable
    *   across runs, not reversible without the key column);
    * - c_acctbal generalized to 1000-unit bands;
    * - quasi-identifiers (nationkey, band, segment) suppressed to NULL
    *   wherever the group holds fewer than [[kThreshold]] customers, so
    *   no released row is identifiable within a group smaller than k;
    * - group_size ships with each row as the audit column. */
  def kAnonymize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey", "acctbal_band", "c_mktsegment")
    Tables.customer(s, d)
      .select(
        md5(concat(lit("cust|"), col("c_custkey").cast("string"))).as("pseudonym"),
        col("c_nationkey"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("double").as("acctbal_band"),
        col("c_mktsegment"))
      .withColumn("k", count("*").over(w))
      .select(
        col("pseudonym"),
        when(col("k") >= kThreshold, col("c_nationkey")).as("nationkey"),
        when(col("k") >= kThreshold, col("acctbal_band")).as("acctbal_band"),
        when(col("k") >= kThreshold, col("c_mktsegment")).as("mktsegment"),
        col("k").as("group_size"))
  }

  val kAnonymizeSql: String =
    s"""WITH g AS (
       |  SELECT md5('cust|' || CAST(c_custkey AS VARCHAR)) AS pseudonym,
       |    c_nationkey,
       |    CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_band,
       |    c_mktsegment
       |  FROM customer),
       |w AS (
       |  SELECT *, count(*) OVER (
       |    PARTITION BY c_nationkey, acctbal_band, c_mktsegment) AS k
       |  FROM g)
       |SELECT pseudonym,
       |  CASE WHEN k >= $kThreshold THEN c_nationkey END AS nationkey,
       |  CASE WHEN k >= $kThreshold THEN acctbal_band END AS acctbal_band,
       |  CASE WHEN k >= $kThreshold THEN c_mktsegment END AS mktsegment,
       |  k AS group_size
       |FROM w""".stripMargin
}
