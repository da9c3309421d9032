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

  /** Identifier-run regex: any digit run long enough to be a record id /
    * account number. Shared verbatim with the oracle (RE2 and java.util
    * .regex agree on this subset — character class + bounded repeat). */
  val idRunPattern = "[0-9]{6,}"

  /** PII scrub audit: mask identifier-shaped digit runs in free-text name
    * fields and report, per market segment, how many rows carried an
    * identifier and how many distinct surface forms remain after masking
    * (the k-anonymity-style collapse: every `Customer#NNNNNNNNN` falls
    * into one bucket). The masking itself is the release transform; the
    * aggregate is the audit a compliance reviewer reads.
    *
    * Scale: regexp_replace is a codegen'd per-row projection (scan
    * speed, no shuffle); the audit is one map-side-combinable aggregate
    * on a tiny segment domain. The distinct count shuffles (segment,
    * masked) pairs — bounded by surviving surface forms, which masking
    * has already collapsed (that collapse is the point of the metric). */
  def piiScrub(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_name"),
        regexp_replace(col("c_name"), idRunPattern, "<ID>").as("masked"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("masked") =!= col("c_name"), 1L).otherwise(0L)).as("n_masked"),
        countDistinct(col("masked")).as("n_distinct_masked"))

  val piiScrubSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN masked <> c_name THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_masked,
       |  count(DISTINCT masked) AS n_distinct_masked
       |FROM (
       |  SELECT c_mktsegment, c_name,
       |    regexp_replace(c_name, '$idRunPattern', '<ID>', 'g') AS masked
       |  FROM customer)
       |GROUP BY c_mktsegment""".stripMargin

  /** Minimum distinct sensitive values per QI group for l-diversity. */
  val lThreshold = 3

  /** l-diversity audit — the companion check k-anonymity alone misses: a
    * group can be large (k-anonymous) yet have every member share one
    * sensitive value, so membership still leaks the secret. Here the
    * quasi-identifier is the coarse (nationkey, 1000-unit balance band)
    * pair and the sensitive attribute is the market segment; a group is
    * l-diverse iff it contains at least [[lThreshold]] distinct segments.
    * The per-group min/max segment frequencies ship as audit columns —
    * the inputs a reviewer needs for the stricter entropy/recursive
    * (c,l)-diversity variants.
    *
    * Scale: two stacked map-side-combinable aggregates — facts collapse
    * to (QI, segment) counts first (one shuffle keyed by QI+segment,
    * combiner does the heavy lifting), then to QI groups (second shuffle
    * over the already-tiny distinct domain). No window over raw rows, no
    * join, all-integer arithmetic — exact at any scale. */
  def lDiversity(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("double").as("acctbal_band"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cs"))
      .groupBy("c_nationkey", "acctbal_band")
      .agg(
        sum(col("n_cs")).as("group_size"),
        count(lit(1)).as("l_distinct"),
        min(col("n_cs")).as("seg_n_min"),
        max(col("n_cs")).as("seg_n_max"))
      .select(col("c_nationkey"), col("acctbal_band"), col("group_size"),
        col("l_distinct"), col("seg_n_min"), col("seg_n_max"),
        (col("l_distinct") >= lThreshold).as("l_diverse"))

  val lDiversitySql: String =
    s"""WITH cs AS (
       |  SELECT c_nationkey,
       |    CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_band,
       |    c_mktsegment, count(*) AS n_cs
       |  FROM customer
       |  GROUP BY c_nationkey, floor(c_acctbal / 1000) * 1000, c_mktsegment)
       |SELECT c_nationkey, acctbal_band,
       |  CAST(sum(n_cs) AS BIGINT) AS group_size,
       |  count(*) AS l_distinct,
       |  min(n_cs) AS seg_n_min, max(n_cs) AS seg_n_max,
       |  (count(*) >= $lThreshold) AS l_diverse
       |FROM cs GROUP BY c_nationkey, acctbal_band""".stripMargin

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
