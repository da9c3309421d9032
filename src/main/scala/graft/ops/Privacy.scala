package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** T-CLOSENESS AUDIT — the third rung of the anonymization-audit
    * ladder (k-anonymity bounds group size, l-diversity bounds
    * within-group variety, t-closeness bounds how much a group's
    * SENSITIVE-VALUE DISTRIBUTION leaks vs the global one). For the
    * ordered sensitive attribute (account-balance decile bucket) the
    * right distance is the Earth Mover's Distance, which for ordinal
    * values is the mean absolute CUMULATIVE probability gap:
    * EMD = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m−1).
    *
    * Exactness: with class counts c_j (total n_c) and global counts g_j
    * (total N), p_j − q_j = (c_j·N − g_j·n_c)/(n_c·N), so the scaled
    * cumulative sums are exact BIGINTs and the single final division by
    * n_c·N·(m−1) is the only floating op — bit-equal across engines.
    *
    * Scale: facts collapse to (nation, bucket) counts in one map-side-
    * combinable shuffle; the dense nation×10 grid, the global marginal,
    * and the cumulative window all run over that ≤250-row aggregate
    * (the PlanLint-accepted tiny-frame window class). */
  def tClosenessAudit(s: SparkSession, d: String): DataFrame = {
    val cents = (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    // fixed-width deciles over the TPC-H balance domain [-999.99, 9999.99]
    val bucket = least(lit(9), greatest(lit(0),
      floor((cents + 100000L) / 110000L))).cast("int")
    val cls = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), bucket.as("b"))
      .agg(count(lit(1)).as("c"))
    val grid = cls.select("c_nationkey").distinct()
      .crossJoin(broadcast(s.range(0, 10)
        .select(col("id").cast("int").as("b"))))
    val dense = grid.join(cls, Seq("c_nationkey", "b"), "left")
      .select(col("c_nationkey"), col("b"),
        coalesce(col("c"), lit(0L)).as("c"))
    val glob = dense.groupBy("b").agg(sum("c").as("g"))
    val nTot = glob.agg(sum("g").as("n_total"))
    val w = Window.partitionBy("c_nationkey").orderBy("b")
    dense.join(broadcast(glob), Seq("b"))
      .crossJoin(broadcast(nTot))
      .withColumn("n_class",
        sum(col("c")).over(Window.partitionBy("c_nationkey")))
      .withColumn("cum_scaled",
        sum(col("c") * col("n_total") - col("g") * col("n_class")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("c_nationkey"), col("n_class"), col("n_total"))
      .agg(sum(abs(col("cum_scaled"))).as("abs_cum_sum"))
      .select(col("c_nationkey"), col("n_class"),
        (col("abs_cum_sum").cast("double") /
          (col("n_class") * col("n_total") * 9L).cast("double")).as("emd"),
        ((col("abs_cum_sum").cast("double") /
          (col("n_class") * col("n_total") * 9L).cast("double")) <= 0.2)
          .as("t_close_02"))
  }

  val tClosenessAuditSql: String =
    """WITH cls AS (
      |  SELECT c_nationkey,
      |    CAST(least(9, greatest(0,
      |      floor((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |             + 100000) / 110000))) AS INT) AS b,
      |    count(*) AS c
      |  FROM customer GROUP BY 1, 2),
      |grid AS (
      |  SELECT n.c_nationkey, CAST(r.b AS INT) AS b
      |  FROM (SELECT DISTINCT c_nationkey FROM cls) n
      |  CROSS JOIN (SELECT UNNEST(range(0, 10)) AS b) r),
      |dense AS (
      |  SELECT g.c_nationkey, g.b, COALESCE(cls.c, 0) AS c
      |  FROM grid g LEFT JOIN cls
      |    ON cls.c_nationkey = g.c_nationkey AND cls.b = g.b),
      |gmarg AS (SELECT b, sum(c) AS g FROM dense GROUP BY b),
      |tot AS (SELECT sum(g) AS n_total FROM gmarg),
      |cl AS (SELECT c_nationkey, sum(c) AS n_class
      |       FROM dense GROUP BY c_nationkey),
      |cum AS (
      |  SELECT d.c_nationkey, cl.n_class, t.n_total,
      |    sum(d.c * t.n_total - gl.g * cl.n_class) OVER (
      |      PARTITION BY d.c_nationkey ORDER BY d.b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_scaled
      |  FROM dense d JOIN gmarg gl ON gl.b = d.b
      |  JOIN cl ON cl.c_nationkey = d.c_nationkey CROSS JOIN tot t)
      |SELECT c_nationkey, CAST(n_class AS BIGINT) AS n_class,
      |  CAST(sum(abs(cum_scaled)) AS DOUBLE) /
      |    CAST(n_class * n_total * 9 AS DOUBLE) AS emd,
      |  (CAST(sum(abs(cum_scaled)) AS DOUBLE) /
      |    CAST(n_class * n_total * 9 AS DOUBLE)) <= 0.2 AS t_close_02
      |FROM cum GROUP BY c_nationkey, n_class, n_total""".stripMargin

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

  /** DIFFERENTIAL-PRIVACY style noisy histogram: order counts per
    * (priority, status) cell with Laplace(1/ε) noise, ε = 1 — the
    * release mechanism for publishable aggregate statistics, rounding
    * out the privacy suite (pseudonymize → generalize → k-suppress →
    * DP-noise the marginals).
    *
    * The noise is SEEDED, not random — RNG would break both the driver
    * oracle and re-run reproducibility (the module contract: "no salts,
    * no RNG"). Each cell's uniform draw is its md5-derived 32-bit
    * fraction u ∈ (−½, ½) (the [[graft.text.TextAnalysis.trainSplit]]
    * hash-bucket device), pushed through the exact Laplace inverse CDF
    * −b·sgn(u)·ln(1 − 2|u|). Identical bytes → identical noise in any
    * engine; within one release the draws across cells are independent
    * as md5 is. A production deployment would swap the md5 seed input
    * for a per-release secret salt — one column swap, documented here —
    * but the MECHANISM (sensitivity-1 count, inverse-CDF transform,
    * ε accounting column) is what this operator carries.
    *
    * Per-cell arithmetic is one pinned double expression (ln/abs/sign of
    * one hash-derived double), rounded to 4; counts stay exact alongside
    * so the spec can bound |noisy − exact|. One map-side-combinable
    * aggregate; the noise projection is O(cells). */
  def dpNoisyHistogram(s: SparkSession, d: String): DataFrame = {
    val eps = 1.0
    val cellKey = concat_ws("|", col("o_orderpriority"), col("o_orderstatus"))
    val u = (conv(substring(md5(cellKey), 1, 8), 16, 10).cast("long")
      .cast("double") + 0.5) / 4294967296.0 - 0.5
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("n"),
        round(col("n") +
          (-lit(1.0) / eps) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u)), 4)
          .as("noisy_n"),
        lit(eps).as("epsilon"))
  }

  val dpNoisyHistogramSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2),
      |seeded AS (
      |  SELECT o_orderpriority, o_orderstatus, n,
      |    (CAST(CAST(('0x' || substr(md5(o_orderpriority || '|' || o_orderstatus), 1, 8))
      |        AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 - 0.5 AS u
      |  FROM cells)
      |SELECT o_orderpriority, o_orderstatus, n,
      |  round(n + (-1.0 / 1.0) * sign(u) * ln(1.0 - 2.0 * abs(u)), 4) AS noisy_n,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM seeded""".stripMargin
}
