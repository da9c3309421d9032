package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Resampling statistics — the distributed bootstrap.
  *
  * The classic bootstrap ("draw n rows with replacement, B times") is
  * unrunnable at 100 TB: resampling is a shuffle of the whole fact table
  * per replicate. The scale rendering is the POISSON BOOTSTRAP: each row
  * independently contributes `Poisson(1)`-distributed weight to each of B
  * replicates, which approximates multinomial resampling to O(1/n) and
  * needs NO shuffle at all — each task weights its own rows and emits B
  * partial sums; the only exchange is B tiny groups. One scan, map-side
  * combine, arbitrarily parallel.
  *
  * Determinism (the engine's oracle discipline): the per-(row, replicate)
  * Poisson draw inverts the CDF on a uniform value derived from
  * `md5(orderkey | replicate)` — no RNG state, no partition sensitivity;
  * reruns, retries, and DuckDB reproduce every weight bit-for-bit. Weight
  * sums are integers and weighted revenue sums are exact DECIMAL, so the
  * replicate estimates hash-match across engines.
  */
object Resample {

  /** Number of bootstrap replicates. */
  val numReplicates = 100

  /** Poisson(1) inverse-CDF thresholds: P(X <= k) for k = 0..5; a uniform
    * u maps to the first k with u < cdf(k), capping at 6 (P ~ 1e-4).
    * Literal doubles shared verbatim with the oracle. */
  val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Per-replicate Poisson-bootstrap estimates of total and mean order
    * price: `numReplicates` rows of (replicate, n_eff, total_price,
    * mean_price). The spread across replicates IS the sampling
    * distribution — percentiles of these rows are the confidence
    * interval, computed by the caller (emitting the raw replicates keeps
    * every value exactly checkable).
    *
    * Plan shape: scan → explode a 100-element replicate sequence →
    * per-row weight projection → ONE aggregate on the replicate id.
    * The explode is a 100× row blowup, but rows never leave their task
    * before the partial aggregate collapses them to 100 groups — the
    * shuffle carries 100 rows per task regardless of data size. */
  def bootstrapOrderPrice(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val u = conv(substring(md5(concat(col("o_orderkey").cast("string"),
      lit("|"), col("r").cast("string"))), 1, 15), 16, 10).cast("long")
      .%(lit(1073741824L)).cast("double") / lit(1073741824.0)
    val w = poissonCdf.zipWithIndex.foldRight(lit(6): org.apache.spark.sql.Column) {
      case ((cdf, k), rest) => when(u < cdf, lit(k)).otherwise(rest)
    }
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        explode(sequence(lit(0), lit(numReplicates - 1))).as("r"))
      .select(col("r"), w.as("w"), col("o_totalprice"))
      .groupBy("r")
      .agg(
        sum(col("w")).cast("long").as("n_eff"),
        sum(col("w").cast(dec) * col("o_totalprice").cast(dec))
          .cast("double").as("total_price"))
      .select(col("r").as("replicate"), col("n_eff"), col("total_price"),
        (col("total_price") / col("n_eff")).as("mean_price"))
  }

  val bootstrapOrderPriceSql: String = {
    val caseArms = poissonCdf.zipWithIndex
      .map { case (cdf, k) => s"WHEN u < $cdf THEN $k" }.mkString("\n|    ")
    s"""WITH reps AS (SELECT unnest(generate_series(0, ${numReplicates - 1})) AS r),
       |draws AS (
       |  SELECT r, o_totalprice,
       |    CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
       |      CAST(r AS VARCHAR)), 1, 15)) AS BIGINT) % 1073741824
       |      AS DOUBLE) / 1073741824.0 AS u
       |  FROM orders CROSS JOIN reps),
       |weighted AS (
       |  SELECT r, o_totalprice,
       |    CASE $caseArms ELSE 6 END AS w
       |  FROM draws),
       |agg AS (
       |  SELECT r AS replicate,
       |    CAST(sum(w) AS BIGINT) AS n_eff,
       |    CAST(sum(CAST(w AS DECIMAL(18,2)) *
       |             CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |      AS total_price
       |  FROM weighted GROUP BY r)
       |SELECT replicate, n_eff, total_price,
       |  total_price / n_eff AS mean_price
       |FROM agg""".stripMargin
  }
}
