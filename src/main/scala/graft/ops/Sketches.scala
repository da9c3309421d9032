package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate ("sketch") aggregation operators — the cardinality /
  * quantile estimators a 100 TB pipeline uses where exact answers cost a
  * full shuffle of distinct values.
  *
  * - `approx_count_distinct` = HyperLogLog++: fixed-size sketch per
  *   group, map-side combinable, error ~2.3% at the default rsd.
  * - `approx_percentile` = a mergeable quantile summary (Greenwald-
  *   Khanna-style): bounded memory, one pass.
  *
  * Approximate outputs are engine-specific (DuckDB's estimators differ),
  * so these queries carry NO DuckDB oracle — the driver records a
  * rows-only check, and SketchSpec asserts the estimates against exact
  * values with the algorithms' error bounds. The exact companions
  * (n_exact columns) are oracle-able and covered via q_outer_join_agg /
  * q1_agg shapes elsewhere.
  */
object Sketches {

  /** Per-orderstatus cardinality + quantile sketches next to their exact
    * counterparts: one pass, partial aggregation on every map task. */
  def orderSketches(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        count("*").as("n_rows"),
        countDistinct("o_custkey").as("custkeys_exact"),
        approx_count_distinct("o_custkey").as("custkeys_approx"),
        // scalar columns, not one array(0.5,0.95) result: the driver's
        // rows-only check still loads the parquet into pandas and sorts
        // every column — an array column is unhashable there (r2 gate err)
        expr("approx_percentile(o_totalprice, 0.5)").as("price_p50"),
        expr("approx_percentile(o_totalprice, 0.95)").as("price_p95"),
        min("o_totalprice").as("price_min"),
        max("o_totalprice").as("price_max"))
}
