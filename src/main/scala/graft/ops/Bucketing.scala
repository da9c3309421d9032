package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the storage-side answer to recurring fact-fact
  * joins. A join/groupBy on the bucket key of two tables bucketed the
  * same way (same key, same bucket count) needs NO shuffle at read time:
  * Spark's bucketing reports the hash partitioning to the planner, and
  * the exchange disappears from every query that reuses the key. The
  * one-time shuffle is paid at write, amortized over every downstream
  * query — at 100 TB this converts the dominant recurring cost (a
  * fact-fact exchange per query) into a fixed ingest cost.
  *
  * Rules of thumb encoded here:
  *  - bucket count is fixed at table-creation (choose for target-scale
  *    file sizes: rows × row-width / buckets ≈ 128–512 MB);
  *  - sortBy(key) inside buckets lets sort-merge-join skip its sort;
  *  - both join sides need the SAME bucket count (Spark doesn't
  *    coalesce mismatched bucketing unless
  *    spark.sql.bucketing.coalesceBucketsInJoin.enabled).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables on `leftKey = rightKey`. When both are bucketed
    * on their keys with equal bucket counts, the physical plan is a
    * sort-merge join with zero Exchange nodes (verified in
    * BucketingSpec). */
  def colocatedJoin(s: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = s.table(leftTable)
    val r = s.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
