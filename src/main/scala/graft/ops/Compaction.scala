package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: small-file compaction and range
  * clustering — the layout half of a 100 TB pipeline that query operators
  * depend on but never show in a plan.
  *
  * Why it matters at scale: streaming/incremental writers emit files per
  * trigger per partition; after a week a table holds millions of KB-sized
  * files and every scan pays open/footer/seek per file (plus a NameNode /
  * object-store LIST storm). Compaction rewrites each partition into
  * size-targeted files; clustering additionally range-sorts rows so
  * min/max (zone-map) pruning on the cluster keys skips whole files.
  *
  * Both are plain Spark writes: no custom commit protocol, safe to re-run
  * (idempotent full-partition overwrite), and the shuffle is the only
  * cost — one pass over the data being compacted, never the whole table
  * when a partition predicate narrows it.
  */
object Compaction {

  /** Rewrite a parquet directory into ~`targetRowsPerFile`-row files.
    *
    * Row-count proxy: local parquet has no reliable pre-write byte
    * estimator; at production scale the same knob is bytes
    * (`maxRecordsPerFile` → target file size via observed row width).
    * Uses `repartition(n)` — a round-robin full shuffle — because
    * compaction's goal is file-count normalization, and round-robin gives
    * uniform output files regardless of input skew. Returns the compacted
    * frame re-read from disk. */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetRowsPerFile: Long): DataFrame = {
    val df = s.read.parquet(inDir)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(outDir)
    s.read.parquet(outDir)
  }

  /** Rewrite range-CLUSTERED on `keys`: repartitionByRange assigns
    * disjoint key ranges to output files and sortWithinPartitions orders
    * rows inside each, so every file carries a tight min/max envelope on
    * the keys — the poor man's Z-ORDER (exact for 1-key prefixes, which
    * is what range-cluster optimizes; true multi-dim locality needs a
    * space-filling curve, same write shape). Point/range scans on the
    * leading key then prune to O(1) files via parquet row-group stats
    * instead of reading everything. */
  def clusterBy(s: SparkSession, inDir: String, outDir: String,
      numFiles: Int, keys: String*): DataFrame = {
    val kc = keys.map(col)
    s.read.parquet(inDir)
      .repartitionByRange(numFiles, kc: _*)
      .sortWithinPartitions(kc: _*)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    s.read.parquet(outDir)
  }

  /** Layout audit: file count + row balance of a parquet dir, computed
    * distributed (input_file_name groupBy — no driver listing). */
  def layoutStats(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_files"),
        min("n_rows").as("min_rows"),
        max("n_rows").as("max_rows"))
}
