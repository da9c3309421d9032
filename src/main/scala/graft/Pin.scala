package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** The engine's single materialization point for iterative/multi-consumer
  * intermediates, with a durability switch.
  *
  * Default (`spark.graft.checkpoint.dir` unset): `localCheckpoint()` —
  * blocks live on executor local storage, truncating lineage at zero I/O
  * cost beyond the block write. The documented contract of that mode is
  * that ANY executor loss makes the pinned blocks unrecoverable and fails
  * the job loudly (never a silent recompute). That is the right trade on
  * a single-JVM harness and on short jobs, but on a 1000-executor cluster
  * running a multi-round job over 100 TB the probability of losing an
  * executor mid-job approaches 1, and the only recovery is a full re-run.
  *
  * Reliable mode (`spark.graft.checkpoint.dir=<fault-tolerant path>`,
  * e.g. an HDFS/S3 directory): every pin becomes a reliable
  * `checkpoint()` against that directory, so lost executors re-read the
  * checkpoint files and the job survives. Costs one distributed
  * write+read per pin — the standard durability premium for long jobs.
  *
  * The switch is read PER CALL from the session conf, so a caller can
  * flip it between queries on a live session (the equality spec does
  * exactly that). Results are identical under both modes by
  * construction: both forms materialize the same deterministic plan and
  * replace its lineage with a scan of the materialized blocks.
  */
object Pin {

  private def reliableDir(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.checkpoint.dir").filter(_.nonEmpty)

  /** Point the context at the configured checkpoint dir once per
    * distinct setting (SparkContext appends a per-app UUID subdir;
    * re-setting on every pin would scatter files across fresh subdirs
    * for no benefit, but a CHANGED setting must take effect). */
  private val lastDir =
    scala.collection.concurrent.TrieMap.empty[org.apache.spark.SparkContext, String]
  private def ensureDir(s: SparkSession, d: String): Unit = {
    val sc = s.sparkContext
    if (!lastDir.get(sc).contains(d) || sc.getCheckpointDir.isEmpty) {
      sc.setCheckpointDir(d)
      lastDir.update(sc, d)
    }
  }

  /** Pin a DataFrame: eager local checkpoint, or eager reliable
    * checkpoint when `spark.graft.checkpoint.dir` is set.
    *
    * Reliable mode persists before checkpointing: `Dataset.checkpoint()`
    * materializes in one job and then writes the checkpoint files in a
    * SECOND job that would re-execute the whole lineage — for the
    * iterative loops (kTruss, SSSP, LPA, dedup clusters) that is ~2×
    * compute per round. Caching first makes the checkpoint job a read of
    * the just-computed blocks, so the cost really is one distributed
    * write+read per pin; the cache is dropped as soon as the checkpoint
    * is on disk. */
  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    reliableDir(s) match {
      case Some(d) =>
        ensureDir(s, d)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint() finally df.unpersist(blocking = false)
      case None => df.localCheckpoint()
    }
  }

  /** RDD form (the `_dist` prefix-sum operator pins an InternalRow RDD).
    * Both branches MARK the RDD — materialization happens on the
    * caller's first action, matching `RDD.localCheckpoint` semantics.
    * The owning session is threaded in explicitly (NOT read from
    * `SparkSession.active`): the active-session thread-local reflects
    * the calling thread, which in a multi-session JVM or a fresh thread
    * is not necessarily the session that owns this RDD's SparkContext.
    * In reliable mode the RDD is persisted before the checkpoint mark so
    * the deferred checkpoint job (which runs after the caller's first
    * action) reads the computed blocks instead of re-executing lineage;
    * the caller unpersists via the returned handle's lineage truncation
    * once the checkpoint materializes. */
  def rdd[T](s: SparkSession, r: RDD[T]): RDD[T] = {
    reliableDir(s) match {
      case Some(d) =>
        ensureDir(s, d)
        r.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.checkpoint(); r
      case None => r.localCheckpoint()
    }
  }

  /** Postfix syntax so pin sites chain like the `localCheckpoint()`
    * calls they replace: `df.groupBy(...).agg(...).pin()`. */
  implicit class Pinned(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Pin(df)
  }
}
