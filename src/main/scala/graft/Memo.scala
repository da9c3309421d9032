package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared per-(session, dataset) memo machinery + a build-time log.
  *
  * Two jobs in one place:
  *
  *  1. THE CACHE PATTERN (generalizing `Analytics`' round-9 PairsMemo):
  *     the cache slot is RESERVED under a per-module lock, but the
  *     pinned build — a full Spark job — runs OUTSIDE it, synchronized
  *     only on its own slot's `lazy val` monitor. Same-key callers
  *     still build once; other sessions/datasets never serialize
  *     behind a slow build, and a build that throws leaves the slot
  *     uninitialized so the next caller retries (ADVICE r8).
  *
  *  2. THE BUILD LOG: every memo build records (name, seconds), so
  *     Bench can attribute shared-memo construction to the query whose
  *     timing absorbed it and emit it separately — per-query numbers
  *     for the graph family otherwise measure memo-build ORDER, not
  *     query cost (VERDICT r8 "what's wrong" #3).
  *
  * Caches register themselves on construction; [[clearAll]] drops every
  * registered cache's entries for a session, so Bench's isolation pass
  * can't silently miss a newly-memoized module (the r8 trap list).
  */
object Memo {

  // ------------------------------------------------------------ build log

  private val buildLog =
    new scala.collection.mutable.ArrayBuffer[(String, Double)]

  private[graft] def record(name: String, sec: Double): Unit =
    buildLog.synchronized { buildLog += ((name, sec)) }

  /** Snapshot cursor: number of builds recorded so far. */
  def cursor(): Int = buildLog.synchronized(buildLog.size)

  /** Builds recorded after cursor `n`, in order. */
  def since(n: Int): Seq[(String, Double)] =
    buildLog.synchronized(buildLog.drop(n).toList)

  // ------------------------------------------------------------ the cache

  /** One memo slot; `lazy val` gives per-slot build synchronization. */
  final class Slot private[Memo] (name: String, build: () => DataFrame) {
    lazy val frame: DataFrame = {
      val t0 = System.nanoTime()
      val f = build()
      record(name, (System.nanoTime() - t0) / 1e9)
      f
    }
  }

  private val registry =
    new scala.collection.mutable.ArrayBuffer[Cache]

  /** Drop every registered cache's entries for `s` (the strong
    * references keeping pinned blocks alive; the ContextCleaner frees
    * the blocks once a GC notices). */
  def clearAll(s: SparkSession): Unit =
    registry.synchronized(registry.toList).foreach(_.clear(s))

  /** A module's memo cache. `module` prefixes build-log names. */
  final class Cache(module: String) {
    registry.synchronized { registry += this }

    private val slots = scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), Slot]
    private val lock = new Object
    private val hooked = scala.collection.mutable.Set.empty[SparkSession]

    /** Memoized pinned frame for (`s`, `d`, `name`). The build should
      * end in `.pin()` so every consumer reads materialized blocks. */
    def apply(s: SparkSession, d: String, name: String)
        (build: => DataFrame): DataFrame = {
      val slot = lock.synchronized {
        if (!hooked.contains(s)) {
          hooked += s
          s.sparkContext.addSparkListener(
            new org.apache.spark.scheduler.SparkListener {
              override def onApplicationEnd(
                  e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                  : Unit = clear(s)
            })
        }
        slots.getOrElseUpdate((s, d, name),
          new Slot(s"$module.$name", () => build))
      }
      slot.frame
    }

    def clear(s: SparkSession): Unit = lock.synchronized {
      slots.keys.filter(_._1 eq s).foreach(slots.remove)
      hooked -= s
    }
  }
}
