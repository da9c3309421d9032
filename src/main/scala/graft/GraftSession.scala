package graft

import org.apache.spark.sql.SparkSession

/** One place that constructs a correctly-configured engine session, so
  * every entrypoint (Verify, Bench, PipelineMain, tests) agrees on:
  *  - UTC session timezone (oracle parity — DuckDB treats the testdata
  *    timestamps as naive),
  *  - [[Tables.requiredConf]] set ONCE at construction instead of as a
  *    hidden per-read side effect (ADVICE r1),
  *  - AQE on (runtime re-planning: skew joins, partition coalescing — the
  *    100 TB posture even though local runs are small),
  *  - shuffle partitions sized to the actual core count, not the 200
  *    default that would fragment local runs — but with the AQE INITIAL
  *    partition number set 8× higher, so a shuffle whose data outgrows
  *    the core count starts wide and AQE coalesces it back down
  *    (parallelism-first, so small shuffles land on the same effective
  *    width as before). This is the "size shuffle partitions so
  *    partitions fit in executor memory" rule made adaptive instead of
  *    hand-tuned — the cluster posture. Honesty note (PERF.md round-14
  *    scale-sweep investigation): on THIS single-node harness the knob
  *    measured neutral on the one wall the sweep found — the graph
  *    chain's edgeSupport build at a ×16-derived corpus is bound by
  *    single-disk spill-merge of its intrinsic Θ(E·d̄) array exchange
  *    (jstack: UnsafeShuffleWriter.mergeSpills; 48 GiB-heap A/B also
  *    neutral), which more reducers cannot shrink. The config is kept
  *    for what it does buy: wide-start shuffles are the correct
  *    default when per-executor memory, not one local disk, is the
  *    binding constraint.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder = {
    // Non-numeric partition strings (Spark accepts e.g. "auto" for some
    // confs) must not crash the builder: derive the wide-start number only
    // when both the base and any override parse, else omit the conf and
    // let Spark's default stand (ADVICE r14).
    val initialParts: Option[String] =
      sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS")
        .filter(v => scala.util.Try(v.toInt).isSuccess)
        .orElse(scala.util.Try((shufflePartitions.toInt * 8).toString).toOption)
    val b = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // InferFiltersFromGenerate synthesizes size(e)>0 filters under every
      // explode; PushDownPredicates then substitutes the full generator
      // expression through the staged projections to the scan — for our
      // lambda-heavy shingle arrays (no CSE inside lambdas) that
      // re-tokenizes each document several times per row and cost ~15s of
      // a 19s query at sf0.1. Text corpora here never carry empty/null
      // arrays, so the inferred skip-filter buys nothing. Measured, not
      // guessed: q_dedup_jaccard 19s -> see BENCH notes.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val bInit = initialParts.foldLeft(b)((bb, v) =>
      bb.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", v))
    // Broadcast-budget knobs for small-heap / large-graph captures
    // (PERF.md round-12 gate): SPARK_GRAFT_AUTOBROADCAST sets the
    // stats-chosen auto-broadcast threshold (bytes, -1 disables;
    // AQE's adaptive threshold falls back to the same key), and
    // SPARK_GRAFT_BROADCAST_ROWCAP sets the graph family's explicit
    // gated-hint cap (rows, 0 disables the hints).
    val b2 = sys.env.get("SPARK_GRAFT_AUTOBROADCAST")
      .foldLeft(bInit)((bb, v) => bb.config("spark.sql.autoBroadcastJoinThreshold", v))
    val b3 = sys.env.get("SPARK_GRAFT_BROADCAST_ROWCAP")
      .foldLeft(b2)((bb, v) => bb.config("spark.graft.graph.broadcastRowCap", v))
    Tables.requiredConf.foldLeft(b3) { case (bb, (k, v)) => bb.config(k, v) }
  }

  /** local[cpus] session for harness entrypoints. Also registers graft's
    * native SQL functions (cosine_sim) — cluster deploys get the same via
    * spark.sql.extensions=graft.functions.GraftExtensions. */
  def local(cpus: String): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
