package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** End-to-end pipeline semantics from SURVEY.md §5.2: NULL round-trip
  * asymmetry, CSV quoting, idempotent delete-then-load, skip-on-missing
  * snapshot, FAILFAST casting. */
class PipelineSpec extends GraftTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val header = "id,name,host_id,host_name,neighbourhood_group," +
    "neighbourhood,latitude,longitude,room_type,price,minimum_nights," +
    "number_of_reviews,last_review,reviews_per_month," +
    "calculated_host_listings_count,availability_365,number_of_reviews_ltm,license"

  private def writeSnapshot(dir: String, date: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, s"listing-$date-processed.csv"),
      (header +: rows).asJava)

  private def runOnce(landing: String, table: String, export: String,
      dates: Seq[String], runDate: String): Pipeline.RunResult =
    Pipeline.run(spark,
      Pipeline.Config(landing, dates, table, export),
      LocalDate.parse(runDate))

  behavior of "Pipeline.run"

  it should "ingest \\N as NULL and export NULL as empty field (the asymmetry)" in {
    val (landing, table, export) = (tmpDir("l"), tmpDir("t") + "/tbl", tmpDir("e"))
    writeSnapshot(landing, "2025-01-05", Seq(
      "1,\"Cozy, downtown \"\"loft\"\"\",10,Ann,\\N,Center,42.6,-73.7,Entire,120.50,2,14,2024-11-02,1.25,3,200,5,\\N",
      "2,Plain,11,Bob,\\N,North,42.7,-73.8,Private,\\N,1,0,\\N,\\N,1,365,0,ABC"))
    val res = runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-01")
    res.loadedRows shouldBe 2
    res.exportedRows shouldBe 2

    // ingested as real NULLs
    val loaded = spark.read.parquet(table)
    loaded.filter(col("price").isNull).count() shouldBe 1
    loaded.filter(col("neighbourhood_group").isNull).count() shouldBe 2

    // exported as empty fields, not \N; quotes doubled RFC4180-style
    val csvLines = Files.list(Paths.get(res.exportPath)).iterator().asScala
      .filter(_.toString.endsWith(".csv"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    csvLines.exists(_.contains("\\N")) shouldBe false
    csvLines.exists(_.contains("\"Cozy, downtown \"\"loft\"\"\"")) shouldBe true
    val row2 = csvLines.find(_.startsWith("2,")).get
    row2 should include(",Private,,1,") // NULL price -> empty field
  }

  it should "be idempotent: re-running a runDate replaces, never appends" in {
    val (landing, table, export) = (tmpDir("l"), tmpDir("t") + "/tbl", tmpDir("e"))
    writeSnapshot(landing, "2025-01-05", Seq(
      "1,A,1,H,\\N,N,42.0,-73.0,R,10.00,1,0,\\N,\\N,1,1,0,\\N"))
    runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-01")
    val after1 = spark.read.parquet(table).count()
    runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-01")
    val after2 = spark.read.parquet(table).count()
    after2 shouldBe after1

    // a different runDate APPENDS (separate batch partition)...
    runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-02")
    spark.read.parquet(table).count() shouldBe after1 * 2
    // ...and re-running the first date still only replaces its own batch
    runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-01")
    spark.read.parquet(table).count() shouldBe after1 * 2
  }

  it should "skip missing snapshot dates without failing" in {
    val (landing, table, export) = (tmpDir("l"), tmpDir("t") + "/tbl", tmpDir("e"))
    writeSnapshot(landing, "2025-01-05", Seq(
      "1,A,1,H,\\N,N,42.0,-73.0,R,10.00,1,0,\\N,\\N,1,1,0,\\N"))
    val res = runOnce(landing, table, export,
      Seq("2025-01-05", "2025-02-05", "2025-03-05"), "2025-03-01")
    res.loadedRows shouldBe 1
  }

  it should "fail fast on malformed numerics (the reference's COPY abort)" in {
    val (landing, table, export) = (tmpDir("l"), tmpDir("t") + "/tbl", tmpDir("e"))
    writeSnapshot(landing, "2025-01-05", Seq(
      "1,A,1,H,\\N,N,42.0,-73.0,R,not_a_price,1,0,\\N,\\N,1,1,0,\\N"))
    an[Exception] should be thrownBy
      runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-01")
  }

  it should "stamp load_date and processed_at (the fired defaults)" in {
    val (landing, table, export) = (tmpDir("l"), tmpDir("t") + "/tbl", tmpDir("e"))
    writeSnapshot(landing, "2025-01-05", Seq(
      "1,A,1,H,\\N,N,42.0,-73.0,R,10.00,1,0,\\N,\\N,1,1,0,\\N"))
    runOnce(landing, table, export, Seq("2025-01-05"), "2025-03-01")
    val row = spark.read.parquet(table).head()
    row.getAs[java.sql.Date]("load_date").toString shouldBe "2025-03-01"
    row.getAs[java.sql.Timestamp]("processed_at") should not be null
  }
}
