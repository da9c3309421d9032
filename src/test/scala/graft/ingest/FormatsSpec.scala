package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.GraftTestBase

class FormatsSpec extends GraftTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DecimalType(10, 2)),
    StructField("seen_at", TimestampType),
    StructField("score", DoubleType)))

  // nulls in every column type + a comma/quote-bearing string — the
  // cells that break text formats first
  private val rows = Seq(
    Row(1L, "plain", BigDecimal("12.50").bigDecimal,
      Timestamp.valueOf("2024-03-01 10:15:30"), 0.5),
    Row(2L, "has,comma \"quoted\"", null, null, null),
    Row(3L, null, BigDecimal("-0.99").bigDecimal,
      Timestamp.valueOf("2024-03-02 00:00:00"), -1.25))

  behavior of "Formats"

  it should "round-trip schema and data through every supported format" in {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    Formats.supported.foreach { fmt =>
      val dir = s"/tmp/graft-formats-spec/$fmt"
      Formats.write(df, dir, fmt)
      val back = Formats.read(spark, dir, fmt, Some(schema))
      withClue(s"format=$fmt: ") {
        back.schema shouldBe schema
        back.collect().toSet shouldBe df.collect().toSet
      }
    }
  }

  it should "refuse schemaless reads of text formats" in {
    an[IllegalArgumentException] should be thrownBy
      Formats.read(spark, "/tmp/nowhere", "csv")
    an[IllegalArgumentException] should be thrownBy
      Formats.read(spark, "/tmp/nowhere", "json")
  }
}
