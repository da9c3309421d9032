package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform multi-format table IO: parquet, ORC, CSV, JSONL behind one
  * surface, with the engine's boundary semantics pinned per format.
  *
  * The reference's world is CSV-only; a lake engine needs the columnar
  * formats too. Parquet and ORC carry their own schema/types (and get
  * predicate pushdown + column pruning for free); CSV and JSONL are
  * text at rest, so reads take an EXPLICIT schema and FAILFAST — the
  * same read-contract as [[CsvIngest]] (never infer in production: a
  * schema drift must fail the batch, not silently retype a column).
  * Text-format writes pin the engine NULL conventions (CSV `\N`
  * sentinel; JSONL omits null fields, which round-trips via the
  * explicit read schema).
  */
object Formats {

  val columnar: Seq[String] = Seq("parquet", "orc")
  val text: Seq[String] = Seq("csv", "json")
  val supported: Seq[String] = columnar ++ text

  def write(df: DataFrame, dir: String, format: String): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true").option("nullValue", "\\N")
      case _     => w
    }).save(dir)
  }

  def read(spark: SparkSession, dir: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    require(supported.contains(format), s"unsupported format $format")
    val r = spark.read.format(format)
    format match {
      case "csv" =>
        val s = schema.getOrElse(
          throw new IllegalArgumentException("csv read requires an explicit schema"))
        r.schema(s).option("header", "true").option("nullValue", "\\N")
          .option("mode", "FAILFAST").load(dir)
      case "json" =>
        val s = schema.getOrElse(
          throw new IllegalArgumentException("json read requires an explicit schema"))
        r.schema(s).option("mode", "FAILFAST").load(dir)
      case _ => schema.fold(r)(r.schema).load(dir)
    }
  }
}
