package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
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

  /** Schema-evolution read: a parquet table written incrementally across
    * schema versions (columns added over time) read against a TARGET
    * schema. `mergeSchema` unions the file footers; the projection then
    * pins column order, casts to the target types, and fills declared
    * defaults — so readers see ONE stable schema regardless of which
    * writer version produced each file. Null semantics match Delta's
    * evolution contract: a column some files already carry reads as null
    * from the files that predate it (a real null is indistinguishable
    * and must stay null); `defaults` apply only to target columns no
    * file has yet. Columns present on disk but absent from the target
    * are dropped (the reverse evolution).
    *
    * Scale note: mergeSchema's footer union is a distributed job over
    * file footers, not data — cheap even at millions of files; the
    * projection is a zero-shuffle per-row map. This is the
    * read-side half of schema evolution; the write side needs no
    * machinery at all (parquet files are self-describing). */
  def readEvolved(spark: SparkSession, dir: String, target: StructType,
      defaults: Map[String, Any] = Map.empty): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    val present = df.columns.toSet
    val cols: Array[Column] = target.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(defaults.getOrElse(f.name, null)).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}
