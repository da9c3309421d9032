package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingest/egress — the event-feed counterpart to
  * [[CsvIngest]], same explicit-schema and bad-records discipline.
  *
  * Scale posture mirrors CSV: JSONL is splittable line-wise, so a glob
  * read parallelizes per file split; the explicit schema skips the
  * inference pass (which at 100 TB would read everything twice and can
  * widen types nondeterministically between samples). PERMISSIVE keeps
  * undecodable lines in a quarantine column instead of failing the batch
  * — at scale a poison record must never kill a 1000-executor job, but
  * it must stay auditable.
  */
object JsonIngest {

  /** Name of the quarantine column carrying the raw text of lines that
    * failed to parse under [[CsvIngest.Permissive]]. */
  val corruptCol = "_corrupt_record"

  /** Read JSONL files with an explicit schema.
    *
    * Under Permissive, rows whose line failed to parse have all data
    * columns NULL and the raw line in [[corruptCol]] (the column is added
    * to the schema here; Spark only populates it when declared). */
  def readJsonLines(
      spark: SparkSession,
      paths: Seq[String],
      schema: StructType,
      mode: CsvIngest.BadRecordsMode = CsvIngest.FailFast): DataFrame = {
    val withCorrupt = mode match {
      case CsvIngest.Permissive => schema.add(corruptCol, "string")
      case _ => schema
    }
    spark.read
      .schema(withCorrupt)
      .option("mode", mode.sparkMode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(paths: _*)
  }

  /** Write as JSON lines — one object per row, NULL fields omitted
    * (standard JSONL contract: absence means NULL). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
