package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing (north star, SURVEY.md §7.4): media as
  * opaque `BINARY` columns with typed metadata, batch feature extraction
  * via `mapPartitions`.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decoder; everything AROUND it —
  * schema, batch shape, partitioning, null behavior — is the real
  * production plumbing a codec would drop into.
  *
  * Scale notes: media bytes never shuffle (all ops are per-row/map-only);
  * metadata extraction streams partition iterators (constant memory per
  * task, no partition-sized materialization); a real decoder would bound
  * `spark.sql.files.maxPartitionBytes` so one task's batch of decoded
  * frames fits executor memory.
  */
object Multimodal {

  /** The typed metadata contract for a media column — what a real
    * pipeline would carry next to the raw bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Documents lifted to a media table: text bytes standing in for an
    * encoded image payload. In production this column arrives from the
    * source (parquet BINARY / object-store blobs); deriving it from
    * `text` here keeps the harness deterministic. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("origin"))

  /** FAKE DECODER — deterministic stand-in for an image decode.
    * A real implementation would parse the container header (PNG/JPEG)
    * and hand pixel buffers to the feature step; this derives "width" /
    * "height" / "format" from the payload bytes so tests have stable
    * expectations. The seam (bytes in → meta + features out) is the
    * production contract. */
  def decodeStub(payload: Array[Byte]): (Row, Array[Float]) = {
    val len = payload.length.toLong
    // fake dimensions: spread bytes into a plausible aspect ratio
    val w = (len % 640 + 32).toInt
    val h = (len % 480 + 24).toInt
    val meta = Row(len, "fake/raw", w, h)
    // fake feature vector: 4 moments of the byte distribution
    var sum = 0L; var min = 255; var max = 0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b; if (b < min) min = b; if (b > max) max = b
      i += 1
    }
    val mean = if (len == 0) 0f else sum.toFloat / len
    (meta, Array(len.toFloat, mean, min.toFloat, max.toFloat))
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("meta", mediaMetaType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batch decode: one `mapPartitions` pass, iterator-to-iterator (no
    * partition materialization), binary payloads consumed and dropped —
    * only metadata + features flow downstream. This is where a Pandas-UDF
    * / codec batch call would sit on a real cluster. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    mediaTable(s, d)
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (meta, feats) = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), meta, feats.toSeq)
        }
      }(enc)
  }

  /** FAKE RESIZE — the transform step of an image pipeline. A real
    * implementation rescales pixel buffers; this deterministic stand-in
    * keeps the contract (bytes in → bytes out, target dims in metadata)
    * by sampling every k-th byte so output size tracks the scale factor. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (payload.isEmpty) return payload
    val ratio = math.max(1, payload.length / math.max(1, targetW * targetH / 64))
    payload.indices.collect { case i if i % ratio == 0 => payload(i) }.toArray
  }

  /** FAKE FRAME SAMPLER — the video-decode step. Splits the payload into
    * `frameCount` equal "frames" and returns every `stride`-th one; a real
    * codec would seek keyframes. Deterministic: same payload, same frames. */
  def frameSampleStub(payload: Array[Byte], frameCount: Int, stride: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty || frameCount <= 0) return Seq.empty
    val frameLen = math.max(1, payload.length / frameCount)
    (0 until frameCount by math.max(1, stride)).map { f =>
      payload.slice(f * frameLen, math.min((f + 1) * frameLen, payload.length))
    }.filter(_.nonEmpty)
  }

  /** Frame-sampling over the media table: one mapPartitions pass explodes
    * each payload into sampled frame rows (media_id, frame_idx, frame
    * bytes, per-frame feature) — the shape a video pretraining pipeline
    * feeds downstream. Iterator-to-iterator; frames of one payload are
    * produced lazily so a long video never materializes whole. */
  def sampleFrames(s: SparkSession, d: String,
      frameCount: Int = 8, stride: Int = 2): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType),
      StructField("frame_mean", FloatType)))
    val enc = RowEncoder.encoderFor(schema)
    mediaTable(s, d)
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val frames = frameSampleStub(r.getAs[Array[Byte]]("payload"), frameCount, stride)
          frames.iterator.zipWithIndex.map { case (f, i) =>
            val mean = if (f.isEmpty) 0f else f.map(b => (b & 0xff).toFloat).sum / f.length
            Row(r.getLong(0), i, f, mean)
          }
        }
      }(enc)
  }

  /** Frame-sampling CENSUS — lifts the [[sampleFrames]] plumbing from
    * spec-only to DRIVER-GRADED: per media, how many frames the sampler
    * emitted, their total and first-frame byte lengths. The Spark side
    * aggregates the REAL mapPartitions output (binary frames and all);
    * the oracle re-derives the same numbers from the stub's integer
    * arithmetic (frameLen = max(1, len/frameCount), frames 0,2,4,6,
    * slice lengths clamped at payload end) — so the iterator-to-iterator
    * pipeline's observable shape is hash-checked, not just spec'd.
    * Scale: the aggregate keys by media_id (cardinality grows with
    * data); frames never shuffle — lengths are computed in the same
    * task that produced them. */
  def frameCensus(s: SparkSession, d: String): DataFrame =
    sampleFrames(s, d)
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("flen"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("flen")).as("frame_bytes"),
        min(when(col("frame_idx") === 0, col("flen"))).as("first_frame_bytes"))
      .orderBy("media_id")

  val frameCensusSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS len
      |  FROM documents),
      |f AS (
      |  SELECT media_id, u.f,
      |    greatest(1, len // 8) AS fl, len
      |  FROM m, UNNEST([0, 2, 4, 6]) AS u(f)),
      |fr AS (
      |  SELECT media_id, f,
      |    least((f + 1) * fl, len) - f * fl AS flen
      |  FROM f WHERE least((f + 1) * fl, len) - f * fl > 0)
      |SELECT media_id,
      |  count(*) AS n_frames,
      |  CAST(sum(flen) AS BIGINT) AS frame_bytes,
      |  CAST(min(CASE WHEN f = 0 THEN flen END) AS BIGINT)
      |    AS first_frame_bytes
      |FROM fr GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Oracle-checkable metadata projection: byte length, payload hash and
    * a header sample, computed SQL-side (no decode). The md5 is over the
    * text (DuckDB 1.0 cannot md5 blobs); identical bytes by construction. */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
      md5(col("text")).as("payload_md5"),
      substring(col("text"), 1, 12).as("header_sample"),
      ((length(encode(col("text"), "UTF-8")) % 640) + 32).cast("int").as("fake_width"),
      ((length(encode(col("text"), "UTF-8")) % 480) + 24).cast("int").as("fake_height"))

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS payload_md5,
      |  substr(text, 1, 12) AS header_sample,
      |  CAST(octet_length(encode(text)) % 640 + 32 AS INTEGER) AS fake_width,
      |  CAST(octet_length(encode(text)) % 480 + 24 AS INTEGER) AS fake_height
      |FROM documents""".stripMargin
}
