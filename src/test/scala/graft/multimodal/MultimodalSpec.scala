package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftTestBase

class MultimodalSpec extends GraftTestBase {

  behavior of "the Ppm codec"

  it should "round-trip encode/decode byte-for-byte" in {
    val img = Ppm.renderPattern(seed = 41, w = 19, h = 7)
    val decoded = Ppm.decode(Ppm.encode(img))
    decoded.width shouldBe 19
    decoded.height shouldBe 7
    decoded.maxVal shouldBe 255
    decoded.pixels shouldBe img.pixels
  }

  it should "parse headers with comments and arbitrary whitespace" in {
    val img = Ppm.renderPattern(3, 2, 2)
    val hand = ("P6 # a comment\n  2\t2 # dims\n 255\n".getBytes("US-ASCII")
      ++ img.pixels)
    val decoded = Ppm.decode(hand)
    decoded.width shouldBe 2
    decoded.pixels shouldBe img.pixels
  }

  it should "fail loudly on corrupt payloads instead of decoding garbage" in {
    an[IllegalArgumentException] should be thrownBy Ppm.decode("JFIF".getBytes)
    val truncated = Ppm.encode(Ppm.renderPattern(1, 4, 4)).dropRight(5)
    an[IllegalArgumentException] should be thrownBy Ppm.decode(truncated)
  }

  it should "resample with exact nearest-neighbor indexing" in {
    // 4x2 -> 2x1: dst(0,0) maps to src(0,0), dst(0,1) to src(0,2)
    val img = Ppm.Image(4, 2, 255, Array.tabulate(24)(_.toByte))
    val small = Ppm.resizeNearest(img, 2, 1)
    small.pixels shouldBe Array[Byte](0, 1, 2, 6, 7, 8)
  }

  it should "seek frames lazily through a concatenated stream" in {
    val frames = (0 until 3).map(f => Ppm.renderPattern(9, 5, 3, f))
    val video = frames.flatMap(f => Ppm.encode(f)).toArray
    val out = Ppm.decodeFrames(video).toSeq
    out should have length 3
    out.zip(frames).foreach { case (a, b) => a.pixels shouldBe b.pixels }
  }

  behavior of "imageTable / decodeFeatures"

  it should "carry payloads as opaque binary, one valid P6 file per document" in {
    val mt = Multimodal.imageTable(spark, sf)
    mt.schema("payload").dataType shouldBe BinaryType
    mt.count() shouldBe graft.Tables.documents(spark, sf).count()
    // every payload is a spec-valid P6 file
    mt.collect().foreach { r =>
      noException should be thrownBy Ppm.decode(r.getAs[Array[Byte]]("payload"))
    }
  }

  it should "emit the typed metadata contract with REAL parsed dimensions" in {
    val out = Multimodal.decodeFeatures(spark, sf)
    out.schema("meta").dataType shouldBe Multimodal.mediaMetaType
    val rows = out.collect()
    rows should have length graft.Tables.documents(spark, sf).count().toInt
    all(rows.map(_.getSeq[Float](2).length)) shouldBe 4
    // parsed dims agree with the SQL-side projection of the generation
    // contract (the decode really read the header it was handed)
    val decoded = Multimodal.decodeFeatures(spark, sf)
      .select(col("media_id"), col("meta.width").as("w_dec"),
        col("meta.height").as("h_dec"))
    val meta = Multimodal.mediaMeta(spark, sf)
      .select(col("media_id"), col("img_width"), col("img_height"))
    decoded.join(meta, "media_id")
      .filter(col("w_dec") =!= col("img_width") ||
        col("h_dec") =!= col("img_height"))
      .count() shouldBe 0
  }

  it should "be deterministic on re-run" in {
    val a = Multimodal.decodeFeatures(spark, sf).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    val b = Multimodal.decodeFeatures(spark, sf).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    a shouldBe b
  }

  behavior of "sampleFrames"

  it should "demux every stride-th frame as a standalone decodable P6 file" in {
    val out = Multimodal.sampleFrames(spark, sf).collect()
    out.length should be > 0
    val perMedia = out.groupBy(_.getLong(0))
    val expect = (0 until Multimodal.videoFrames by Multimodal.frameStride)
    perMedia.values.foreach { frames =>
      frames.map(_.getInt(1)).sorted shouldBe expect
      frames.foreach { f =>
        noException should be thrownBy Ppm.decode(f.getAs[Array[Byte]]("frame"))
      }
    }
  }

  behavior of "resizeCensus"

  it should "produce fixed thumbnail dims for every image" in {
    val rows = Multimodal.resizeCensus(spark, sf).collect()
    all(rows.map(_.getInt(1))) shouldBe Multimodal.thumbW
    all(rows.map(_.getInt(2))) shouldBe Multimodal.thumbH
    // checksums vary across images (the resample read real pixels)
    rows.map(_.getLong(3)).distinct.length should be > 1
  }

  behavior of "Multimodal.audioCensus"

  it should "round-trip the PCM byte packing against a direct replica" in {
    val rows = Multimodal.audioCensus(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = r.getAs[Long]("n_samples").toInt
      // regenerate the contract directly (no bytes) and compare
      val sd = (id * 131) % Multimodal.pcmMod
      val samples = (0 until n).map(i => ((sd + 7L * i) % Multimodal.pcmMod) - 32768L)
      val nf = n / Multimodal.audioFrame
      val energy = samples.take(nf * Multimodal.audioFrame).map(v => v * v).sum
      val zc = samples.sliding(2).count(p => (p(1) >= 0) != (p(0) >= 0))
      r.getAs[Long]("n_frames") shouldBe nf.toLong
      r.getAs[Long]("energy") shouldBe energy
      r.getAs[Long]("zero_crossings") shouldBe zc.toLong
    }
    // descending energy with id tie-break
    rows.sliding(2).foreach { case Array(a, b) =>
      a.getAs[Long]("energy") should be >= b.getAs[Long]("energy")
    }
  }
}
