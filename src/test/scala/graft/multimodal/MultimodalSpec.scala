package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftTestBase

class MultimodalSpec extends GraftTestBase {

  behavior of "mediaTable"

  it should "carry payloads as opaque binary with provenance" in {
    val mt = Multimodal.mediaTable(spark, sf)
    mt.schema("payload").dataType shouldBe BinaryType
    mt.count() shouldBe graft.Tables.documents(spark, sf).count()
  }

  behavior of "decodeFeatures"

  it should "emit the typed metadata contract and 4 features per row" in {
    val out = Multimodal.decodeFeatures(spark, sf)
    out.schema("meta").dataType shouldBe Multimodal.mediaMetaType
    val rows = out.collect()
    rows should have length graft.Tables.documents(spark, sf).count().toInt
    all(rows.map(_.getSeq[Float](2).length)) shouldBe 4
  }

  it should "agree with the SQL-side metadata projection" in {
    // the mapPartitions decode and the pure-SQL q_media_meta must see the
    // same bytes: byte_len computed by each path matches per id
    val decoded = Multimodal.decodeFeatures(spark, sf)
      .select(col("media_id"), col("meta.byte_len").as("len_decoded"))
    val meta = Multimodal.mediaMeta(spark, sf)
      .select(col("media_id"), col("byte_len").as("len_sql"))
    decoded.join(meta, "media_id")
      .filter(col("len_decoded") =!= col("len_sql"))
      .count() shouldBe 0
  }

  it should "be deterministic (same fake decode on re-run)" in {
    val a = Multimodal.decodeFeatures(spark, sf).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    val b = Multimodal.decodeFeatures(spark, sf).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    a shouldBe b
  }

  behavior of "sampleFrames"

  it should "explode payloads into deterministic frame rows with features" in {
    val out = Multimodal.sampleFrames(spark, sf, frameCount = 8, stride = 2)
    val rows = out.collect()
    rows.length should be > 0
    // stride 2 over 8 frames -> at most 4 frames per payload
    rows.groupBy(_.getLong(0)).values.foreach(_.length should be <= 4)
    val again = Multimodal.sampleFrames(spark, sf, frameCount = 8, stride = 2).collect()
    rows.map(r => (r.getLong(0), r.getInt(1), r.getFloat(3))).sorted shouldBe
      again.map(r => (r.getLong(0), r.getInt(1), r.getFloat(3))).sorted
  }

  behavior of "resizeStub and frameSampleStub"

  it should "shrink payloads and partition frames deterministically" in {
    val payload = Array.tabulate(1000)(_.toByte)
    Multimodal.resizeStub(payload, 8, 8).length should be < payload.length
    Multimodal.resizeStub(Array.emptyByteArray, 8, 8) shouldBe empty
    val frames = Multimodal.frameSampleStub(payload, 10, 1)
    frames should have length 10
    frames.map(_.length).sum should be <= payload.length
    Multimodal.frameSampleStub(payload, 0, 1) shouldBe empty
  }

  behavior of "decodeStub"

  it should "compute byte statistics exactly" in {
    val (meta, feats) = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    meta.getLong(0) shouldBe 3L
    feats(0) shouldBe 3f
    feats(1) shouldBe ((97 + 98 + 99) / 3.0f)
    feats(2) shouldBe 97f
    feats(3) shouldBe 99f
  }
}
