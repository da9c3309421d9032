package graft.text

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class WinnowingSpec extends GraftTestBase {

  behavior of "Winnowing.winnowFingerprints"

  it should "select a nonempty, strictly-sub-gram-count fingerprint set per doc" in {
    val rows = Winnowing.winnowFingerprints(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val (grams, sel, fp, shared) = (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_selected"), r.getAs[Long]("n_fp"),
        r.getAs[Long]("n_shared_fp"))
      sel should be > 0L               // a min exists in every doc
      sel should be < grams            // winnowing COMPRESSES
      fp should be <= sel              // distinct ≤ occurrences
      shared should be <= fp
      // expected density 2/(w+1) = 1/3; allow generous slack both ways
      sel.toDouble / grams should be < 0.6
    }
  }

  it should "match a driver-side replica of the centered-min selection" in {
    import java.security.MessageDigest
    def h(gram: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(gram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val replica = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val hs = toks.sliding(Winnowing.k).filter(_.length == Winnowing.k)
        .map(g => h(g.mkString(" "))).toArray
      val sel = hs.indices.count { i =>
        val lo = math.max(0, i - (Winnowing.w - 1))
        val hi = math.min(hs.length - 1, i + (Winnowing.w - 1))
        hs(i) == (lo to hi).map(hs).min
      }
      id -> (hs.length.toLong, sel.toLong)
    }
    val got = Winnowing.winnowFingerprints(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_selected"))).toMap
    got shouldBe replica
  }

  it should "share fingerprints for docs sharing a long run with interior minimum" in {
    import spark.implicits._
    // two docs sharing a 20-token passage (≥ k + 2(w-1) = 12) amid
    // noise. The centered-min variant's match property is CONDITIONAL:
    // it requires the run's minimal-hash gram to sit ≥ w-1 grams from
    // both run edges (see the scaladoc) — assert that precondition
    // explicitly so the test states its assumption instead of passing
    // by luck of where this passage's hash minimum lands
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    locally {
      import java.security.MessageDigest
      def h(gram: String): Long = {
        val hex = MessageDigest.getInstance("MD5").digest(gram.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
        java.lang.Long.parseLong(hex, 16)
      }
      val hs = passage.split(" ").sliding(Winnowing.k)
        .filter(_.length == Winnowing.k).map(g => h(g.mkString(" "))).toArray
      val argmin = hs.indexOf(hs.min)
      withClue("test passage must keep its min-hash gram interior: ") {
        argmin should be >= (Winnowing.w - 1)
        argmin should be <= (hs.length - Winnowing.w)
      }
    }
    val df = Seq(
      (1L, s"a1 a2 a3 a4 a5 $passage z1 z2 z3"),
      (2L, s"b1 b2 $passage y1 y2 y3 y4 y5 y6"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // reuse the operator against the staged mini-corpus
    val out = Winnowing.winnowFingerprints(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_fp")).toMap
    out(1L) should be > 0L
    out(2L) should be > 0L
    out(3L) shouldBe 0L
  }
}
