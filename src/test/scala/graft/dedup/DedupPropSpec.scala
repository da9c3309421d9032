package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.GraftTestBase

/** Property tests for the dedup primitives' algebraic contracts —
  * the invariants every downstream pairing stage assumes, exercised on
  * generated word-soup documents rather than the harness corpus.
  *
  * Raw ScalaCheck `Gen` with a fixed seed ladder (the scalatest bridge
  * isn't in the offline cache), evaluated through the REAL Spark
  * expressions via a one-column DataFrame — the properties test the
  * codegen'd path, not a Scala re-implementation. */
class DedupPropSpec extends GraftTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private def overDocs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  behavior of "shinglesFromWords"

  it should "emit exactly max(0, n-2) distinct shingles of 3 words each" in {
    val texts = samples(doc, 60)
    val rows = overDocs(texts)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), org.apache.spark.sql.functions.size(col("w")).as("n"),
        Dedup.shinglesFromWords(col("w")).as("sh"))
      .collect()
    rows.foreach { r =>
      val n = r.getInt(1)
      val sh = r.getSeq[String](2)
      // distinct can only shrink the count, never below 1 when n >= 3
      if (n < 3) sh shouldBe empty
      else {
        sh.length should be <= (n - 2)
        sh.length should be >= 1
        all(sh.map(_.split(" ").length)) shouldBe 3
        sh.distinct.length shouldBe sh.length
      }
    }
  }

  behavior of "minhash signatures"

  it should "be identical for identical docs and word-order-sensitive" in {
    val base = samples(doc.suchThat(_.split(" ").length >= 4), 20)
    val texts = base ++ base // every doc twice
    val sigs = overDocs(texts)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), Dedup.shinglesFromWords(col("w")).as("sh"))
      .select(col("doc_id"), Dedup.shingleFingerprints(col("sh")).as("fp"))
      .select(col("doc_id"), Dedup.minhashSignature(col("fp")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    base.indices.foreach { i =>
      sigs(i.toLong) shouldBe sigs((i + base.length).toLong) // determinism
      sigs(i.toLong).length shouldBe Dedup.numHashes
      all(sigs(i.toLong)) should (be >= 0L and be < Dedup.minhashP)
    }
  }

  it should "give supersets of shingles signatures that minorize elementwise" in {
    // adding shingles can only LOWER each minhash coordinate — the
    // monotonicity LSH banding relies on
    val pairs = samples(doc.suchThat(_.split(" ").length >= 5), 20)
      .map(t => (t, t + " " + t.split(" ").take(3).mkString(" ")))
    import spark.implicits._
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "ta", "tb")
    val rows = df
      .select(col("id"), split(col("ta"), " ").as("wa"), split(col("tb"), " ").as("wb"))
      .select(col("id"), Dedup.shinglesFromWords(col("wa")).as("sa"),
        Dedup.shinglesFromWords(col("wb")).as("sb"))
      .select(col("id"), Dedup.shingleFingerprints(col("sa")).as("fa"),
        Dedup.shingleFingerprints(col("sb")).as("fb"))
      .select(col("id"), Dedup.minhashSignature(col("fa")).as("siga"),
        Dedup.minhashSignature(col("fb")).as("sigb"))
      .collect()
    rows.foreach { r =>
      val (a, b) = (r.getSeq[Long](1), r.getSeq[Long](2))
      a.zip(b).foreach { case (ai, bi) => bi should be <= ai }
    }
  }

  behavior of "simhash"

  it should "stay within 16 bits and ignore word order" in {
    val base = samples(doc.suchThat(_.split(" ").length >= 3), 30)
    val shuffled = base.map(_.split(" ").reverse.mkString(" "))
    val hs = overDocs(base ++ shuffled)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), Dedup.simhash(col("w")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.indices.foreach { i =>
      hs(i.toLong) should (be >= 0L and be < (1L << Dedup.simhashBits))
      // simhash is a bag-of-words statistic: word order must not matter
      hs(i.toLong) shouldBe hs((i + base.length).toLong)
    }
  }
}
