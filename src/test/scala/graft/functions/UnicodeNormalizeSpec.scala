package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.functions.GraftFunctions.nfcNormalize

class UnicodeNormalizeSpec extends GraftTestBase {

  // Escapes, not raw glyphs: the decomposed/composed distinction must
  // survive any re-encoding of this source file.
  private val cafeNfd = "cafe\u0301"  // e + COMBINING ACUTE ACCENT
  private val cafeNfc = "caf\u00e9"    // LATIN SMALL LETTER E WITH ACUTE

  private def norm(s: String): Option[String] = {
    import spark.implicits._
    val r = Seq(Option(s)).toDF("t")
      .select(nfcNormalize(col("t")).as("n")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  behavior of "NfcNormalize"

  it should "compose decomposed sequences to canonical form" in {
    norm(cafeNfd) shouldBe Some(cafeNfc)
    // Angstrom sign (U+212B) canonically composes to A-with-ring (U+00C5)
    norm("\u212b") shouldBe Some("\u00c5")
    // Hangul jamo sequence composes to a precomposed syllable
    norm("\u1100\u1161") shouldBe Some("\uac00")
  }

  it should "be the identity on already-normalized and ASCII text" in {
    norm("plain ascii text") shouldBe Some("plain ascii text")
    norm(cafeNfc) shouldBe Some(cafeNfc)
    norm("") shouldBe Some("")
  }

  it should "propagate null" in {
    norm(null) shouldBe None
  }

  it should "agree between codegen and interpreted eval" in {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val inputs = Seq(cafeNfd, "ascii", "\u212b x \u1100\u1161", "")
    inputs.foreach { in =>
      val interpreted = NfcNormalize(Literal(UTF8String.fromString(in)))
        .eval(null).asInstanceOf[UTF8String].toString
      interpreted shouldBe
        java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC)
      norm(in) shouldBe Some(interpreted)
    }
  }

  it should "be callable from SQL after registration" in {
    spark.sql(s"SELECT nfc_normalize('$cafeNfd') AS n").head()
      .getString(0) shouldBe cafeNfc
  }
}
