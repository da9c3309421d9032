package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.functions.GraftFunctions.jaroWinkler

class JaroWinklerSpec extends GraftTestBase {

  private def jw(a: String, b: String): Option[Double] = {
    import spark.implicits._
    val r = Seq((Option(a), Option(b))).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("j")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  behavior of "JaroWinklerSim"

  // The classic Winkler pairs, values probed against DuckDB's builtin
  // (the oracle q_jaro_winkler grades against) — bit-exact doubles.
  it should "reproduce the classic record-linkage pairs" in {
    jw("MARTHA", "MARHTA") shouldBe Some(0.9611111111111111)
    jw("DWAYNE", "DUANE") shouldBe Some(0.8400000000000001)
    jw("DIXON", "DICKSONX") shouldBe Some(0.8133333333333332)
  }

  it should "apply the boost only above the 0.7 jaro threshold" in {
    // jaro 0.4167 / 0.5556 with common prefixes — NO boost below 0.7
    jw("aXXXXXXX", "aYYYYYYY") shouldBe Some(0.4166666666666667)
    jw("abXXXX", "abYYYY") shouldBe Some(0.5555555555555555)
    // jaro 0.8667 with 3-char prefix → 0.8667 + 3·0.1·(1−0.8667)
    jw("TRATE", "TRACE") shouldBe Some(0.9066666666666667)
  }

  it should "halve transpositions as an integer (the DuckDB convention)" in {
    // 3-cycle matched sequences: t = 3 half-transpositions → t/2 = 1
    // (float halving would give 0.9285714285714286)
    jw("ABCDEFG", "BCADEFG") shouldBe Some(0.9523809523809524)
  }

  it should "pin the edge cases to DuckDB's conventions" in {
    jw("abc", "abc") shouldBe Some(1.0)
    jw("", "abc") shouldBe Some(0.0)
    jw("", "") shouldBe Some(0.0) // DuckDB: empty→0.0, NOT 1.0
    jw("a", "b") shouldBe Some(0.0)
    jw("ab", "ba") shouldBe Some(0.0) // window 0 → no matches
    jw(null, "x") shouldBe None
    jw("x", null) shouldBe None
  }

  it should "agree between codegen and interpreted eval" in {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("ABCDEFG", "BCADEFG"), ("", ""), ("ab", "ba"))
    pairs.foreach { case (a, b) =>
      val interpreted = JaroWinklerSim(
        Literal(UTF8String.fromString(a)), Literal(UTF8String.fromString(b)))
        .eval(null).asInstanceOf[Double]
      interpreted shouldBe
        JaroWinkler.jw(UTF8String.fromString(a), UTF8String.fromString(b))
    }
  }

  it should "be SQL-callable after registration" in {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS j").head().getDouble(0)
    r shouldBe 0.9611111111111111
  }
}
