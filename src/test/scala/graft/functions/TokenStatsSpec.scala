package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.text.TextAnalysis

class TokenStatsSpec extends GraftTestBase {
  import spark.implicits._

  private def statsOf(texts: String*) =
    texts.toDF("text")
      .select(GraftFunctions.tokenStats(col("text"), TextAnalysis.stopwords).as("ts"))
      .select("ts.*")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  behavior of "TokenStats"

  it should "count tokens/distinct/subwords/stopwords/short in one pass" in {
    // "the cat sat on the mat": 6 tokens, 5 distinct ("the" twice),
    // subwords all ceil(3/3|2/3)=1 -> 6, stopwords "the","the" -> 2... plus "on"? not in list
    statsOf("the cat sat on the mat") shouldBe Array((6, 5, 6, 2, 6))
    statsOf("extraordinary") shouldBe Array((1, 1, 5, 0, 0)) // ceil(13/3)=5
  }

  it should "match split(text,' ') semantics on empty and repeated separators" in {
    // split keeps empty segments: "a  b" -> ["a","","b"]; "" -> [""]
    // ("a" is a stopword -> n_stopwords = 1)
    statsOf("a  b") shouldBe Array((3, 3, 2, 1, 3))
    statsOf("") shouldBe Array((1, 1, 0, 0, 1))
  }

  it should "count characters, not bytes, for multi-byte text" in {
    // "héé" = 3 chars -> 1 subword, short (<4)
    statsOf("héé") shouldBe Array((1, 1, 1, 0, 1))
  }

  it should "agree with the lambda-composed form on the real corpus" in {
    val F = org.apache.spark.sql.functions
    val toks = col("toks")
    val lambda = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        F.size(toks).cast("int").as("n_tokens"),
        F.size(array_distinct(toks)).cast("int").as("n_distinct"),
        TextAnalysis.subwordCountOf(toks).cast("int").as("n_subwords"),
        F.size(F.filter(toks, (t: org.apache.spark.sql.Column) =>
          t.isInCollection(TextAnalysis.stopwords))).cast("int").as("n_stopwords"),
        F.size(F.filter(toks, (t: org.apache.spark.sql.Column) =>
          F.length(t) < lit(4))).cast("int").as("n_short"))
    val native = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        GraftFunctions.tokenStats(col("text"), TextAnalysis.stopwords).as("ts"))
      .select(col("doc_id"), col("ts.n_tokens"), col("ts.n_distinct"),
        col("ts.n_subwords"), col("ts.n_stopwords"), col("ts.n_short"))
    lambda.exceptAll(native).count() shouldBe 0
    native.exceptAll(lambda).count() shouldBe 0
  }

  it should "stay inside whole-stage codegen" in {
    val plan = graft.Tables.documents(spark, sf)
      .select(GraftFunctions.tokenStats(col("text"), TextAnalysis.stopwords))
      .queryExecution.executedPlan.toString
    plan should include("*(1)") // the whole-stage-codegen stage marker
  }
}
