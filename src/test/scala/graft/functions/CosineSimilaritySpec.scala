package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftTestBase
import graft.functions.GraftFunctions.cosineSim

class CosineSimilaritySpec extends GraftTestBase {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType), nullable = true),
    StructField("b", ArrayType(FloatType), nullable = true)))

  private def df(rows: (Seq[java.lang.Float], Seq[java.lang.Float])*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (a, b) =>
        Row(if (a == null) null else a, if (b == null) null else b)
      }: _*),
      schema)

  private def sim(a: Seq[java.lang.Float], b: Seq[java.lang.Float]): Option[Double] = {
    val r = df((a, b)).select(cosineSim(col("a"), col("b")).as("s")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  behavior of "CosineSimilarity"

  it should "compute exact cosine for known vectors" in {
    sim(Seq(1f, 2f), Seq(3f, 4f)).get shouldBe (11.0 / (math.sqrt(5) * 5)) +- 1e-12
    sim(Seq(1f, 0f), Seq(0f, 1f)).get shouldBe 0.0 +- 1e-12
    sim(Seq(1f, 1f), Seq(-1f, -1f)).get shouldBe -1.0 +- 1e-12
  }

  it should "be 1.0 for any vector with itself" in {
    val self = graft.Tables.embeddings(spark, sf)
      .select(cosineSim(col("embedding"), col("embedding")).as("s"))
      .agg(min("s"), max("s")).head()
    self.getDouble(0) shouldBe 1.0 +- 1e-9
    self.getDouble(1) shouldBe 1.0 +- 1e-9
  }

  it should "return null for null arrays and zero-norm vectors" in {
    sim(null, Seq(1f, 2f)) shouldBe None
    sim(Seq(0f, 0f), Seq(1f, 2f)) shouldBe None
  }

  it should "treat null elements as zero and use the shorter length" in {
    sim(Seq(1f, null), Seq(1f, 5f)).get shouldBe 1.0 / math.sqrt(26) +- 1e-12
    // BOTH vectors truncate to the shorter length: cos([3],[3]) = 1
    sim(Seq(3f), Seq(3f, 4f)).get shouldBe 1.0 +- 1e-12
  }

  it should "agree between interpreted eval and codegen paths" in {
    // Single-row local relations take the interpreted path under
    // ConvertToLocalRelation; a parquet-backed scan goes through
    // whole-stage codegen. Same inputs, same answers = doGenCode and
    // nullSafeEval agree.
    val emb = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
    val viaCodegen = emb.as("x").crossJoin(emb.as("y"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
        cosineSim(col("x.embedding"), col("y.embedding")).as("s"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val local = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (((i, j), s) <- viaCodegen) {
      val (a, b) = (local(i), local(j))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      s shouldBe (dot / (na * nb)) +- 1e-9
    }
  }

  it should "be rewritten to SelfCosine by the optimizer for identical inputs" in {
    val df = graft.Tables.embeddings(spark, sf)
      .select(cosineSim(col("embedding"), col("embedding")).as("s"))
    df.queryExecution.optimizedPlan.toString should include("self_cosine")
    // ...and the rewrite preserves semantics
    val vals = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    all(vals) shouldBe Some(1.0)
    // distinct inputs must NOT be rewritten
    val df2 = graft.Tables.embeddings(spark, sf).limit(5).as("x")
      .crossJoin(graft.Tables.embeddings(spark, sf).limit(5).as("y"))
      .select(cosineSim(col("x.embedding"), col("y.embedding")).as("s"))
    df2.queryExecution.optimizedPlan.toString should not include "self_cosine"
  }

  it should "resolve through the SQL function registry" in {
    GraftFunctions.register(spark)
    graft.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_spec")
    val n = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM emb_spec WHERE vec_id < 3")
      .collect()
    n should have length 3
    all(n.map(_.getDouble(0))) shouldBe 1.0 +- 1e-9
  }
}
