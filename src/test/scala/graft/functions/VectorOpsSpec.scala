package graft.functions

import org.apache.spark.sql.functions.col

import graft.GraftTestBase

class VectorOpsSpec extends GraftTestBase {

  behavior of "DotProduct / L2Norm"

  it should "reproduce cosine_sim bit-for-bit via the hoisted-norm identity" in {
    import GraftFunctions.{cosineSim, dotProduct, l2Norm}
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"),
      l2Norm(col("embedding")).as("na"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"),
      l2Norm(col("embedding")).as("nb"))
    val both = a.join(b, col("ia") < col("ib"))
      .select(
        cosineSim(col("va"), col("vb")).as("fused"),
        (dotProduct(col("va"), col("vb")) / (col("na") * col("nb"))).as("hoisted"))
    // bit-identical, not approximately equal: same accumulation order,
    // same denominator grouping
    both.filter(col("fused") =!= col("hoisted")).count() shouldBe 0
    both.filter(col("fused").isNull =!= col("hoisted").isNull).count() shouldBe 0
    both.count() should be > 0L
  }

  it should "return null for zero-norm and null vectors, and dot 0 for empty" in {
    import GraftFunctions.{dotProduct, l2Norm}
    import spark.implicits._
    val df = Seq(
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 2.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f, 2.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("x", "y")
      .select(l2Norm(col("x")).as("nx"),
        dotProduct(col("x"), col("y")).as("dot"))
      .collect()
    df(0).isNullAt(0) shouldBe true  // zero norm -> null
    df(0).getDouble(1) shouldBe 0.0  // dot of zero vector is 0
    df(1).isNullAt(0) shouldBe true  // null array -> null norm
    df(1).isNullAt(1) shouldBe true  // null array -> null dot
    df(2).isNullAt(0) shouldBe true  // empty = zero norm
    df(2).getDouble(1) shouldBe 0.0
  }
}
