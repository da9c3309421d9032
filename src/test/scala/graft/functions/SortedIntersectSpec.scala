package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** [[SortedIntersectCount]] / [[SortedIntersect]] are drop-in
  * replacements for `size(array_intersect(...))` / `array_intersect`
  * on the sorted-distinct adjacency arrays the graph suite feeds them,
  * so the binding contract is EQUIVALENCE to the builtin on exactly
  * that input class — asserted here on randomized sorted arrays (with
  * duplicates, to pin the set semantics) through both the interpreted
  * eval and the codegen'd whole-stage path. */
class SortedIntersectSpec extends GraftTestBase {

  behavior of "sorted_intersect_count / sorted_intersect"

  it should "match array_intersect on randomized sorted arrays (codegen path)" in {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def sortedArr(): Seq[Long] =
      Seq.fill(rnd.nextInt(41))(rnd.nextLong(61)).sorted
    val cases = Seq.fill(200)((sortedArr(), sortedArr()))
    val got = cases.toDF("a", "b")
      .select(
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("c"),
        GraftFunctions.sortedIntersect(col("a"), col("b")).as("arr"),
        // qualified: scalatest Matchers' inherited `size` (SizeWord)
        // shadows the sql.functions import
        org.apache.spark.sql.functions.size(
          array_intersect(col("a"), col("b"))).cast("long").as("refc"),
        sort_array(array_intersect(col("a"), col("b"))).as("refarr"))
      .collect()
    got.foreach { r =>
      withClue(s"count vs builtin on $r: ") { r.getLong(0) shouldBe r.getLong(2) }
      withClue(s"array vs builtin on $r: ") {
        r.getSeq[Long](1) shouldBe r.getSeq[Long](3)
      }
    }
  }

  it should "count duplicates once (set semantics, like array_intersect)" in {
    import spark.implicits._
    val r = Seq((Seq(1L, 1L, 2L, 5L, 5L), Seq(1L, 2L, 2L, 5L, 9L)))
      .toDF("a", "b")
      .select(GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("c"),
        GraftFunctions.sortedIntersect(col("a"), col("b")).as("arr"))
      .head()
    r.getLong(0) shouldBe 3L
    r.getSeq[Long](1) shouldBe Seq(1L, 2L, 5L)
  }

  it should "handle empty and disjoint inputs" in {
    import spark.implicits._
    val rows = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 3L), Seq(2L, 4L)))
      .toDF("a", "b")
      .select(GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("c"),
        GraftFunctions.sortedIntersect(col("a"), col("b")).as("arr"))
      .collect()
    rows.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getSeq[Long](1) shouldBe Seq.empty
    }
  }

  it should "return null on null array input" in {
    val r = spark.sql(
      """SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>),
        |                              array(1L, 2L)) AS c,
        |       sorted_intersect(array(1L), CAST(NULL AS ARRAY<BIGINT>)) AS a
        |""".stripMargin).head()
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
  }

  it should "match the interpreted eval (no codegen) on the same inputs" in {
    // force the interpreted path through a literal-free eval:
    // exercise nullSafeEval directly via the expression API
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = ArrayData.toArrayData(Array(1L, 4L, 4L, 7L, 9L))
    val b = ArrayData.toArrayData(Array(2L, 4L, 7L, 7L, 10L))
    val lit = Literal.create(a,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))
    val litB = Literal.create(b, lit.dataType)
    SortedIntersectCount(lit, litB).eval(null) shouldBe 2L
    SortedIntersect(lit, litB).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq shouldBe Seq(4L, 7L)
  }

  it should "skip LEADING nulls but fail loudly on interior nulls (ADVICE r14)" in {
    // sort_array(asc) puts nulls first, so a leading-null run is legal
    // input for the public SQL face and must be skipped:
    spark.sql(
      """SELECT sorted_intersect_count(array(CAST(NULL AS BIGINT), 1L, 3L),
        |                              array(1L, 2L, 3L)) AS c
        |""".stripMargin).head().getLong(0) shouldBe 2L
    // an interior null can only come from unsorted/hand-built input —
    // pre-guard this read garbage from the null slot; now it throws
    // with the contract in the message (both eval paths):
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT sorted_intersect_count(array(1L, CAST(NULL AS BIGINT), 3L),
          |                              array(1L, 2L, 3L)) AS c
          |""".stripMargin).collect()
    }
    ex.getMessage should include("sorted")
    val ex2 = intercept[Exception] {
      spark.sql(
        """SELECT sorted_intersect(array(1L, 2L),
          |                        array(1L, CAST(NULL AS BIGINT))) AS a
          |""".stripMargin).collect()
    }
    ex2.getMessage should include("sorted")
  }

  it should "carry the sorted-input contract in DESCRIBE FUNCTION (ADVICE r14)" in {
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED sorted_intersect_count")
      .collect().map(_.getString(0)).mkString("\n")
    desc should include("sorted ascending")
  }

  it should "work as the registered SQL function over adjacency-shaped input" in {
    val got = spark.sql(
      """SELECT sorted_intersect_count(sort_array(collect_set(a)),
        |                              sort_array(collect_set(b))) AS c
        |FROM VALUES (3L, 5L), (1L, 3L), (5L, 1L), (7L, 9L) AS t(a, b)
        |""".stripMargin).head().getLong(0)
    // sets {1,3,5,7} ∩ {1,3,5,9} = {1,3,5}
    got shouldBe 3L
  }
}
