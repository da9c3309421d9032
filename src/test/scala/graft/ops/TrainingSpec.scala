package graft.ops

import graft.GraftTestBase
import org.apache.spark.sql.functions.col

class TrainingSpec extends GraftTestBase {

  behavior of "Training.negativeSampling"

  it should "propose md5-derived negatives and reject all positives" in {
    val positives = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val domain = graft.Tables.part(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("p_partkey")))
      .collect().head.getLong(0) + 1
    def proposal(cust: Long, part: Long, slot: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$cust|$part|$slot".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % domain
    }
    val want = for {
      (c, p) <- positives.toSeq
      slot <- 0L until Training.negSlots.toLong
      neg = proposal(c, p, slot)
      if !positives((c, neg))
    } yield (c, p, slot, neg)
    val got = Training.negativeSampling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSet shouldBe want.toSet
    got.length shouldBe want.length // no duplicate proposals survive twice
    // no surviving negative is a positive for its anchor customer
    got.foreach { case (c, _, _, neg) => positives((c, neg)) shouldBe false }
    // rejection tracks positive density (≈20% at sf0.001's 200-part
    // catalog; sub-1% at real catalog sizes) — most proposals survive
    got.length.toDouble should be >
      0.5 * positives.size * Training.negSlots
  }

  it should "be stable across repartitioning (no RNG anywhere)" in {
    val a = Training.negativeSampling(spark, sf)
    val b = Training.negativeSampling(spark, sf).repartition(7)
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }
}
