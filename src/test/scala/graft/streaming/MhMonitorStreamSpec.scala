package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.streaming.EventStreams.Event

/** Streaming face of the Mantel–Haenszel monitor: per-prefix equality
  * against a Scala reference of the batch semantics, and final-snapshot
  * equality against the actual batch operator — the established
  * streaming contract (micro-batch boundaries must not change any
  * adjudication). */
class MhMonitorStreamSpec extends GraftTestBase {

  /** Scala reference of [[graft.ops.Behavior.mantelHaenszel]]. */
  private def mhRef(events: Seq[Event])
      : (Long, Option[Double], Option[Double], Boolean) = {
    val cells = events.groupBy(e =>
      (EventStreams.weekStartEpochDay(e.ts), e.user_id)).view.mapValues {
      es => (es.size.toLong,
        if (es.exists(_.event_type == "purchase")) 1L else 0L)
    }.toMap
    var strata = Map.empty[Long, (Long, Long, Long, Long)]
    cells.foreach { case ((_, u), (n, c)) =>
      val s = math.min(n / 5, 4L)
      val v = EventStreams.variantHash(u)
      val (a, b, cc, dd) = strata.getOrElse(s, (0L, 0L, 0L, 0L))
      val upd =
        if (v == 1 && c == 1) (a + 1, b, cc, dd)
        else if (v == 1) (a, b + 1, cc, dd)
        else if (c == 1) (a, b, cc + 1, dd)
        else (a, b, cc, dd + 1)
      strata = strata.updated(s, upd)
    }
    var orNum = 0.0; var orDen = 0.0
    var sa = 0.0; var se = 0.0; var sv = 0.0; var k = 0L
    strata.toSeq.sortBy(_._1).foreach { case (_, (a, b, c, d)) =>
      k += 1
      val n = a + b + c + d
      if (n >= 2) {
        orNum += (a * d).toDouble / n.toDouble
        orDen += (b * c).toDouble / n.toDouble
        sa += a.toDouble
        se += ((a + b) * (a + c)).toDouble / n.toDouble
        sv += (BigInt(a + b) * (c + d) * (a + c) * (b + d)).toDouble /
          (n.toDouble * n * (n.toDouble - 1.0))
      }
    }
    def round(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val or = if (orDen > 0.0 && orNum > 0.0)
      Some(round(orNum / orDen, 6)) else None
    val chi = if (sv > 0.0)
      Some(math.pow(math.max(math.abs(sa - se) - 0.5, 0.0), 2) / sv)
    else None
    (k, or, chi.map(round(_, 4)), chi.exists(_ > 3.841458820694124))
  }

  behavior of "mhStream"

  it should "equal the batch MH monitor at every micro-batch prefix" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].orderBy("ts", "event_id").collect().toSeq
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.mhStream(input.toDS())
      .writeStream.format("memory").queryName("mh_spec")
      .outputMode("append").start()
    try {
      var seen = Seq.empty[Event]
      var snap = 0L
      for (part <- Seq(a, b, c)) {
        input.addData(part)
        query.processAllAvailable()
        seen ++= part
        snap += 1
        val rows = spark.table("mh_spec").collect()
          .filter(_.getAs[Long]("snapshot") == snap)
        rows should have length 1
        val r = rows.head
        val (k, or, chi, rej) = mhRef(seen)
        r.getAs[Long]("n_strata") shouldBe k
        Option(r.getAs[java.lang.Double]("or_mh")).map(_.toDouble) shouldBe or
        Option(r.getAs[java.lang.Double]("cmh_chi2")).map(_.toDouble) shouldBe
          chi
        r.getAs[Boolean]("reject_95") shouldBe rej
      }
      // final snapshot equals the REAL batch operator on the same table
      val batch = graft.ops.Behavior.mantelHaenszel(spark, sf).head()
      val fin = spark.table("mh_spec").collect()
        .maxBy(_.getAs[Long]("snapshot"))
      fin.getAs[Long]("n_strata") shouldBe batch.getAs[Long]("n_strata")
      fin.getAs[java.lang.Double]("or_mh").toDouble shouldBe
        batch.getAs[Double]("or_mh")
      fin.getAs[java.lang.Double]("log_or_mh").toDouble shouldBe
        batch.getAs[Double]("log_or_mh")
      fin.getAs[java.lang.Double]("cmh_chi2").toDouble shouldBe
        batch.getAs[Double]("cmh_chi2")
      fin.getAs[Boolean]("reject_95") shouldBe
        batch.getAs[Boolean]("reject_95")
    } finally query.stop()
  }
}
