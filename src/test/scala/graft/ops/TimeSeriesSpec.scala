package graft.ops

import graft.GraftTestBase

class TimeSeriesSpec extends GraftTestBase {

  behavior of "scd2StatusHistory"

  it should "produce chained validity intervals with one open current version" in {
    val rows = TimeSeries.scd2StatusHistory(spark, sf).collect()
    rows should not be empty
    rows.groupBy(_.getLong(0)).values.foreach { versions =>
      val sorted = versions.toArray.sortBy(_.getInt(2))
      sorted.map(_.getInt(2)).toSeq shouldBe (1 to sorted.length)
      // exactly one open interval, and it is the last version
      sorted.count(_.isNullAt(4)) shouldBe 1
      sorted.last.isNullAt(4) shouldBe true
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // SCD-2 chain: this version closes exactly where the next opens
          a.get(4) shouldBe b.get(3)
          // versions exist only at status changes
          a.getString(1) should not be b.getString(1)
        case _ =>
      }
    }
  }

  it should "cover every customer that has orders" in {
    val nCustomers = graft.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    TimeSeries.scd2StatusHistory(spark, sf)
      .select("o_custkey").distinct().count() shouldBe nCustomers
  }

  behavior of "Privacy.kAnonymize"

  it should "suppress quasi-identifiers exactly below the k threshold" in {
    val rows = Privacy.kAnonymize(spark, sf).collect()
    rows.length shouldBe graft.Tables.customer(spark, sf).count().toInt
    // pseudonyms are unique (identity survives as an opaque join key)
    rows.map(_.getString(0)).distinct.length shouldBe rows.length
    rows.foreach { r =>
      val suppressed = r.isNullAt(1)
      r.isNullAt(2) shouldBe suppressed
      r.isNullAt(3) shouldBe suppressed
      if (r.getLong(4) >= Privacy.kThreshold) suppressed shouldBe false
      else suppressed shouldBe true
    }
    // every released QI combination really holds >= k customers
    val released = rows.filter(!_.isNullAt(1))
    released.groupBy(r => (r.getInt(1), r.getDouble(2), r.getString(3)))
      .values.foreach(_.length.toLong should be >= Privacy.kThreshold.toLong)
  }
}
