package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.streaming.EventStreams.Event

class StreamingSpec extends GraftTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  behavior of "sessionizeBatch"

  it should "split on gaps > 30 minutes and aggregate session stats" in {
    import spark.implicits._
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "a", 1.0),
      Event(3, ts("2024-01-01 11:30:00"), 1, "a", 1.0), // gap 80min -> new session
      Event(4, ts("2024-01-01 10:05:00"), 2, "b", 1.0)
    ).toDF()
    events.write.mode("overwrite").parquet("/tmp/graft-spec-events/events.parquet")
    val out = EventStreams.sessionizeBatch(spark, "/tmp/graft-spec-events")
      .orderBy("user_id", "session_seq").collect()
    out should have length 3
    out(0).getAs[Long]("n_events") shouldBe 2
    out(0).getAs[Long]("duration_sec") shouldBe 600
    out(1).getAs[Long]("n_events") shouldBe 1
    out(2).getAs[Long]("user_id") shouldBe 2
  }

  behavior of "hourlyTumbling (streaming)"

  it should "match the batch group-by on the same data" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.hourlyTumbling(
        input.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.format("memory").queryName("hourly_spec")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
        Event(2, ts("2024-01-01 10:55:00"), 2, "click", 3.0),
        Event(3, ts("2024-01-01 11:05:00"), 1, "view", 5.0))
      query.processAllAvailable()
      val got = spark.table("hourly_spec")
        .orderBy("hour", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      got shouldBe Array(
        ("2024-01-01 10:00:00.0", "click", 2L, 5.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0))
    } finally query.stop()
  }

  behavior of "sessionizeStream"

  it should "emit closed sessions matching batch semantics for in-order input" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // NoTimeout: a registered processing-time timeout would make
    // processAllAvailable block on the future timeout-servicing batch
    val query = EventStreams.sessionizeStream(input.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions_spec")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "a", 1.0))
      query.processAllAvailable()
      // second micro-batch: event past the gap closes the first session
      input.addData(Event(3, ts("2024-01-01 11:30:00"), 1, "a", 1.0))
      query.processAllAvailable()
      val out = spark.table("sessions_spec").collect()
      out should have length 1 // only the CLOSED session is emitted
      out(0).getAs[Long]("user_id") shouldBe 1
      out(0).getAs[Timestamp]("session_start") shouldBe ts("2024-01-01 10:00:00")
      out(0).getAs[Long]("n_events") shouldBe 2
      out(0).getAs[Long]("duration_sec") shouldBe 600
    } finally query.stop()
  }

  behavior of "dedupEvents (streaming)"

  it should "drop redelivered event_ids within the watermark horizon" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_spec")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0), // same-batch dup
        Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0))
      query.processAllAvailable()
      // redelivery in a later micro-batch, still inside the watermark
      input.addData(Event(1, ts("2024-01-01 10:02:00"), 1, "click", 1.0))
      query.processAllAvailable()
      val ids = spark.table("dedup_spec").collect().map(_.getAs[Long]("event_id"))
      ids.sorted shouldBe Array(1L, 2L)
    } finally query.stop()
  }

  behavior of "hourlyTumbling late data (append + watermark)"

  it should "drop events later than the watermark and emit closed windows once" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.hourlyTumbling(input.toDF())
      .writeStream.format("memory").queryName("late_spec")
      .outputMode("append").start()
    try {
      // batch 1: events in hour 10; advances watermark to 10:55 - 10min = 10:45
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:55:00"), 1, "click", 1.0))
      query.processAllAvailable()
      // batch 2: watermark jumps past hour 10 (12:30 -> 12:20), closing it
      input.addData(Event(3, ts("2024-01-01 12:30:00"), 1, "view", 1.0))
      query.processAllAvailable()
      // batch 3: a straggler for hour 10 — beyond the watermark, dropped
      input.addData(Event(4, ts("2024-01-01 10:30:00"), 1, "click", 9.0))
      query.processAllAvailable()
      val closed = spark.table("late_spec").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      // hour 10 emitted exactly once, with 2 events — the straggler's
      // count=3/value=10 never appears
      closed.count(_._1.startsWith("2024-01-01 10:00")) shouldBe 1
      closed.find(_._1.startsWith("2024-01-01 10:00")).get._3 shouldBe 2L
    } finally query.stop()
  }

  behavior of "slidingCounts (streaming)"

  it should "land each event in 4 overlapping windows" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("sliding_spec")
      .outputMode("complete").start()
    try {
      input.addData(Event(1, ts("2024-01-01 10:31:00"), 1, "click", 1.0))
      query.processAllAvailable()
      val rows = spark.table("sliding_spec").collect()
      rows should have length 4 // 1h window / 15min slide
      all(rows.map(_.getAs[Long]("n"))) shouldBe 1L
    } finally query.stop()
  }

  behavior of "driftHistogramStream"

  it should "match the batch histogram and compose to the batch PSI" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.driftHistogramStream(input.toDF())
      .writeStream.format("memory").queryName("drift_spec")
      .outputMode("complete").start()
    try {
      val events = Seq(
        // day 1 (reference): values clustered low
        Event(1, ts("2024-01-01 01:00:00"), 1, "click", 10.0),
        Event(2, ts("2024-01-01 02:00:00"), 1, "click", 40.0),
        Event(3, ts("2024-01-01 03:00:00"), 2, "click", 60.0),
        // day 2 (current): distribution shifted high
        Event(4, ts("2024-01-02 01:00:00"), 1, "click", 160.0),
        Event(5, ts("2024-01-02 02:00:00"), 2, "click", 210.0),
        Event(6, ts("2024-01-02 03:00:00"), 2, "click", 40.0))
      input.addData(events: _*)
      query.processAllAvailable()
      val got = spark.table("drift_spec")
        .collect()
        .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
        .toMap
      // batch equality: same (day, bucket) -> count map
      val batch = events.toDF()
        .groupBy(to_date(col("ts")).as("day"),
          (floor(col("value") / EventStreams.driftBucketWidth) *
            EventStreams.driftBucketWidth).cast("long").as("value_bucket"))
        .count()
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
        .toMap
      got shouldBe batch
      // PSI composes from the stream output exactly as from batch counts:
      // smoothed per-bucket (p-q)·ln(p/q) over the union of buckets
      val ref = got.collect { case ((d, b), n) if d == "2024-01-01" => b -> n }
      val cur = got.collect { case ((d, b), n) if d == "2024-01-02" => b -> n }
      val buckets = (ref.keySet ++ cur.keySet).toSeq
      val (tr, tc) = (ref.values.sum.toDouble, cur.values.sum.toDouble)
      val psi = buckets.map { b =>
        val p = (ref.getOrElse(b, 0L) + 1.0) / (tr + buckets.size)
        val q = (cur.getOrElse(b, 0L) + 1.0) / (tc + buckets.size)
        (p - q) * math.log(p / q)
      }.sum
      psi should be > 0.0 // the planted shift is visible
    } finally query.stop()
  }

  behavior of "enrichEvents (stream-static join)"

  it should "broadcast-join each micro-batch against the static dims" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dims = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val query = EventStreams.enrichEvents(input.toDF(), dims)
      .writeStream.format("memory").queryName("enrich_spec")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 3, "click", 1.0)) // no dim row
      query.processAllAvailable()
      val got = spark.table("enrich_spec")
        .select("event_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      got shouldBe Map(1L -> Some("gold"), 2L -> None) // left join keeps unmatched
    } finally query.stop()
  }

  behavior of "correlateStreams (stream-stream interval join)"

  it should "pair views with same-user clicks inside the 30-minute bound only" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val query = EventStreams.correlateStreams(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("corr_spec")
      .outputMode("append").start()
    try {
      views.addData(Event(10, ts("2024-01-01 10:00:00"), 1, "view", 1.0))
      clicks.addData(
        Event(20, ts("2024-01-01 10:10:00"), 1, "click", 1.0), // within 30min
        Event(21, ts("2024-01-01 11:10:00"), 1, "click", 1.0), // too late
        Event(22, ts("2024-01-01 10:10:00"), 2, "click", 1.0)) // other user
      query.processAllAvailable()
      val got = spark.table("corr_spec")
        .select("v_event", "c_event").collect().map(r => (r.getLong(0), r.getLong(1)))
      got shouldBe Array((10L, 20L))
    } finally query.stop()
  }

  behavior of "sessionWindowAgg"

  it should "cover every event with non-overlapping per-user sessions" in {
    import org.apache.spark.sql.expressions.Window
    val sess = EventStreams.sessionWindowAgg(spark, sf)
    sess.agg(sum("n_events")).head().getLong(0) shouldBe
      graft.Tables.events(spark, sf).count()
    val w = Window.partitionBy("user_id").orderBy("session_start")
    sess.withColumn("prev_end", lag("session_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start") < col("prev_end"))
      .count() shouldBe 0
  }

  behavior of "funnelStream"

  it should "emit stage transitions whose counts equal the batch funnel on the full event log" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed the REAL events table in event-time order, split across two
    // micro-batches, so state must carry stage progress between batches
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].orderBy("ts").collect()
    val (first, second) = all.splitAt(all.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_spec")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()
      val got = spark.table("funnel_spec").groupBy("stage").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = graft.ops.Behavior.funnelCounts(spark, sf).head()
      got.getOrElse("view", 0L) shouldBe b.getAs[Long]("n_view")
      got.getOrElse("view_click", 0L) shouldBe b.getAs[Long]("n_view_click")
      got.getOrElse("full_funnel", 0L) shouldBe b.getAs[Long]("n_full_funnel")
      // no user emits a stage twice
      spark.table("funnel_spec").groupBy("user_id", "stage").count()
        .filter(col("count") > 1).count() shouldBe 0
    } finally query.stop()
  }

  behavior of "transitionStream"

  it should "emit transition pairs whose counts equal the batch matrix across batch splits" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].orderBy("ts", "event_id").collect()
    // three uneven splits: state (the previous event type) must survive
    // both boundaries for the counts to come out right
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.transitionStream(input.toDS())
      .writeStream.format("memory").queryName("trans_spec")
      .outputMode("append").start()
    try {
      Seq(a, b, c).foreach { part =>
        input.addData(part.toSeq)
        query.processAllAvailable()
      }
      val got = spark.table("trans_spec")
        .groupBy("prev_type", "next_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.ops.Behavior.transitionMatrix(spark, sf)
        .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
          r.getAs[Long]("n")).toMap
      got shouldBe batch
    } finally query.stop()
  }

  behavior of "asofEnrichStream"

  it should "equal the batch as-of window at every prefix across batch splits" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].orderBy("ts", "event_id").collect()
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.asofEnrichStream(input.toDS())
      .writeStream.format("memory").queryName("asof_spec")
      .outputMode("append").start()
    try {
      Seq(a, b, c).foreach { part =>
        input.addData(part.toSeq)
        query.processAllAvailable()
      }
      val got = spark.table("asof_spec")
        .select("event_id", "asof_click_ts", "asof_click_value")
      val batch = graft.ops.TimeSeries.asofLatestClick(spark, sf)
        .select("event_id", "asof_click_ts", "asof_click_value")
      got.count() shouldBe all.length.toLong
      got.exceptAll(batch).count() shouldBe 0
      batch.exceptAll(got).count() shouldBe 0
    } finally query.stop()
  }

  behavior of "topkStream"

  it should "keep the latest per-type leaderboard equal to the batch top-k across splits" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].orderBy("ts", "event_id").collect()
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.topkStream(input.toDS())
      .writeStream.format("memory").queryName("topk_spec")
      .outputMode("append").start()
    try {
      Seq(a, b, c).foreach { part =>
        input.addData(part.toSeq)
        query.processAllAvailable()
      }
      // latest snapshot per event type is the current leaderboard
      val rows = spark.table("topk_spec").collect()
      val latest = rows.groupBy(_.getAs[String]("event_type")).toSeq.flatMap {
        case (_, rs) =>
          val maxSnap = rs.map(_.getAs[Long]("snapshot")).max
          rs.filter(_.getAs[Long]("snapshot") == maxSnap).toSeq
      }
      val got = latest.map(r => (r.getAs[String]("event_type"),
        r.getAs[Int]("rank"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"))).toSet
      // batch reference: exact per-(type,user) counts, top 3 per type
      val batch = all.groupBy(e => (e.event_type, e.user_id))
        .map { case ((t, u), es) => (t, u, es.length.toLong) }
        .groupBy(_._1).flatMap { case (_, g) =>
          g.toSeq.sortBy { case (_, u, n) => (-n, u) }.take(3).zipWithIndex
            .map { case ((t, u, n), i) => (t, i + 1, u, n) }
        }.toSet
      got shouldBe batch
      // every type emitted one snapshot per micro-batch that contained it
      rows.map(_.getAs[Long]("snapshot")).max shouldBe 3L
    } finally query.stop()
  }

  behavior of "quantileStream"

  it should "hold the sketch rank contract at the final snapshot per type" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].orderBy("ts", "event_id").collect()
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.quantileStream(input.toDS())
      .writeStream.format("memory").queryName("quant_spec")
      .outputMode("append").start()
    try {
      Seq(a, b, c).foreach { part =>
        input.addData(part.toSeq)
        query.processAllAvailable()
      }
      val rows = spark.table("quant_spec").collect()
      val byType = all.groupBy(_.event_type)
      byType.foreach { case (t, es) =>
        val latest = rows.filter(_.getAs[String]("event_type") == t)
          .maxBy(_.getAs[Long]("snapshot"))
        latest.getAs[Long]("n_seen") shouldBe es.length.toLong
        val sorted = es.map(_.value).sorted
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75").foreach {
          case (q, c) =>
            val est = latest.getAs[Double](c)
            val rank = sorted.count(_ <= est).toDouble / sorted.length
            math.abs(rank - q) should be <= 0.05
        }
      }
      // one snapshot per micro-batch per type that received data
      rows.map(_.getAs[Long]("snapshot")).max shouldBe 3L
    } finally query.stop()
  }

  behavior of "cmsStream"

  it should "equal the batch sketch at the final snapshot and overestimate-only" in {
    import spark.implicits._
    import graft.functions.CountMin
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].orderBy("ts", "event_id").collect()
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[Event]
    val query = EventStreams.cmsStream(input.toDS())
      .writeStream.format("memory").queryName("cms_spec")
      .outputMode("append").start()
    try {
      Seq(a, b, c).foreach { part =>
        input.addData(part.toSeq)
        query.processAllAvailable()
      }
      val rows = spark.table("cms_spec").collect()
      all.groupBy(_.event_type).foreach { case (t, es) =>
        val latest = rows.filter(_.getAs[String]("event_type") == t)
        val lastSnap = latest.map(_.getAs[Long]("snapshot")).max
        val fin = latest.filter(_.getAs[Long]("snapshot") == lastSnap)
        fin.head.getAs[Long]("n_seen") shouldBe es.length.toLong
        // micro-batch boundaries must not change the sketch: the
        // streamed estimates equal a single-pass batch sketch exactly
        val batchSketch = CountMin.finish(
          es.foldLeft(CountMin.zero)((bf, e) =>
            CountMin.reduce(bf, CountMin.keyHash(e.user_id.toString))))
        fin.foreach { r =>
          val u = r.getAs[Long]("user_id")
          val est = r.getAs[Long]("est")
          est shouldBe CountMin.estimate(batchSketch, CountMin.keyHash(u.toString))
          est should be >= es.count(_.user_id == u).toLong
        }
      }
      // probes × types × batches rows, snapshots sequenced per type
      rows.map(_.getAs[Long]("snapshot")).max shouldBe 3L
    } finally query.stop()
  }

  behavior of "incrementalTotals (streaming materialized view)"

  it should "refresh only touched keys and retain untouched partitions" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft-spec-mv"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val input = MemoryStream[Event]
    val query = EventStreams.incrementalTotals(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")),
      s"$dir/table", s"$dir/ckpt")
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 2.0),
        Event(2, ts("2024-01-01 10:01:00"), 2, "click", 3.0),
        Event(3, ts("2024-01-01 10:02:00"), 1, "view", 5.0))
      query.processAllAvailable()
      val mv1 = spark.read.parquet(s"$dir/table")
        .collect().map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      mv1 shouldBe Map("click" -> (2L, 5.0), "view" -> (1L, 5.0))
      // second batch touches only "click" — "view" partition must survive
      // untouched while click's totals include BOTH batches (state carries)
      input.addData(Event(4, ts("2024-01-01 10:03:00"), 3, "click", 10.0))
      query.processAllAvailable()
      val mv2 = spark.read.parquet(s"$dir/table")
        .collect().map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      mv2 shouldBe Map("click" -> (3L, 15.0), "view" -> (1L, 5.0))
    } finally query.stop()
  }

  behavior of "ohlcStream"

  it should "equal the batch OHLC bar at every micro-batch prefix" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.ohlcStream(
        input.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.format("memory").queryName("ohlc_spec")
      .outputMode("complete").start()
    def batchOhlc(rows: Seq[Event]): Map[String, (Long, Long, Long, Long, Long, Long)] =
      rows.groupBy(_.ts.toLocalDateTime.toLocalDate.toString).map {
        case (day, evs) =>
          val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
          def cents(e: Event): Long =
            BigDecimal(e.value).setScale(2,
              BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
          day -> (cents(sorted.head), evs.map(cents).max, evs.map(cents).min,
            cents(sorted.last), evs.size.toLong, evs.map(cents).sum)
      }
    val b1 = Seq(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.5),
      Event(2, ts("2024-01-01 11:55:00"), 2, "click", 9.0),
      Event(3, ts("2024-01-02 09:00:00"), 1, "view", 4.0))
    val b2 = Seq(
      Event(4, ts("2024-01-01 08:00:00"), 3, "view", 1.0), // new open day 1
      Event(5, ts("2024-01-02 23:00:00"), 2, "click", 0.5)) // new close day 2
    var seen = Seq.empty[Event]
    for (batch <- Seq(b1, b2)) {
      input.addData(batch: _*)
      query.processAllAvailable()
      seen ++= batch
      val got = spark.table("ohlc_spec").collect().map { r =>
        r.getAs[java.sql.Date]("day").toString ->
          (r.getAs[Long]("open"), r.getAs[Long]("high"), r.getAs[Long]("low"),
            r.getAs[Long]("close"), r.getAs[Long]("volume"),
            r.getAs[Long]("turnover"))
      }.toMap
      got shouldBe batchOhlc(seen)
    }
    query.stop()
  }
}
