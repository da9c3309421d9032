package graft.ops

import graft.GraftTestBase
import org.apache.spark.sql.functions.col

class GraphSpec extends GraftTestBase {

  behavior of "Graph.coPurchaseTriangles"

  it should "census the sf0.001 co-purchase graph consistently" in {
    val r = Graph.coPurchaseTriangles(spark, sf).collect()
    r.length shouldBe 1
    val row = r.head
    val (nv, ne, nw, nt) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    nv should be > 0L
    // a simple graph has at most C(nv, 2) edges
    ne should be <= nv * (nv - 1) / 2
    // every triangle closes a wedge, and each triangle contains 3 wedges
    nt * 3 should be <= nw
  }

  behavior of "Graph.pageRank"

  it should "match an independent plain-Scala integer PageRank on sf0.001" in {
    // rebuild the graph driver-side and run the same recurrence in
    // ordinary Scala collections — an implementation-independent oracle
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val bi = edges.toSeq.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val deg = bi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = deg.view.mapValues(_ => 1000000L).toMap
    (1 to Graph.prIters).foreach { _ =>
      val contrib = bi.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = deg.map { case (x, _) => x -> (150000L + 850L * contrib(x) / 1000L) }
    }
    val want = r.toSeq.sortBy { case (x, rk) => (-rk, x) }.take(20)
    val got = Graph.pageRank(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(2))).toSeq
    got shouldBe want
  }

  behavior of "bfsHops"

  it should "match a driver-side multi-source BFS census" in {
    val e = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = e.groupBy(_._1).values
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    byOrder.foreach { basket =>
      val ps = basket.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) adj(a) = adj(a) + b
    }
    val seeds = adj.keySet.filter(_ % 500 == 0).toSet
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to Graph.bfsMaxHops) {
      val next = frontier.flatMap(adj).diff(dist.keySet)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    val want = dist.groupBy(_._2).map { case (h, m) =>
      (h, m.size.toLong, m.keys.sum)
    }.toSet
    val got = Graph.bfsHops(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe want
    // multi-level expansion must actually happen or the test is vacuous
    // (the co-purchase graph is dense: sf0.001 saturates within 2 hops,
    // so asserting the full bound is reached would overfit the corpus)
    want.map(_._1).max should be >= 1
  }

  behavior of "ssspBounded"

  it should "match a driver-side bounded-hop Bellman-Ford" in {
    val e = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
      .withDefaultValue(Set.empty)
    e.groupBy(_._1).values.foreach { basket =>
      val ps = basket.map(_._2).distinct
      for (a <- ps; b <- ps if a != b)
        adj(a) = adj(a) + ((b, 1 + (a + b) % 9))
    }
    val seeds = adj.keySet.filter(_ % 500 == 0).toSet
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to Graph.ssspMaxHops) {
      val relaxed = dist.toSeq
        .flatMap { case (u, c) => adj(u).map { case (v, w) => v -> (c + w) } }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, cs) => v -> cs.map(_._2).min }
    }
    val got = Graph.ssspBounded(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dist")).toMap
    got shouldBe dist
    // weights must matter: some vertex's cheapest COST must exceed its
    // unweighted hop distance (all-unit weights would make them equal)
    var hops = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to Graph.ssspMaxHops) {
      val next = frontier.flatMap(u => adj(u).map(_._1)).diff(hops.keySet)
      hops = hops ++ next.map(_ -> h.toLong)
      frontier = next
    }
    got.count { case (v, c) => c > hops(v) } should be > 0
  }

  behavior of "kCorePeeling"

  it should "match a driver-side peeling cascade at the median degree" in {
    val e = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var es = e.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    def degrees(s: Set[(Long, Long)]): Map[Long, Int] =
      (s.toSeq.map(_._1) ++ s.toSeq.map(_._2))
        .groupBy(identity).view.mapValues(_.size).toMap
    // percentile_disc(0.5): smallest value with cumulative fraction >= .5
    val d0 = degrees(es).values.toSeq.sorted
    val k = d0((d0.length + 1) / 2 - 1)
    var want = Seq((0, degrees(es).size.toLong, es.size.toLong))
    for (r <- 1 to Graph.kcoreRounds) {
      val keep = degrees(es).filter(_._2 >= k).keySet
      es = es.filter(p => keep(p._1) && keep(p._2))
      want = want :+ ((r, degrees(es).size.toLong, es.size.toLong))
    }
    val got = Graph.kCorePeeling(spark, sf).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_vertices"),
        r.getAs[Long]("n_edges")))
    got.map(_._1).sorted shouldBe (0 to Graph.kcoreRounds)
    got.sortBy(_._1) shouldBe want
    // peeling must actually remove something in round 1
    want(1)._2 should be < want(0)._2
  }

  it should "count triangles exactly on a hand-built graph" in {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 triangles)
    // encoded as orders: each "order" is a clique over its parts only if
    // the parts pairwise co-occur — so one order per edge gives exactly
    // the edge set
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val li = edges.zipWithIndex.flatMap { case ((u, v), o) =>
      Seq((o.toLong, u), (o.toLong, v))
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graphspec").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val row = Graph.coPurchaseTriangles(spark, dir).collect().head
    row.getLong(0) shouldBe 5L  // vertices
    row.getLong(1) shouldBe 7L  // edges
    row.getLong(3) shouldBe 4L  // triangles in K4
  }

  behavior of "labelPropagation"

  it should "match a driver-side synchronous LPA with the same tie rule" in {
    val pairs = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
    val undirected = pairs.flatMap { ps =>
      val xs = ps.map(_._2).distinct.sorted
      for (i <- xs.indices; j <- (i + 1) until xs.length) yield (xs(i), xs(j))
    }.toSet
    val adj = (undirected.toSeq ++ undirected.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = adj.keys.map(x => x -> x).toMap
    for (_ <- 1 to Graph.lpaRounds) {
      lbl = adj.map { case (x, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size).toSeq
        // argmax by (count, then smallest label)
        x -> counts.maxBy { case (l, c) => (c.toLong, -l) }._1
      }
    }
    val m = undirected.size.toLong
    val comm = lbl.groupBy(_._2).map { case (c, vs) =>
      val members = vs.keySet
      val eIn = undirected.count(e => members(e._1) && members(e._2)).toLong
      val dSum = members.toSeq.map(adj(_).size.toLong).sum
      (c, (vs.size.toLong, eIn, dSum))
    }
    val qNum = comm.values.foldLeft(BigInt(0)) { case (acc, (_, eIn, dSum)) =>
      acc + BigInt(4) * BigInt(m) * BigInt(eIn) - BigInt(dSum) * BigInt(dSum)
    }
    val modularity = (BigDecimal(qNum) / (BigDecimal(4) * BigDecimal(m) * BigDecimal(m)))
      .toDouble
    val out = Graph.labelPropagation(spark, sf).collect()
    out.length shouldBe math.min(20, comm.size)
    out.foreach { r =>
      val (n, eIn, dSum) = comm(r.getLong(0))
      r.getAs[Long]("n_members") shouldBe n
      r.getAs[Long]("internal_edges") shouldBe eIn
      r.getAs[Long]("degree_sum") shouldBe dSum
      r.getAs[Double]("modularity") shouldBe modularity +- 2e-6
    }
    // top-20 ordering by (size desc, label asc)
    val sizes = out.map(r => (r.getAs[Long]("n_members"), r.getLong(0)))
    sizes.sliding(2).foreach {
      case Array((na, la), (nb, lb)) =>
        assert(na > nb || (na == nb && la < lb))
      case _ =>
    }
  }
}
