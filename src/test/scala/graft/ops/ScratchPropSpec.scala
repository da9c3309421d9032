package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.GraftTestBase

/** Property tests pinning the third-implementation battery's SCRATCH
  * forms against the engine expressions on GENERATED inputs — the
  * batteries (ThirdImplSpec 1–46) recompute each statistic over the
  * fixed corpus, which can't reach every edge (empty strings, equal
  * strings, singleton groups, tie runs at selection boundaries,
  * boundary coordinates). Raw ScalaCheck with a fixed seed ladder,
  * the EquivalencePropSpec pattern.
  */
class ScratchPropSpec extends GraftTestBase {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def stage(name: String, df: DataFrame): String = {
    val dir = Files.createTempDirectory("graft-sprop").toString
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  // ---- the scratch forms under test (copied from the batteries on
  // purpose: the property pins THIS rendering, not a shared helper) ----

  private def scratchJw(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val win = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val bTaken = new Array[Boolean](b.length)
    val aIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val bIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- a.indices) {
      var j = math.max(0, i - win)
      val hi = math.min(b.length - 1, i + win)
      var found = false
      while (j <= hi && !found) {
        if (!bTaken(j) && a(i) == b(j)) {
          bTaken(j) = true; aIdx += i; bIdx += j; found = true
        }
        j += 1
      }
    }
    val m = aIdx.length
    if (m == 0) return 0.0
    val bOrdered = bIdx.sorted
    val t = aIdx.indices.count(k => a(aIdx(k)) != b(bOrdered(k)))
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m.toDouble - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private def scratchLev(a: String, b: String): Int = {
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(b.length)
  }

  private def pcont(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    if (frac == 0.0) sorted(lo)
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  private def pdisc(sorted: IndexedSeq[Double], p: Double): Double =
    sorted(math.ceil(p * sorted.length).toInt - 1)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- generators ----

  /** ASCII word pairs biased toward the JW edge cases: empties, exact
    * equals, shared prefixes, transposed middles. */
  private val wordPair: Gen[(String, String)] = for {
    base <- Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    mode <- Gen.choose(0, 5)
    a = base
    b <- mode match {
      case 0 => Gen.const("")
      case 1 => Gen.const(base)
      case 2 => Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
      case 3 => Gen.const(base.take(4) + base.drop(4).reverse)  // transposed tail
      case 4 => Gen.alphaLowerChar.map(c => base.updated(5, c)) // one substitution
      case _ => Gen.choose(1, 7).map(k => base.take(k))         // prefix truncation
    }
  } yield (a, b)

  behavior of "scratch Jaro-Winkler vs the native expression"

  it should "agree on generated edge-case pairs" in {
    import spark.implicits._
    val pairs = samples(wordPair, 300, seed = 101L).distinct
    val got = pairs.toDF("a", "b")
      .select(graft.functions.GraftFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      g shouldBe (scratchJw(a, b) +- 1e-12)
    }
  }

  behavior of "scratch Levenshtein DP vs the Spark builtin"

  it should "agree on generated edge-case pairs" in {
    import spark.implicits._
    val pairs = samples(wordPair, 300, seed = 202L).distinct
    val got = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).collect().map(_.getInt(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      g shouldBe scratchLev(a, b)
    }
  }

  behavior of "scratch percentile forms vs the engine aggregates"

  it should "agree under tie runs and singleton groups" in {
    import spark.implicits._
    // status S has ONE row; others draw from 5 values so every quartile
    // boundary cuts a tie run
    val order: Gen[(String, Double)] = for {
      st <- Gen.oneOf("A", "A", "B", "B", "S")
      price <- Gen.oneOf(10.25, 10.25, 20.5, 30.75, 40.0)
    } yield (st, price)
    val rows = samples(order, 400, seed = 303L).zipWithIndex
      .map { case ((st, p), i) => (st, p, i.toLong) }
      .filter { case (st, _, i) => st != "S" || i == 0 } // singleton S
      .map { case (st, p, i) =>
        (i, i % 7, st, p, new java.sql.Timestamp(0L), "1-URGENT")
      }
    val dir = stage("orders", rows.toDF("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    val byStatus = rows.groupBy(_._3)
      .map { case (st, rs) => st -> rs.map(_._4).toVector.sorted }
    Analytics.percentilesByStatus(spark, dir).collect().foreach { r =>
      val v = byStatus(r.getAs[String]("o_orderstatus"))
      r.getAs[Double]("price_p50") shouldBe (r4(pcont(v, 0.5)) +- 1e-9)
      r.getAs[Double]("price_p90") shouldBe (r4(pcont(v, 0.9)) +- 1e-9)
    }
    Analytics.percentileDiscByStatus(spark, dir).collect().foreach { r =>
      val v = byStatus(r.getAs[String]("o_orderstatus"))
      r.getAs[Double]("p25_disc") shouldBe pdisc(v, 0.25)
      r.getAs[Double]("p50_disc") shouldBe pdisc(v, 0.5)
      r.getAs[Double]("p75_disc") shouldBe pdisc(v, 0.75)
    }
  }

  behavior of "scratch weighted-median walk vs the window form"

  it should "agree when the crossing lands inside a tie run" in {
    import spark.implicits._
    // 4 distinct prices, huge tied weights -> the 2*cum >= tot crossing
    // always lands inside a run of equal prices
    val li: Gen[(String, Double, Double)] = for {
      fl <- Gen.oneOf("A", "N", "R")
      price <- Gen.oneOf(11.11, 22.22, 33.33, 44.44)
      qty <- Gen.choose(1, 50).map(_.toDouble)
    } yield (fl, price, qty)
    val rows = samples(li, 500, seed = 404L)
    val dir = stage("lineitem",
      rows.toDF("l_returnflag", "l_extendedprice", "l_quantity"))
    val expect = rows.groupBy(_._1).map { case (fl, rs) =>
      val byPrice = rs.groupBy(_._2).map { case (p, xs) =>
        (p, xs.map(x => BigInt((x._3 * 100).round)).sum)
      }.toVector.sortBy(_._1)
      val tot = byPrice.map(_._2).sum
      var cum = BigInt(0)
      fl -> byPrice.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
    }
    Analytics.weightedMedianPrice(spark, dir).collect().foreach { r =>
      r.getAs[Double]("weighted_median_price") shouldBe
        expect(r.getAs[String]("l_returnflag"))
    }
  }

  behavior of "scratch Z-order interleave vs the key expression"

  it should "agree across the coordinate grid including boundaries" in {
    import spark.implicits._
    val coord: Gen[(Long, Long)] = for {
      x <- Gen.frequency((3, Gen.choose(0L, 255L)), (1, Gen.oneOf(0L, 1L, 254L, 255L)))
      y <- Gen.frequency((3, Gen.choose(0L, 255L)), (1, Gen.oneOf(0L, 1L, 254L, 255L)))
    } yield (x, y)
    val pts = samples(coord, 300, seed = 505L).distinct
    val got = pts.toDF("x", "y")
      .select(graft.ops.Layout.zorderKey(col("x"), col("y")))
      .collect().map(_.getLong(0))
    pts.zip(got).foreach { case ((x, y), g) =>
      var z = 0L
      for (i <- 0 until 8)
        z += ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      g shouldBe z
    }
  }

  behavior of "scratch Poisson-bootstrap weights vs the engine walk"

  it should "agree on generated order keys including huge ids" in {
    import spark.implicits._
    val key: Gen[Long] = Gen.frequency(
      (3, Gen.choose(1L, 100000L)),
      (1, Gen.choose(2000000000L, Long.MaxValue / 2)))
    val keys = samples(key, 60, seed = 606L).distinct
    val rows = keys.map(k => (k, 100.0 + (k % 900)))
    val dir = stage("orders", rows.toDF("o_orderkey", "o_totalprice"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(k: Long, rep: Int): Int = {
      val hex = md.digest(s"$k|$rep".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val u = (java.lang.Long.parseLong(hex.take(15), 16) %
        1073741824L).toDouble / 1073741824.0
      Resample.poissonCdf.indexWhere(u < _) match {
        case -1 => 6; case kk => kk
      }
    }
    val expect = (0 until Resample.numReplicates).map { rep =>
      rep -> rows.map { case (k, _) => weight(k, rep).toLong }.sum
    }.toMap
    Resample.bootstrapOrderPrice(spark, dir).collect().foreach { r =>
      r.getAs[Long]("n_eff") shouldBe expect(r.getAs[Int]("replicate"))
    }
  }
}
