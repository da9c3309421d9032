package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate ("sketch") aggregation operators — the cardinality /
  * quantile estimators a 100 TB pipeline uses where exact answers cost a
  * full shuffle of distinct values.
  *
  * - `approx_count_distinct` = HyperLogLog++: fixed-size sketch per
  *   group, map-side combinable, error ~2.3% at the default rsd.
  * - `approx_percentile` = a mergeable quantile summary (Greenwald-
  *   Khanna-style): bounded memory, one pass.
  *
  * Approximate outputs are engine-specific (DuckDB's estimators differ),
  * so the raw estimates can never be hash-compared — but Spark's
  * estimators are DETERMINISTIC (HLL++ and the quantile summary are
  * hash/rank-based, seed-free), so their error against the in-query
  * exact values is a reproducible constant. The graded query therefore
  * emits the exact values (oracle-able directly) plus error-bound
  * BOOLEANS the oracle asserts as TRUE constants: the estimator's
  * contract is what's graded, the estimate itself stays approximate.
  * SketchSpec additionally asserts the raw estimates.
  */
object Sketches {

  /** Relative standard deviation requested from approx_count_distinct —
    * tighter than the 0.05 default because the graded bound below needs
    * real headroom (at the default, observed error reached 5.7% on this
    * corpus; at 0.02 it stays ~1%). */
  val hllRsd = 0.02
  /** Relative-error bound asserted for the HLL++ estimate — ~5× the
    * observed maximum across SFs (headroom measured, not hoped). */
  val hllRelErrBound = 0.10
  /** Relative-error bound for approx_percentile at the default accuracy
    * (rank error ≤ n/10000 — value-space slack for it). */
  val pctRelErrBound = 0.02

  /** Per-orderstatus cardinality + quantile sketches graded through
    * their error contracts: one pass, partial aggregation on every map
    * task; exact companions ride the same aggregate. The exact
    * percentile is the verifier only — its state is O(distinct values
    * per group) while the sketches stay fixed-size, which is the whole
    * point at 100 TB. */
  def orderSketches(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        count("*").as("n_rows"),
        countDistinct("o_custkey").as("custkeys_exact"),
        approx_count_distinct(col("o_custkey"), hllRsd).as("ck_approx"),
        expr("approx_percentile(o_totalprice, 0.5)").as("p50_est"),
        expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
        expr("approx_percentile(o_totalprice, 0.95)").as("p95_est"),
        expr("percentile(o_totalprice, 0.95)").as("p95_exact"),
        min("o_totalprice").as("price_min"),
        max("o_totalprice").as("price_max"))
      .select(col("o_orderstatus"), col("n_rows"), col("custkeys_exact"),
        (abs(col("ck_approx") - col("custkeys_exact")).cast("double") <=
          lit(hllRelErrBound) * col("custkeys_exact").cast("double")).as("hll_ok"),
        (abs(col("p50_est").cast("double") - col("p50_exact")) <=
          lit(pctRelErrBound) * col("p50_exact")).as("p50_ok"),
        (abs(col("p95_est").cast("double") - col("p95_exact")) <=
          lit(pctRelErrBound) * col("p95_exact")).as("p95_ok"),
        col("price_min"), col("price_max"))

  val orderSketchesSql: String =
    """SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkeys_exact,
      |  TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok,
      |  min(o_totalprice) AS price_min, max(o_totalprice) AS price_max
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Absolute RANK-error bound asserted for the custom
    * [[graft.functions.QuantileSketch]] estimates: the exact rank of the
    * estimated quantile value must sit within ±5% · n of the target
    * rank. Rank error (not value error) is what a quantile sketch
    * actually bounds — value error is data-scale-dependent. */
  val kllRankErrBound = 0.05

  /** The CUSTOM mergeable quantile sketch ([[graft.functions
    * .QuantileSketch]], KLL-shaped, O(k log n/k) state) graded through
    * its rank contract — the bounded-memory scale path for the exact
    * `percentile` aggregate (whose per-group state is O(distinct
    * values); see Analytics scaladoc). Two passes: the sketch + exact
    * quantiles per return flag, then a rank audit that joins the 3
    * estimate rows back (broadcast) and counts rows at-or-below each
    * estimate — turning the sketch's promise into in-query booleans the
    * oracle asserts as constants, per the q_sketches policy. */
  def quantileSketchCheck(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
    val est = li.groupBy("l_returnflag")
      .agg(graft.functions.QuantileSketch.udaf(col("l_extendedprice")).as("est"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_exact"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75_exact"))
    li.join(broadcast(est), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        first(col("p25_exact")).as("p25_exact"),
        first(col("p50_exact")).as("p50_exact"),
        first(col("p75_exact")).as("p75_exact"),
        sum(when(col("l_extendedprice") <= col("est").getItem(0), 1L)
          .otherwise(0L)).as("rank25"),
        sum(when(col("l_extendedprice") <= col("est").getItem(1), 1L)
          .otherwise(0L)).as("rank50"),
        sum(when(col("l_extendedprice") <= col("est").getItem(2), 1L)
          .otherwise(0L)).as("rank75"))
      .select(col("l_returnflag"), col("n_rows"),
        col("p25_exact"), col("p50_exact"), col("p75_exact"),
        (abs(col("rank25").cast("double") / col("n_rows") - 0.25) <=
          kllRankErrBound).as("sk25_ok"),
        (abs(col("rank50").cast("double") / col("n_rows") - 0.5) <=
          kllRankErrBound).as("sk50_ok"),
        (abs(col("rank75").cast("double") / col("n_rows") - 0.75) <=
          kllRankErrBound).as("sk75_ok"))
  }

  val quantileSketchCheckSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_exact,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_exact,
      |  TRUE AS sk25_ok, TRUE AS sk50_ok, TRUE AS sk75_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Relative-error bound asserted for the inclusion-exclusion overlap
    * estimate: three HLL estimates compound, so the slack is 3× the
    * single-sketch bound (each term's error ≤ [[hllRelErrBound]] of its
    * own cardinality ≤ of the union). */
  val overlapRelErrBound = 3 * hllRelErrBound

  /** AUDIENCE OVERLAP — |view-days ∩ purchase-days| by
    * inclusion-exclusion over HLL sketches (|A|+|B|−|A∪B|), the
    * standard trick because HLL unions are lossless but intersections
    * don't exist; next to the EXACT overlap computed in the same pass
    * (conditional distinct counts, one Expand-planned aggregate, no
    * self-join). Audience unit = USER-DAY (user_id composited with the
    * epoch day into one long — every user here touches every type
    * eventually, so user grain would be degenerate; at day grain the
    * overlap is a real ~35%). The exact quad oracles directly; the
    * estimate grades through its contract boolean (the q_sketches
    * policy). At 100 TB the exact side is the one you can't afford
    * (full distinct shuffle) and the sketch row is the product:
    * per-segment overlap matrices from mergeable per-segment
    * sketches. */
  def audienceOverlap(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        (col("user_id") * lit(1048576L) +
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date")))
          .as("ud"))
    def seg(t: String) = when(col("event_type") === t, col("ud"))
    val segU = when(col("event_type") === "view" ||
      col("event_type") === "purchase", col("ud"))
    ev.agg(
        countDistinct(seg("view")).as("viewers"),
        countDistinct(seg("purchase")).as("buyers"),
        countDistinct(segU).as("either"),
        approx_count_distinct(seg("view"), hllRsd).as("e_v"),
        approx_count_distinct(seg("purchase"), hllRsd).as("e_b"),
        approx_count_distinct(segU, hllRsd).as("e_u"))
      .select(col("viewers"), col("buyers"), col("either"),
        (col("viewers") + col("buyers") - col("either")).as("overlap_exact"),
        (abs((col("e_v") + col("e_b") - col("e_u")) -
            (col("viewers") + col("buyers") - col("either"))).cast("double")
          <= lit(overlapRelErrBound) *
            (col("viewers") + col("buyers") - col("either")).cast("double"))
          .as("overlap_est_ok"))
  }

  val audienceOverlapSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    user_id * 1048576 + date_diff('day', DATE '1970-01-01',
      |      CAST(ts AS DATE)) AS ud
      |  FROM events)
      |SELECT
      |  count(DISTINCT CASE WHEN event_type = 'view' THEN ud END)
      |    AS viewers,
      |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN ud END)
      |    AS buyers,
      |  count(DISTINCT CASE WHEN event_type IN ('view', 'purchase')
      |    THEN ud END) AS either,
      |  count(DISTINCT CASE WHEN event_type = 'view' THEN ud END)
      |    + count(DISTINCT CASE WHEN event_type = 'purchase' THEN ud END)
      |    - count(DISTINCT CASE WHEN event_type IN ('view', 'purchase')
      |        THEN ud END) AS overlap_exact,
      |  TRUE AS overlap_est_ok
      |FROM ev""".stripMargin

  /** Count-Min frequency estimation over the skew-planted key domain
    * (the q_heavy_hitters corpus: 3 hot keys ~70% of rows, a long cold
    * tail). The [[graft.functions.CountMin]] UDAF builds one 4×256
    * sketch per return flag; every distinct key's estimate is then read
    * back RELATIONALLY — `least` over `element_at(sketch, row·W +
    * h_j(x))` — so probing is pure column arithmetic on the broadcast
    * one-row-per-flag sketch, no second UDF. Output: the three hot
    * keys' exact vs estimated counts plus per-flag min/max slack
    * (estimate − exact) over ALL keys — min ≥ 0 IS the overestimate-only
    * guarantee, max bounds the additive error across the whole domain.
    *
    * Because CMS merge is cell-wise addition (commutative, associative,
    * merge-order independent — unlike SpaceSaving/KLL), the oracle
    * recomputes the SAME counters with a (flag, row, cell) GROUP BY and
    * the whole query hash-grades exactly: the only sketch in the
    * catalog graded cell-exact rather than via contract booleans. */
  def cmsFrequencies(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.CountMin
    val W = CountMin.width
    val p = CountMin.prime
    val keyed = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        when(col("l_partkey") % 10 < 7,
          concat(lit("hot_"), (col("l_partkey") % 3).cast("string")))
          .otherwise(concat(lit("cold_"), col("l_partkey").cast("string")))
          .as("pk"))
      .withColumn("x",
        pmod(conv(substring(md5(col("pk")), 1, 15), 16, 10).cast("long"),
          lit(p)))
    val sketch = keyed.groupBy("l_returnflag")
      .agg(CountMin.udaf(col("x")).as("sk"))
    val exact = keyed.groupBy(col("l_returnflag"), col("pk"), col("x"))
      .agg(count(lit(1)).as("c"))
    val estCols = (0 until CountMin.depth).map { j =>
      element_at(col("sk"),
        (lit(j * W) +
          ((lit(CountMin.rowA(j)) * col("x") + lit(CountMin.rowB(j))) % p) % W
          + 1).cast("int"))
    }
    val slack = Window.partitionBy("l_returnflag")
    exact.join(broadcast(sketch), Seq("l_returnflag"))
      .withColumn("est", least(estCols: _*))
      .withColumn("flag_min_slack", min(col("est") - col("c")).over(slack))
      .withColumn("flag_max_slack", max(col("est") - col("c")).over(slack))
      .filter(col("pk").startsWith("hot_"))
      .select(col("l_returnflag"), col("pk").as("item"),
        col("c").as("exact_count"), col("est").as("cms_estimate"),
        col("flag_min_slack"), col("flag_max_slack"))
  }

  val cmsFrequenciesSql: String = {
    import graft.functions.CountMin
    val rows = (0 until CountMin.depth).map { j =>
      s"(${j}, ${CountMin.rowA(j)}, ${CountMin.rowB(j)})"
    }.mkString(", ")
    s"""WITH keyed AS (
       |  SELECT l_returnflag,
       |    CASE WHEN l_partkey % 10 < 7
       |         THEN 'hot_' || CAST(l_partkey % 3 AS VARCHAR)
       |         ELSE 'cold_' || CAST(l_partkey AS VARCHAR) END AS pk
       |  FROM lineitem),
       |hx AS (
       |  SELECT l_returnflag, pk,
       |    CAST(('0x' || substr(md5(pk), 1, 15)) AS BIGINT)
       |      % ${CountMin.prime} AS x
       |  FROM keyed),
       |hrows(j, a, b) AS (VALUES $rows),
       |exact AS (
       |  SELECT l_returnflag, pk, x, count(*) AS c FROM hx GROUP BY 1, 2, 3),
       |cells AS (
       |  SELECT h.l_returnflag, r.j,
       |    ((r.a * h.x + r.b) % ${CountMin.prime}) % ${CountMin.width} AS cell,
       |    count(*) AS cc
       |  FROM hx h CROSS JOIN hrows r
       |  GROUP BY 1, 2, 3),
       |est AS (
       |  SELECT e.l_returnflag, e.pk, e.c, CAST(min(c2.cc) AS BIGINT) AS est
       |  FROM exact e
       |  JOIN hrows r ON true
       |  JOIN cells c2 ON c2.l_returnflag = e.l_returnflag AND c2.j = r.j
       |    AND c2.cell = ((r.a * e.x + r.b) % ${CountMin.prime})
       |      % ${CountMin.width}
       |  GROUP BY 1, 2, 3)
       |SELECT * FROM (
       |  SELECT l_returnflag, pk AS item, c AS exact_count,
       |    est AS cms_estimate,
       |    CAST(min(est - c) OVER f AS BIGINT) AS flag_min_slack,
       |    CAST(max(est - c) OVER f AS BIGINT) AS flag_max_slack
       |  FROM est
       |  WINDOW f AS (PARTITION BY l_returnflag))
       |WHERE item LIKE 'hot%'""".stripMargin
  }
}
