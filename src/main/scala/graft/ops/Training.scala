package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-pair construction — the step between a curated corpus and a
  * trainable dataset: contrastive/two-tower recommenders (and, with text
  * columns, embedding models) need (anchor, positive, negative) triples,
  * and the negatives are the part every ad-hoc pipeline gets wrong
  * (random sampling that silently includes positives, or RNG that makes
  * every retry a different dataset).
  *
  * Scale + determinism contract: negatives are HASH-generated, not
  * sampled — candidate id = md5(anchor|positive|slot) mod |domain|, a
  * pure projection (codegen'd, scan-speed, retry-stable, identical on
  * any cluster size), followed by one anti-join against the positive
  * set to evict collisions (the standard "sample then reject" trick,
  * but with deterministic proposals). The anti-join is the only
  * shuffle beyond the positive-set build; expected eviction rate is
  * the user's positive density (~1-2%), documented rather than
  * resampled — fixed-k-after-rejection needs a second proposal round,
  * same plan shape.
  */
object Training {

  /** Negative slots proposed per positive pair. */
  val negSlots = 2

  /** Deterministic negative sampling for (customer, part) purchase
    * pairs: every distinct positive proposes [[negSlots]] hash-derived
    * candidate parts from the full catalog; candidates that are
    * themselves positives for that customer are rejected by one
    * anti-join. Output is the surviving (anchor, slot, negative)
    * triples — byte-stable across runs, partitionings, and engines
    * (the oracle regenerates every proposal from the same md5
    * arithmetic). */
  def negativeSampling(s: SparkSession, d: String): DataFrame = {
    val positives = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .distinct()
    val domain = Tables.part(s, d)
      .agg((max(col("p_partkey")) + 1).as("p_domain"))
    val proposals = positives
      .crossJoin(broadcast(domain))
      .select(col("custkey"), col("partkey"), col("p_domain"),
        explode(array((0 until negSlots).map(lit): _*)).as("slot"))
      .select(col("custkey"), col("partkey"), col("slot"),
        pmod(conv(substring(md5(concat_ws("|",
          col("custkey"), col("partkey"), col("slot"))), 1, 15), 16, 10)
          .cast("long"), col("p_domain")).as("neg_partkey"))
    proposals
      .join(positives
        .select(col("custkey"), col("partkey").as("neg_partkey")),
        Seq("custkey", "neg_partkey"), "left_anti")
      .select(col("custkey"), col("partkey"),
        col("slot").cast("long").as("slot"), col("neg_partkey"))
  }

  val negativeSamplingSql: String =
    s"""WITH positives AS (
       |  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |dom AS (SELECT max(p_partkey) + 1 AS p_domain FROM part),
       |proposals AS (
       |  SELECT custkey, partkey, slot,
       |    CAST(CAST(('0x' || substr(md5(custkey || '|' || partkey || '|' || slot), 1, 15))
       |      AS BIGINT) % p_domain AS BIGINT) AS neg_partkey
       |  FROM positives CROSS JOIN dom
       |  CROSS JOIN (SELECT unnest(range(${negSlots})) AS slot))
       |SELECT p.custkey, p.partkey, p.slot, p.neg_partkey
       |FROM proposals p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM positives q
       |  WHERE q.custkey = p.custkey AND q.partkey = p.neg_partkey)""".stripMargin
}
