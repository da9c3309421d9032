package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Bloom-filter join pruning — the manual form of the runtime filter
  * AQE injects (InjectRuntimeFilter): build a bloom filter over the
  * build side's join keys, pre-filter the probe side BEFORE its shuffle,
  * then run the exact join on the survivors.
  *
  * Why it matters at 100 TB: a shuffle join materializes and ships the
  * ENTIRE probe side even when only a sliver of it has matching keys.
  * A few-MB bloom filter riding the task closure drops non-matching rows
  * at the scan, cutting exchange volume by the join's selectivity; false
  * positives only cost wasted shuffle bytes — never wrong results,
  * because the exact join still runs behind it. Same contract as Spark's
  * own runtime filter, exposed as an explicit operator so pipelines can
  * apply it where the optimizer's heuristics decline (e.g. a pre-staged
  * filter reused across several queries).
  *
  * The probe ([[graft.functions.BloomMightContain]]) is a native
  * codegen'd expression; keys are BIGINT (hash wider keys first —
  * `xxhash64` — the same normalization Spark's runtime filter does). */
object BloomPrune {

  /** Serialized bloom filter over `dim`'s LONG `key` column. */
  def buildFilter(dim: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Membership predicate column for a serialized filter. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    shims.column(graft.functions.BloomMightContain(
      shims.expression(key), filterBytes))

  /** Exact semi-join with bloom pre-pruning: result is IDENTICAL to
    * `fact.join(dim, key, "left_semi")` (false positives are removed by
    * the residual exact join); the bloom probe just keeps non-matching
    * fact rows out of the shuffle. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(dim, key, expectedItems, fpp)
    fact
      .filter(mightContain(col(key), bytes))
      .join(dim.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}
