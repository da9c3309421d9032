package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Benchmark decontamination — the train/eval overlap audit every serious
  * LLM-data pipeline runs before training (the GPT-3 appendix-C / Llama
  * n-gram-collision check, re-expressed Spark-first).
  *
  * The "eval set" here is the deterministic held-out slice
  * `doc_id % 97 == 0` (~1% of the corpus), standing in for the benchmark
  * suite a real pipeline would load as a second table. Both operators key
  * off that same slice so the exact and fuzzy passes audit the same split.
  *
  * Scale shape (both ops): the eval side is the SMALL side by nature —
  * benchmarks are megabytes against a 100 TB corpus — so every eval-side
  * artifact (distinct gram set, LSH band table) broadcasts, and the train
  * side is touched exactly once: one scan, per-doc array work (no
  * pre-join shuffle, per-doc dedup happens inside `array_distinct`), one
  * broadcast hash join, one `doc_id`-keyed aggregate. Nothing in the plan
  * grows with corpus size except the embarrassingly-parallel scan.
  */
object Decontam {

  /** Collision gram length. Real pipelines use 8-13 word n-grams; the
    * harness corpus draws ~20-80-token docs from a ~40-word vocabulary,
    * so 5-grams give the same "rare unless copied" behavior at this
    * scale. */
  val gramLen = 5

  /** Eval-slice modulus: doc_id % 97 == 0 is the held-out set. */
  val evalMod = 97

  /** Contamination threshold: flag a train doc when >= 20% of its
    * distinct grams also appear in the eval set (5·overlap >= total,
    * exact integer arithmetic — no float threshold to diverge on). */
  val contamPctX5 = 5L

  private def toks: Column = split(col("text"), " ")

  /** Distinct `gramLen`-grams of a staged word-array column, as an array:
    * per-doc dedup INSIDE the row (array_distinct), so downstream needs no
    * (doc, gram) distinct shuffle. Docs shorter than `gramLen` get an
    * empty array (sequence() would count backwards on a negative stop —
    * guard explicitly). */
  def gramsFromWords(w: Column): Column =
    when(size(w) >= gramLen,
      array_distinct(transform(sequence(lit(1), size(w) - (gramLen - 1)),
        i => concat_ws(" ", (0 until gramLen).map(k => element_at(w, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** doc_id + staged distinct-gram array (words materialized in an inner
    * projection so the lambdas see a cheap attribute, not the split). */
  private def docGrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), gramsFromWords(col("w")).as("grams"))

  /** Exact n-gram decontamination: for every TRAIN doc, how many of its
    * distinct 5-grams appear anywhere in the eval slice, as a count and
    * in basis points, plus the contamination flag. Zero-gram docs (shorter
    * than the gram length) survive with zero counts via `explode_outer`.
    *
    * Output: (doc_id, n_grams, n_overlap, overlap_bp, contaminated),
    * one row per train doc. overlap_bp = ⌊10⁴·n_overlap/n_grams⌋ through
    * integer `div` — exact on both engines, no rounding convention. */
  def ngramOverlap(s: SparkSession, d: String): DataFrame = {
    val evalGrams = docGrams(s, d)
      .filter(col("doc_id") % evalMod === 0)
      .select(explode(col("grams")).as("g"))
      .distinct()
      .withColumn("hit", lit(1))
    val trainPairs = docGrams(s, d)
      .filter(col("doc_id") % evalMod =!= 0)
      .select(col("doc_id"), explode_outer(col("grams")).as("g"))
    trainPairs
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("g")).as("n_grams"), count(col("hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        when(col("n_grams") > 0, expr("n_overlap * 10000L div n_grams"))
          .otherwise(lit(0L)).as("overlap_bp"),
        (col("n_grams") > 0 &&
          col("n_overlap") * contamPctX5 >= col("n_grams")).as("contaminated"))
  }

  val ngramOverlapSql: String =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= $gramLen THEN list_distinct(list_transform(
       |      generate_series(1, len(w) - ${gramLen - 1}),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
       |    ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM words),
       |eval_g AS (
       |  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % $evalMod = 0),
       |train AS (
       |  SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % $evalMod <> 0),
       |agg AS (
       |  SELECT t.doc_id, count(t.g) AS n_grams, count(e.g) AS n_overlap
       |  FROM train t LEFT JOIN eval_g e ON t.g = e.g GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(a.n_grams, 0) AS n_grams,
       |  coalesce(a.n_overlap, 0) AS n_overlap,
       |  CASE WHEN coalesce(a.n_grams, 0) > 0
       |    THEN a.n_overlap * 10000 // a.n_grams ELSE 0 END AS overlap_bp,
       |  coalesce(a.n_grams, 0) > 0
       |    AND $contamPctX5 * coalesce(a.n_overlap, 0) >= a.n_grams AS contaminated
       |FROM grams d LEFT JOIN agg a USING (doc_id)
       |WHERE d.doc_id % $evalMod <> 0""".stripMargin

  /** Fuzzy decontamination: train docs that are NEAR-duplicates of an
    * eval doc — paraphrased or lightly-edited benchmark leakage that the
    * exact n-gram pass misses. Reuses [[Dedup]]'s minhash machinery
    * (same md5 fingerprints, same 16-hash/8-band signature), but the
    * pairing is a train×eval broadcast hash join on (band_idx, band_sig)
    * instead of a self-join: the eval band table is tiny and broadcasts,
    * the train side never shuffles its text — only 64-byte band keys flow.
    *
    * Output: one row per flagged train doc — how many distinct eval docs
    * it collides with and the strongest collision (bands shared with its
    * closest eval partner, out of ${Dedup.numBands}). */
  def minhashDecontam(s: SparkSession, d: String): DataFrame = {
    // band keys come straight off the memoized full-corpus
    // [[Dedup.signatures]] frame (featureless docs already excluded
    // there): the doc_id-mod train/eval split commutes with the per-row
    // signature map, so filtering the shared pinned frame is exactly
    // the old per-split signature build — minus two rebuilds of the
    // md5+minhash subtree per query (VERDICT r12 #1).
    def bandsOf(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        posexplode(array((0 until Dedup.numBands).map { b =>
          concat_ws("|",
            element_at(col("sig"), b * Dedup.bandWidth + 1),
            element_at(col("sig"), b * Dedup.bandWidth + 2))
        }: _*)).as(Seq("band_idx", "band_sig")))
    val sig = Dedup.signatures(s, d)
    val evalBands = bandsOf(sig.filter(col("doc_id") % evalMod === 0))
      .withColumnRenamed("doc_id", "eval_id")
    val trainBands = bandsOf(sig.filter(col("doc_id") % evalMod =!= 0))
    trainBands
      .join(broadcast(evalBands), Seq("band_idx", "band_sig"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_bands_shared"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"),
        max(col("n_bands_shared")).as("max_bands"))
  }

  /** Streaming rendering of [[ngramOverlap]]: audit documents AS THEY
    * LAND against the eval-set snapshot — the "no benchmark leakage
    * enters the corpus" gate moved inside the ingest stream. Stateless
    * by construction: the eval gram set collapses to ONE static row
    * that broadcast-joins every micro-batch (the static side is re-read
    * per batch, so an eval-suite refresh is picked up without a
    * restart), and the per-doc counts are row-local array arithmetic —
    * `array_intersect` against the doc's own distinct grams gives
    * exactly the batch form's distinct-collision count, with zero
    * streaming state to evict. Same output schema and flag rule as
    * [[ngramOverlap]]; per-prefix equality asserted in DecontamSpec. */
  def decontamStream(docStream: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalSet = evalDocs
      .select(explode(gramsFromWords(split(col("text"), " "))).as("g"))
      .distinct()
      .agg(collect_list(col("g")).as("eval_grams"))
      .withColumn("jk", lit(1))
    docStream
      .select(col("doc_id"), gramsFromWords(split(col("text"), " ")).as("grams"))
      .withColumn("jk", lit(1))
      .join(broadcast(evalSet), Seq("jk"), "left")
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        coalesce(size(array_intersect(col("grams"), col("eval_grams"))), lit(0))
          .cast("long").as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        when(col("n_grams") > 0, expr("n_overlap * 10000L div n_grams"))
          .otherwise(lit(0L)).as("overlap_bp"),
        (col("n_grams") > 0 &&
          col("n_overlap") * contamPctX5 >= col("n_grams")).as("contaminated"))
  }

  val minhashDecontamSql: String = {
    val sigExprs = (0 until Dedup.numHashes).map { j =>
      s"list_min(list_transform(fp, x -> (${Dedup.minhashA(j)} * x + ${Dedup.minhashB(j)}) % ${Dedup.minhashP}))"
    }
    val bandExprs = (0 until Dedup.numBands).map { b =>
      s"(sig[${b * Dedup.bandWidth + 1}] || '|' || sig[${b * Dedup.bandWidth + 2}])"
    }
    s"""WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
       |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM words),
       |fps AS (SELECT doc_id, list_transform(s,
       |  g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % ${Dedup.minhashP}) AS fp
       |  FROM sh WHERE len(s) > 0),
       |sig AS (SELECT doc_id, [${sigExprs.mkString(",\n  ")}] AS sig FROM fps),
       |bands AS (SELECT doc_id, i - 1 AS band_idx, [${bandExprs.mkString(",\n  ")}][i] AS band_sig
       |  FROM sig, generate_series(1, ${Dedup.numBands}) AS t(i)),
       |pairs AS (
       |  SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_bands_shared
       |  FROM bands t JOIN bands e
       |    ON t.band_idx = e.band_idx AND t.band_sig = e.band_sig
       |   AND t.doc_id % $evalMod <> 0 AND e.doc_id % $evalMod = 0
       |  GROUP BY 1, 2)
       |SELECT doc_id, count(*) AS n_eval_matches, max(n_bands_shared) AS max_bands
       |FROM pairs GROUP BY 1""".stripMargin
  }
}
