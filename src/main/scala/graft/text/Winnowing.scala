package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm) — the sub-document near-dup detector that complements
  * whole-document MinHash ([[graft.dedup.Dedup]]): instead of sketching
  * the document once, select a POSITION-ROBUST subset of its k-gram
  * hashes so two documents sharing any sufficiently long passage share
  * selected fingerprints, wherever the passage sits.
  *
  * Rendering (the local-minimum variant): hash every k-gram (k = [[k]])
  * to a 48-bit integer, then select position i iff its hash is the
  * minimum of the centered window of `2·w − 1` grams (w = [[w]]).
  * Match property — stated precisely, because the centered-min variant
  * is WEAKER than classic rightmost-min winnowing: if two documents
  * share a run of ≥ k + 2(w − 1) identical tokens AND the run's
  * minimal-hash gram lies at least w − 1 grams from both run edges
  * (probability ≈ (m − 2w + 2)/m for a run of m grams under uniform
  * hashing), that gram's centered window falls entirely inside the
  * shared run, so it is selected in BOTH documents. When the minimum
  * hugs a run edge, its centered window sees doc-specific context and
  * the docs can share zero fingerprints — classic winnowing
  * (rightmost-min per trailing window) carries the unconditional
  * guarantee at the cost of an order-dependent tie rule; this variant
  * trades those tail cases for a tie rule (`==` on the window min,
  * tied positions all selected) that is deterministic and engine- and
  * partitioning-independent, which is what the oracle gate needs.
  *
  * Scale: gram expansion costs ONE hash-partition shuffle of the
  * exploded token rows (the lead() window keys on doc_id — O(total
  * tokens) shuffle volume, with per-doc parallelism and no
  * single-partition funnel; "zero shuffle" it is not); the sharing
  * census shuffles only DISTINCT SELECTED hashes (a ~2/w fraction of
  * grams — the whole point of winnowing is that the selected set is
  * small), map-side combinable. Nothing touches the driver.
  *
  * Output, per document: gram/selected/distinct-fingerprint counts plus
  * `n_shared_fp` = how many of its distinct selected fingerprints are
  * also selected in some OTHER document — the MOSS match signal.
  * Contract: documents with fewer than k tokens produce NO complete
  * gram and therefore NO output row (identical in both engines — the
  * test corpus has no doc that short, so all 500 appear at sf0.01 —
  * but consumers computing corpus-wide coverage from this output must
  * left-join [[graft.Tables.documents]] themselves; blockDedup /
  * seqPackCensus cover every doc if that is the contract needed).
  */
object Winnowing {

  /** Gram width (tokens per k-gram). */
  val k = 4
  /** Winnowing window: one fingerprint guaranteed per `w` consecutive
    * grams in the classic formulation; the centered-min variant keeps
    * the same expected density 2/(w + 1). */
  val w = 5

  def winnowFingerprints(s: SparkSession, d: String): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("tok"),
          lead(col("tok"), 1).over(byPos),
          lead(col("tok"), 2).over(byPos),
          lead(col("tok"), 3).over(byPos)).as("gram"),
        lead(col("tok"), k - 1).over(byPos).isNotNull.as("complete"))
      .filter(col("complete"))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("gram")), 1, 12), 16, 10).cast("long").as("h"))
    val centered = byPos.rowsBetween(-(w - 1), w - 1)
    val selected = grams
      .withColumn("selected", col("h") === min(col("h")).over(centered))
    // distinct selected fingerprints per doc, then the cross-doc census:
    // shuffle volume is O(distinct selected hashes), never O(grams)
    val docFp = selected.filter(col("selected"))
      .select(col("doc_id"), col("h")).distinct()
    val fpDocs = docFp.groupBy("h").agg(count(lit(1)).as("n_docs"))
    val shared = docFp.join(fpDocs, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
    selected.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("n_selected"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
  }

  val winnowFingerprintsSql: String =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |toks AS (
       |  SELECT doc_id, u.pos, w[u.pos] AS tok
       |  FROM words, UNNEST(range(1, len(w) + 1)) AS u(pos)),
       |grams AS (
       |  SELECT doc_id, pos,
       |    CAST(CAST(('0x' || substr(md5(
       |      tok || ' ' || lead(tok, 1) OVER bp
       |          || ' ' || lead(tok, 2) OVER bp
       |          || ' ' || lead(tok, 3) OVER bp), 1, 12)) AS BIGINT) AS BIGINT) AS h,
       |    lead(tok, ${k - 1}) OVER bp IS NOT NULL AS complete
       |  FROM toks
       |  WINDOW bp AS (PARTITION BY doc_id ORDER BY pos)),
       |sel AS (
       |  SELECT doc_id, pos, h,
       |    h = min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND ${w - 1} FOLLOWING) AS selected
       |  FROM grams WHERE complete),
       |doc_fp AS (SELECT DISTINCT doc_id, h FROM sel WHERE selected),
       |fp_docs AS (SELECT h, count(*) AS n_docs FROM doc_fp GROUP BY h),
       |shared AS (
       |  SELECT doc_id, count(*) AS n_fp,
       |    sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS n_shared_fp
       |  FROM doc_fp JOIN fp_docs USING (h) GROUP BY doc_id)
       |SELECT s.doc_id,
       |  count(*) AS n_grams,
       |  CAST(sum(CASE WHEN s.selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |  CAST(coalesce(any_value(sh.n_fp), 0) AS BIGINT) AS n_fp,
       |  CAST(coalesce(any_value(sh.n_shared_fp), 0) AS BIGINT) AS n_shared_fp
       |FROM sel s LEFT JOIN shared sh ON s.doc_id = sh.doc_id
       |GROUP BY s.doc_id""".stripMargin
}
