package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Pin.Pinned

/** Text-analysis operators over the `documents` table — the LLM-training-
  * pipeline surface (north star, SURVEY.md §7.4): token counting, quality
  * scoring, language ID, and document fingerprinting.
  *
  * Scale design: every operator here is a pure per-row projection over
  * array expressions — zero shuffles, zero UDFs, fully inside whole-stage
  * codegen. At 100 TB these run at scan speed with column pruning (only
  * `doc_id`/`text` read). Cross-engine determinism: all arithmetic is
  * integer or a single double division of two exact integers, so DuckDB
  * oracles hash-match bit-for-bit.
  */
object TextAnalysis {

  /** English-ish stopword list used by [[langId]] and the quality score.
    * Tiny on purpose: the heuristic must be cheap enough to run at ingest
    * (a literal IN-list, codegen'd to a switch — no broadcast needed). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Whitespace tokens of `text` — the shared tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: each whitespace token contributes
    * `ceil(len/3)` subwords (~3 chars per merge, the empirical BPE rate).
    * A stand-in for a merge-table tokenizer that keeps the count exact in
    * both engines: floor of a small-int double division is never within
    * 1 ulp of a boundary. */
  def subwordCount(text: Column): Column = subwordCountOf(tokens(text))

  /** Same, over a pre-tokenized words column. */
  def subwordCountOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + floor((length(t) + lit(2)) / lit(3)).cast("long"))

  /** Token statistics + quality score per document.
    *
    * quality_score = stopword_ratio + type_token_ratio + short_word_ratio:
    * three exact int/int divisions summed — a deterministic stand-in for
    * the usual trained quality classifiers, shaped like Gopher/C4 rules
    * (length, lexical diversity, function-word share). */
  def textStats(s: SparkSession, d: String): DataFrame = {
    // ONE pass over the text via the native TokenStats expression — the
    // lambda-composed form (staged split + five array walks) was the
    // suite's slowest cold query purely on Janino compile of the lambda
    // forest; see TokenStats scaladoc. quality_score keeps the three
    // SEPARATE divisions — (a+b+c)/n is a different double than
    // a/n + b/n + c/n, and the oracle computes the latter.
    val ts = col("ts")
    Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("int").as("n_chars_txt"),
        graft.functions.GraftFunctions.tokenStats(col("text"), stopwords).as("ts"))
      .select(
        col("doc_id"),
        ts.getField("n_tokens").as("n_tokens"),
        ts.getField("n_distinct").as("n_distinct_tokens"),
        ts.getField("n_subwords").as("n_subwords"),
        ts.getField("n_stopwords").as("n_stopwords"),
        (col("n_chars_txt").cast("double") / ts.getField("n_tokens"))
          .as("chars_per_token"),
        (ts.getField("n_stopwords").cast("double") / ts.getField("n_tokens") +
          ts.getField("n_distinct").cast("double") / ts.getField("n_tokens") +
          ts.getField("n_short").cast("double") / ts.getField("n_tokens"))
          .as("quality_score"))
  }

  /** Language ID: n-gram/stopword-overlap heuristic. With >=2 stopword hits
    * the doc is called `en`, 1 hit `maybe_en`, 0 `unknown`; ties broken by
    * nothing — the decision is a pure integer threshold, so the oracle
    * can't diverge. (A real fastText-style classifier would be a model
    * lookup; the *engine surface* — per-row classify at scan speed — is
    * identical.) */
  def langId(s: SparkSession, d: String): DataFrame = {
    val hits = col("ts").getField("n_stopwords")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        graft.functions.GraftFunctions.tokenStats(col("text"), stopwords).as("ts"))
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        hits.as("stopword_hits"),
        when(hits >= 2, lit("en"))
          .when(hits === 1, lit("maybe_en"))
          .otherwise(lit("unknown")).as("predicted_lang"))
  }

  /** Document fingerprint: positional rolling hash over word hashes,
    * `sum((i+1) * wordhash_i) mod 2^31-1`, where wordhash is the first
    * 8 hex digits of md5(word). Order-sensitive (anagram docs differ),
    * associative-sum form so both engines evaluate it exactly; values
    * bounded (~100 words * 2^32) far below long overflow. */
  /** The fingerprint expression over a text column (exposed for reuse and
    * direct spec coverage). */
  def fingerprintExpr(text: Column): Column = {
    val hashed = transform(tokens(text), (w, i) =>
      (i + 1).cast("long") * conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    aggregate(hashed, lit(0L), (acc, x) => acc + x) % 2147483647L
  }

  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      fingerprintExpr(col("text")).as("fingerprint"),
      substring(md5(col("text")), 1, 16).as("content_hash_prefix"))

  /** Deterministic train/val/test split assignment (~80/10/10) from the
    * document id's md5 — the curation-pipeline splitter. Hash-based (not
    * rand()) so re-runs, retries, and different cluster sizes assign
    * every document identically, and the split survives incremental
    * corpus growth (a new doc never moves an old one). Emits per-doc
    * assignment plus the per-(lang, split) stratification counts shape
    * downstream audits need. */
  def trainSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
      .cast("int")
    Tables.documents(s, d).select(
      col("doc_id"),
      col("lang"),
      bucket.as("hash_bucket"),
      when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
        .as("split"))
  }

  val trainSplitSql: String =
    """SELECT doc_id, lang,
      |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) AS INTEGER)
      |    AS hash_bucket,
      |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) < 204
      |         THEN 'train'
      |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) < 230
      |         THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin

  /** Corpus-wide bigram frequencies, top 50 — the n-gram census every
    * corpus audit starts with. Explode, count, deterministic top-k
    * (count desc, gram asc). Map-side partial counts keep the shuffle at
    * O(distinct grams), and TopK pushes the limit into the sort. */
  def topBigrams(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), w.as("w"))
      .select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count("*").as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(50)
  }

  /** TF-IDF: top-3 most characteristic terms per document. tf from one
    * explode+groupBy (map-side combinable); df as a window count over the
    * term partition of the SAME tf relation — no second scan, no join
    * back (a df-lookup join would recompute the tokenize subtree, the
    * lambda-CSE trap measured on the dedup queries); the corpus size N
    * rides in as a broadcast 1-row cross join so the plan stays fully
    * lazy. Scores round to 4 decimals BEFORE ranking so the per-doc
    * ordering (score desc, term asc) is engine-portable; top-3 via
    * row_number is WindowGroupLimit-pruned before the final shuffle. */
  def tfIdfTopTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count("*").as("tf"))
    val nDocs = docs.agg(count("*").as("n_docs"))
    val scored = tf
      .withColumn("df", count("*").over(Window.partitionBy("term")))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rn"))
  }

  val tfIdfTopTermsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT doc_id, term, tf,
      |    count(*) OVER (PARTITION BY term) AS df,
      |    round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
      |                  / count(*) OVER (PARTITION BY term)), 4) AS tfidf
      |  FROM tf)
      |SELECT doc_id, term, tf, df, tfidf, rn FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      |  FROM scored) t
      |WHERE rn <= 3""".stripMargin

  /** Repetition quality filters (the Gopher/MassiveText repetition rules):
    * per document, the fraction of tokens taken by the single most
    * frequent token, and the duplicate-3-gram fraction
    * (1 − distinct/total 3-grams). Docs failing either threshold are the
    * boilerplate/degenerate-generation candidates every corpus filter
    * drops first.
    *
    * Shapes: the 3-gram fraction is a pure per-row array expression
    * (scan speed, no shuffle); the top-token count is the wordcount shape
    * — explode → two-level aggregate with map-side partial combine, so
    * the shuffle carries O(distinct (doc, token)) short rows. The
    * constant-per-doc columns ride through the first aggregate as min()
    * instead of joining a second scan leg (Spark shares nothing across
    * join legs — the lambda-CSE trap). Both fractions are single int/int
    * divisions rounded to 4 decimals; the flag compares the ROUNDED
    * values so the boolean can't diverge across engines. */
  def repetitionStats(s: SparkSession, d: String): DataFrame = {
    val w = col("w")
    val sh = col("sh")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), w,
        when(size(w) < 3, array().cast("array<string>")).otherwise(
          transform(sequence(lit(1), size(w) - 2), i =>
            concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
          .as("sh"))
      .select(col("doc_id"), size(w).as("n_toks"),
        when(size(sh) > 0,
          lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
          .otherwise(lit(0.0)).as("dup3"),
        explode(w).as("tok"))
    base
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"), min("n_toks").as("n_toks"), min("dup3").as("dup3"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("max_tok"), min("n_toks").as("n_toks"), min("dup3").as("dup3"))
      .select(col("doc_id"), col("n_toks"),
        round(col("max_tok").cast("double") / col("n_toks"), 4).as("top_tok_frac"),
        round(col("dup3"), 4).as("dup_3gram_frac"))
      .withColumn("is_repetitive",
        col("top_tok_frac") >= 0.15 || col("dup_3gram_frac") >= 0.15)
  }

  val repetitionStatsSql: String =
    """WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |base AS (
      |  SELECT doc_id, CAST(len(w) AS INTEGER) AS n_toks,
      |    CASE WHEN len(w) >= 3 THEN
      |      1.0 - CAST(len(list_distinct(list_transform(generate_series(1, len(w)-2),
      |              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE)
      |          / (len(w) - 2)
      |    ELSE 0.0 END AS dup3,
      |    unnest(w) AS tok
      |  FROM words),
      |tc AS (
      |  SELECT doc_id, tok, count(*) AS c, min(n_toks) AS n_toks, min(dup3) AS dup3
      |  FROM base GROUP BY doc_id, tok),
      |agg AS (
      |  SELECT doc_id, max(c) AS max_tok, min(n_toks) AS n_toks, min(dup3) AS dup3
      |  FROM tc GROUP BY doc_id)
      |SELECT doc_id, n_toks,
      |  round(CAST(max_tok AS DOUBLE) / n_toks, 4) AS top_tok_frac,
      |  round(dup3, 4) AS dup_3gram_frac,
      |  round(CAST(max_tok AS DOUBLE) / n_toks, 4) >= 0.15
      |    OR round(dup3, 4) >= 0.15 AS is_repetitive
      |FROM agg""".stripMargin

  /** Positional trigram expansion through the native [[graft.functions.WordNgrams]]
    * GENERATOR (the UDTF extension point): one (pos, ngram) row per word
    * trigram, streamed out without materializing the n-gram array the
    * `explode(transform(...))` rendering would build per document.
    * Bounded to a stable doc range; the oracle rebuilds the same rows
    * with generate_series. */
  def ngramGenerate(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") <= 50)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.wordNgrams(col("text"), 3).as(Seq("pos", "ngram")))

  val ngramGenerateSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE doc_id <= 50),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
      |  FROM words)
      |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
      |  w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ngram
      |FROM idx""".stripMargin

  /** Shannon entropy of the token distribution per source — the
    * vocabulary-concentration audit (low entropy = templated/boilerplate
    * source, the corpus-level sibling of [[repetitionStats]]). Counts
    * are exact integers (wordcount shuffle, map-side combinable); the
    * -Σ p·ln p fold is double arithmetic whose summation order differs
    * across engines, so the result rounds to 4 decimals like every
    * other transcendental in the suite (error ~1e-13 « 5e-5). */
  def tokenEntropy(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    counts
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(-sum(col("c") * log(col("c"))).cast("double") / sum("c") +
          log(sum("c")), 4).as("entropy"))
  }

  val tokenEntropySql: String =
    """WITH counts AS (
      |  SELECT source, tok, count(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY source, tok)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
      |  round(-CAST(sum(c * ln(c)) AS DOUBLE) / sum(c) + ln(sum(c)), 4)
      |    AS entropy
      |FROM counts GROUP BY source""".stripMargin

  /** Token-count histogram in buckets of 10 per language — the corpus
    * length-distribution audit (integer bucketing, oracle-exact). */
  def lengthHistogram(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        (floor(size(split(col("text"), " ")) / 10) * 10).cast("int").as("len_bucket"))
      .groupBy("lang", "len_bucket").agg(count("*").as("n_docs"))

  val topBigramsSql: String =
    """SELECT bigram, count(*) AS n FROM (
      |  SELECT unnest(list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bigram
      |  FROM documents)
      |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50""".stripMargin

  val lengthHistogramSql: String =
    """SELECT lang,
      |  CAST(floor(len(string_split(text,' ')) / 10) * 10 AS INTEGER) AS len_bucket,
      |  count(*) AS n_docs
      |FROM documents GROUP BY lang, len_bucket""".stripMargin

  /** The policy lexicon [[lexiconAudit]] screens against — configurable
    * in a real deployment (toxicity/PII/contamination terms); pinned
    * here so the oracle is deterministic. */
  val policyLexicon: Seq[String] = Seq("slow", "leak", "stale", "fast")

  /** POLICY-LEXICON audit: per language, how many documents contain a
    * blocklisted term, and the total hit mass — the screening stage of
    * every corpus pipeline (toxicity lists, PII markers, eval-set
    * canaries) rendered as one scan: token-level membership against a
    * broadcast-literal lexicon via an array higher-order `filter` (all
    * codegen'd — no UDF, no join; a lexicon too big for a literal array
    * becomes a broadcast semi-join on the exploded tokens, same
    * semantics). Counts are exact ints; the flag rate is one pinned
    * double division rounded to 6. */
  def lexiconAudit(s: SparkSession, d: String): DataFrame = {
    val lex = array(policyLexicon.map(lit): _*)
    Tables.documents(s, d)
      .select(col("lang"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.filter(split(col("text"), " "),
            t => array_contains(lex, t))).as("hits"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("hits")).cast("long").as("total_hits"))
      .select(col("lang"), col("n_docs"), col("n_flagged"), col("total_hits"),
        round(col("n_flagged").cast("double") / col("n_docs").cast("double"), 6)
          .as("flag_rate"))
  }

  val lexiconAuditSql: String = {
    val lex = policyLexicon.map(w => s"'$w'").mkString(", ")
    s"""WITH scored AS (
       |  SELECT lang,
       |    len(list_filter(string_split(text, ' '),
       |      t -> list_contains([$lex], t))) AS hits
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  CAST(sum(hits) AS BIGINT) AS total_hits,
       |  round(CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS flag_rate
       |FROM scored GROUP BY lang""".stripMargin
  }

  /** COLLOCATIONS: top-20 bigrams by Dunning's log-likelihood ratio G²
    * — the statistically-grounded upgrade of raw bigram counts
    * ([[topBigrams]]): G² asks "does w2 follow w1 more often than the
    * two words' marginal rates predict", so glue pairs outscore merely
    * frequent ones. The standard collocation extractor (Dunning 1993)
    * and a corpus-quality staple.
    *
    * Plan shape extends the TF-IDF trick: both marginals (w1-as-first,
    * w2-as-second) are WINDOW sums over the bigram-count relation
    * itself, partitioned by vocab-sized keys — no second scan, no join
    * back; the grand total N rides in as a provably-one-row broadcast.
    * Everything after the explode runs at O(distinct bigrams).
    *
    * Determinism: the 2×2 contingency (k, c1−k, c2−k, N−c1−c2+k) is
    * exact longs; each G² is a PINNED sequence of ≤4 ln/mul/div double
    * ops (no variable-order float accumulation anywhere — cell terms
    * are added in fixed textual order), rounded to 4 before the
    * (score desc, bigram asc) tiebreak ordering. */
  def collocations(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    val counts = Tables.documents(s, d)
      .select(w.as("w"))
      .select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, w[i + 1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("k"))
    val c1w = Window.partitionBy("w1")
    val c2w = Window.partitionBy("w2")
    val tot = counts.agg(sum(col("k")).cast("long").as("nn"))
    def term(k: Column, rs: Column, cs: Column, nn: Column): Column =
      when(k > 0, k.cast("double") *
        log(k.cast("double") * nn.cast("double") /
          (rs.cast("double") * cs.cast("double")))).otherwise(lit(0.0))
    counts
      .select(col("w1"), col("w2"), col("k"),
        sum(col("k")).over(c1w).cast("long").as("c1"),
        sum(col("k")).over(c2w).cast("long").as("c2"))
      .crossJoin(broadcast(tot))
      .filter(col("k") >= 5)
      .select(col("w1"), col("w2"), col("k"), col("c1"), col("c2"),
        round(lit(2.0) * (
          term(col("k"), col("c1"), col("c2"), col("nn")) +
          term(col("c1") - col("k"), col("c1"), col("nn") - col("c2"), col("nn")) +
          term(col("c2") - col("k"), col("nn") - col("c1"), col("c2"), col("nn")) +
          term(col("nn") - col("c1") - col("c2") + col("k"),
            col("nn") - col("c1"), col("nn") - col("c2"), col("nn"))), 4)
          .as("g2"))
      .orderBy(col("g2").desc, col("w1").asc, col("w2").asc)
      .limit(20)
  }

  val collocationsSql: String =
    """WITH counts AS (
      |  SELECT b[1] AS w1, b[2] AS w2, count(*) AS k FROM (
      |    SELECT unnest(list_transform(
      |      generate_series(1, len(string_split(text,' ')) - 1),
      |      i -> [string_split(text,' ')[i], string_split(text,' ')[i+1]])) AS b
      |    FROM documents)
      |  GROUP BY 1, 2),
      |marg AS (
      |  SELECT w1, w2, k,
      |    sum(k) OVER (PARTITION BY w1) AS c1,
      |    sum(k) OVER (PARTITION BY w2) AS c2,
      |    (SELECT sum(k) FROM counts) AS nn
      |  FROM counts)
      |SELECT w1, w2, k, CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
      |  round(2.0 * (
      |    CASE WHEN k > 0 THEN CAST(k AS DOUBLE) *
      |      ln(CAST(k AS DOUBLE) * CAST(nn AS DOUBLE)
      |        / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) ELSE 0.0 END +
      |    CASE WHEN c1 - k > 0 THEN CAST(c1 - k AS DOUBLE) *
      |      ln(CAST(c1 - k AS DOUBLE) * CAST(nn AS DOUBLE)
      |        / (CAST(c1 AS DOUBLE) * CAST(nn - c2 AS DOUBLE))) ELSE 0.0 END +
      |    CASE WHEN c2 - k > 0 THEN CAST(c2 - k AS DOUBLE) *
      |      ln(CAST(c2 - k AS DOUBLE) * CAST(nn AS DOUBLE)
      |        / (CAST(nn - c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) ELSE 0.0 END +
      |    CASE WHEN nn - c1 - c2 + k > 0 THEN CAST(nn - c1 - c2 + k AS DOUBLE) *
      |      ln(CAST(nn - c1 - c2 + k AS DOUBLE) * CAST(nn AS DOUBLE)
      |        / (CAST(nn - c1 AS DOUBLE) * CAST(nn - c2 AS DOUBLE))) ELSE 0.0 END
      |  ), 4) AS g2
      |FROM marg WHERE k >= 5
      |ORDER BY g2 DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin

  // ---- DuckDB oracle SQL ----------------------------------------------

  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  val textStatsSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
       |  CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_distinct_tokens,
       |  CAST(list_sum(list_transform(string_split(text,' '),
       |    t -> CAST(floor((length(t)+2)/3) AS BIGINT))) AS INTEGER) AS n_subwords,
       |  CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS INTEGER)
       |    AS n_stopwords,
       |  CAST(length(text) AS DOUBLE) / len(string_split(text,' ')) AS chars_per_token,
       |  CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
       |      / len(string_split(text,' '))
       |    + CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
       |      / len(string_split(text,' '))
       |    + CAST(len(list_filter(string_split(text,' '), t -> len(t) < 4)) AS DOUBLE)
       |      / len(string_split(text,' ')) AS quality_score
       |FROM documents""".stripMargin

  val langIdSql: String =
    s"""SELECT doc_id, lang AS labeled_lang,
       |  CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS INTEGER)
       |    AS stopword_hits,
       |  CASE WHEN len(list_filter(string_split(text,' '), t -> t IN ($stopList))) >= 2 THEN 'en'
       |       WHEN len(list_filter(string_split(text,' '), t -> t IN ($stopList))) = 1 THEN 'maybe_en'
       |       ELSE 'unknown' END AS predicted_lang
       |FROM documents""".stripMargin

  val fingerprintSql: String =
    """SELECT doc_id,
      |  CAST(list_sum(list_transform(generate_series(1, len(string_split(text,' '))),
      |    i -> i * CAST(('0x' || substr(md5(string_split(text,' ')[i]), 1, 8)) AS BIGINT)))
      |    % 2147483647 AS BIGINT) AS fingerprint,
      |  substr(md5(text), 1, 16) AS content_hash_prefix
      |FROM documents""".stripMargin

  /** Vocabulary size for the OOV audit: deliberately smaller than the
    * corpus alphabet so the out-of-vocabulary tail is non-empty. */
  val oovVocabSize = 10

  /** Tokenizer-coverage / OOV audit: per source, the fraction of token
    * OCCURRENCES not covered by the top-[[oovVocabSize]] vocabulary —
    * the "how much of my corpus does this tokenizer's vocab actually
    * cover" check run before committing to a vocab. The vocabulary is
    * deterministic (count DESC, token ASC tiebreak, LIMIT on both
    * engines); coverage joins the tiny vocab BROADCAST against the
    * token census — the corpus-sized explode flows through one
    * map-side-combinable aggregate and is never shuffled raw. Exact
    * integer ratio at the end. */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val vocab = counts.groupBy("tok").agg(sum("c").as("tc"))
      .orderBy(col("tc").desc, col("tok"))
      .limit(oovVocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    counts.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L))).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Quality-filter cascade thresholds (named so the oracle interpolates
    * the SAME constants): token-count band + repetition + diversity. */
  val qfMinTokens = 15L
  val qfMaxTokens = 70L

  /** The C4/Gopher-style keep/drop cascade, with reason codes: every doc
    * gets the FIRST failing rule (rules ordered cheapest-first, the way
    * production filter stacks short-circuit) or 'keep'. Rules:
    * too_short/too_long (token-count band), repetitive (top token >25%
    * of occurrences), low_diversity (distinct/total < 0.3). All
    * comparisons are cross-multiplied integers — no float thresholds.
    *
    * Scale: the per-doc stats (total/distinct/max term frequency) come
    * from ONE wordcount-shaped pass — (doc, tok) partial counts combine
    * map-side, then an O(docs) doc-keyed aggregate; text itself never
    * shuffles. The cascade is a projection over the stats. */
  def qualityFilter(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tok"), count(lit(1)).as("n_distinct"),
        max("tf").as("max_tf"))
    stats
      .select(col("doc_id"), col("n_tok"), col("n_distinct"), col("max_tf"),
        when(col("n_tok") < qfMinTokens, "too_short")
          .when(col("n_tok") > qfMaxTokens, "too_long")
          .when(col("max_tf") * 4 > col("n_tok"), "repetitive")
          .when(col("n_distinct") * 10 < col("n_tok") * 3, "low_diversity")
          .otherwise("keep").as("reason"))
      .withColumn("keep", col("reason") === "keep")
  }

  /** Unigram-LM vocabulary floor: tokens seen fewer times than this are
    * scored as OOV (named so the oracle interpolates the SAME constant). */
  val lmVocabMinCount = 5L

  /** Model-based quality scoring, the unigram-LM rendering: per-document
    * cross-entropy −(1/n)Σ ln p(tok) under the corpus's OWN unigram
    * distribution (p = c/N; tokens under [[lmVocabMinCount]] occurrences
    * smoothed to c=0.5). This is the perplexity-proxy filter of the
    * CCNet/LLaMA pipelines — there a 5-gram KenLM scores each doc, here
    * the n=1 case computes EXACTLY (no LM binary in the engine), with the
    * same use: high cross-entropy = rare-token gibberish, low = natural
    * running text; thresholding happens downstream.
    *
    * Identity used: −(1/n)Σ tf·ln(c/N) = ln N − (Σ tf·ln c)/n, so N only
    * enters once at the end — no per-token division.
    *
    * Scale shapes: corpus token frequency c is a SUM WINDOW over the tok
    * partition of the (doc, tok) tf relation — the [[tfIdfTopTerms]] df
    * trick, one short-row shuffle instead of a second corpus scan + join;
    * the rollup to O(docs) rows combines map-side; corpus size N rides in
    * as a broadcast one-row frame off a narrow column scan. Document text
    * never shuffles. Final score rounds 4dp (double summation order
    * differs across engines, error ~1e-13). */
  def lmScore(s: SparkSession, d: String): DataFrame =
    // Memoized per (session, dataset) — r15: EIGHT registered queries
    // consume this frame (q_lm_score, q_canonical_docs, q_lm_calibration,
    // q_rater_agreement, q_lm_auc, q_pr_auc, q_fleiss, q_cronbach), each
    // previously re-tokenizing the corpus and re-paying the token-window
    // shuffle. One build serves all, attributed in the bench memo log
    // (the variantCdfGaps/coPurchasePairs precedent). The pinned frame is
    // O(docs) rows (doc_id + 3 numerics) — storage-safe at any corpus
    // size where O(docs) frames pin, which the dedup chain already
    // assumes.
    textMemo(s, d, "lmScore") { lmScoreBuild(s, d).pin() }

  private val textMemo = new graft.Memo.Cache("text")

  private def lmScoreBuild(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val total = docs.agg(
      sum(size(split(col("text"), " ")).cast("long")).as("n_total"))
    tf
      .withColumn("c", sum("tf").over(Window.partitionBy("tok")))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_toks"),
        sum(when(col("c") < lmVocabMinCount, col("tf")).otherwise(lit(0L)))
          .as("n_oov"),
        sum(col("tf").cast("double") *
          log(when(col("c") >= lmVocabMinCount, col("c").cast("double"))
            .otherwise(lit(0.5d)))).as("sln"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_toks"), col("n_oov"),
        round(log(col("n_total").cast("double")) - col("sln") / col("n_toks"), 4)
          .as("cross_entropy"))
  }

  val lmScoreSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |wc AS (
       |  SELECT doc_id, tf, sum(tf) OVER (PARTITION BY tok) AS c FROM tf),
       |agg AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
       |    CAST(sum(CASE WHEN c < $lmVocabMinCount THEN tf ELSE 0 END) AS BIGINT)
       |      AS n_oov,
       |    sum(tf * ln(CASE WHEN c >= $lmVocabMinCount
       |                     THEN CAST(c AS DOUBLE) ELSE 0.5 END)) AS sln
       |  FROM wc GROUP BY 1)
       |SELECT doc_id, n_toks, n_oov,
       |  round(ln(CAST((SELECT sum(len(string_split(text, ' ')))
       |                 FROM documents) AS DOUBLE)) - sln / n_toks, 4)
       |    AS cross_entropy
       |FROM agg""".stripMargin

  /** Bigram-LM backoff constants (named so the oracle interpolates the
    * SAME literals). */
  val lm2MinCount = 5L
  val lm2Backoff = 0.4

  /** BIGRAM-LM QUALITY SCORE — the n=2 step toward the CCNet/KenLM
    * perplexity filter ([[lmScore]] is the n=1 case): per-document
    * cross-entropy under the corpus's own bigram model with stupid
    * backoff — p(w₂|w₁) = c(w₁w₂)/c(w₁·) when the bigram clears
    * [[lm2MinCount]], else [[lm2Backoff]]·p_uni(w₂). Rare-bigram
    * gibberish scores high, natural running text low; a bigram model
    * separates scrambled-word text that fools every unigram filter.
    *
    * Everything is windows over the per-doc bigram tf relation (no
    * joins, document text never shuffles): c(w₁w₂), the context total
    * c(w₁·), the second-position unigram count, and the corpus bigram
    * total are SUM windows. The per-doc ln fold rounds 4dp — the
    * [[lmScore]] summation-order precedent.
    *
    * Scale: shuffles are keyed on bigram/word — short-string keys over
    * the tf relation; per-doc aggregate combines map-side. */
  def bigramLmScore(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      // greatest+filter guard: sequence(1, 0) DESCENDS in Spark, so a
      // 1-token doc would fabricate null-keyed bigrams — filter to the
      // ascending range instead
      .select(col("doc_id"), explode(expr(
        """transform(
          |  filter(sequence(1, greatest(size(w) - 1, 1)),
          |    i -> i <= size(w) - 1),
          |  i -> struct(w[i - 1] AS w1, w[i] AS w2))""".stripMargin)).as("b"))
      .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))
    // corpus total rides a broadcast one-row frame (the lmScore idiom)
    // — a no-partition window would funnel the whole tf relation
    // through one task
    val total = tf.agg(sum(col("tf")).cast("long").as("nn"))
    val scored = tf
      .withColumn("c2", sum("tf").over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", sum("tf").over(Window.partitionBy("w1")))
      .withColumn("cu", sum("tf").over(Window.partitionBy("w2")))
      .crossJoin(broadcast(total))
    scored
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        sum(when(col("c2") < lm2MinCount, col("tf")).otherwise(lit(0L)))
          .cast("long").as("n_backoff"),
        sum(col("tf").cast("double") *
          log(when(col("c2") >= lm2MinCount,
            col("c2").cast("double") / col("c1").cast("double"))
            .otherwise(lit(lm2Backoff) *
              (col("cu").cast("double") / col("nn").cast("double")))))
          .as("sln"))
      .select(col("doc_id"), col("n_bigrams"), col("n_backoff"),
        round(-col("sln") / col("n_bigrams").cast("double"), 4)
          .as("cross_entropy2"))
  }

  val bigramLmScoreSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, count(*) AS tf
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |    range(1, 10000) t(i)
       |  WHERE i <= len(w) - 1
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT doc_id, tf,
       |    sum(tf) OVER (PARTITION BY w1, w2) AS c2,
       |    sum(tf) OVER (PARTITION BY w1) AS c1,
       |    sum(tf) OVER (PARTITION BY w2) AS cu,
       |    sum(tf) OVER () AS nn
       |  FROM tf)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |  CAST(sum(CASE WHEN c2 < $lm2MinCount THEN tf ELSE 0 END) AS BIGINT)
       |    AS n_backoff,
       |  round(-sum(tf * ln(CASE WHEN c2 >= $lm2MinCount
       |      THEN CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)
       |      ELSE $lm2Backoff * (CAST(cu AS DOUBLE) / CAST(nn AS DOUBLE))
       |    END)) / CAST(sum(tf) AS DOUBLE), 4) AS cross_entropy2
       |FROM scored GROUP BY 1""".stripMargin

  /** Kneser–Ney absolute discount (the KenLM default). 0.75 is exact
    * in binary, so the discount arithmetic carries no rounding. */
  val knDiscount = 0.75

  /** INTERPOLATED KNESER–NEY BIGRAM SCORING — the smoothing that
    * actually ships in KenLM/CCNet pipelines, completing the LM-filter
    * ladder ([[lmScore]] unigram → [[bigramLmScore]] stupid backoff →
    * KN): P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    * + (D/c(w₁·))·N₁₊(w₁·)·P_cont(w₂), with the CONTINUATION
    * probability P_cont(w₂) = N₁₊(·w₂)/N₁₊(··) — "how many contexts
    * does w₂ complete" rather than "how often does w₂ occur", the
    * insight that separates KN from every count-ratio backoff (high-
    * frequency-but-one-context tokens stop leaking probability).
    *
    * Determinism: D = [[knDiscount]] = 0.75 is exact in binary, every
    * count is an exact integer off the bigram TYPE relation (windows
    * over it give c(w₁·), N₁₊(w₁·), N₁₊(·w₂); one broadcast row gives
    * N₁₊(··)), the per-bigram probability is a pinned expression, and
    * the per-doc ln sum rounds 4dp (the [[lmScore]] summation-order
    * precedent).
    *
    * Scale: the type relation keys on short strings (combinable
    * windows); scoring is one (w₁, w₂) key-shuffle join of the
    * per-doc tf relation against the type relation — document text
    * itself never shuffles. */
  def knBigramScore(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """transform(
          |  filter(sequence(1, greatest(size(w) - 1, 1)),
          |    i -> i <= size(w) - 1),
          |  i -> struct(w[i - 1] AS w1, w[i] AS w2))""".stripMargin)).as("b"))
      .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))
    val types = tf.groupBy("w1", "w2").agg(sum(col("tf")).cast("long").as("c2"))
      .withColumn("c1", sum("c2").over(Window.partitionBy("w1")))
      .withColumn("n1p", count(lit(1)).over(Window.partitionBy("w1")))
      .withColumn("pc", count(lit(1)).over(Window.partitionBy("w2")))
    val total = types.agg(count(lit(1)).cast("long").as("tt"))
    tf.join(types, Seq("w1", "w2"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        sum(when(col("c2") === 1L, col("tf")).otherwise(lit(0L)))
          .cast("long").as("n_singleton_bigrams"),
        sum(col("tf").cast("double") *
          log((greatest(col("c2").cast("double") - lit(knDiscount), lit(0.0)) +
            lit(knDiscount) * col("n1p").cast("double") *
              (col("pc").cast("double") / col("tt").cast("double"))) /
            col("c1").cast("double"))).as("sln"))
      .select(col("doc_id"), col("n_bigrams"), col("n_singleton_bigrams"),
        round(-col("sln") / col("n_bigrams").cast("double"), 4)
          .as("cross_entropy_kn"))
  }

  val knBigramScoreSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, count(*) AS tf
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |    range(1, 10000) t(i)
       |  WHERE i <= len(w) - 1
       |  GROUP BY 1, 2, 3),
       |types AS (
       |  SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2
       |  FROM tf GROUP BY w1, w2),
       |twin AS (
       |  SELECT w1, w2, c2,
       |    sum(c2) OVER (PARTITION BY w1) AS c1,
       |    count(*) OVER (PARTITION BY w1) AS n1p,
       |    count(*) OVER (PARTITION BY w2) AS pc,
       |    count(*) OVER () AS tt
       |  FROM types)
       |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
       |  CAST(sum(CASE WHEN t.c2 = 1 THEN tf.tf ELSE 0 END) AS BIGINT)
       |    AS n_singleton_bigrams,
       |  round(-sum(CAST(tf.tf AS DOUBLE) *
       |    ln((greatest(CAST(t.c2 AS DOUBLE) - $knDiscount, 0.0) +
       |      $knDiscount * CAST(t.n1p AS DOUBLE) *
       |        (CAST(t.pc AS DOUBLE) / CAST(t.tt AS DOUBLE))) /
       |      CAST(t.c1 AS DOUBLE))) / CAST(sum(tf.tf) AS DOUBLE), 4)
       |    AS cross_entropy_kn
       |FROM tf JOIN twin t ON t.w1 = tf.w1 AND t.w2 = tf.w2
       |GROUP BY tf.doc_id""".stripMargin

  /** MODEL CALIBRATION TABLE (reliability diagram) — does the unigram-LM
    * quality score actually PREDICT the rule-based quality label? Docs
    * bin by tenth-nat of rounded [[lmScore]] cross-entropy; each bin
    * reports how many survive [[qualityFilter]] — the eval artifact you
    * consult before replacing rule filters with a learned scorer (if
    * pass-rate doesn't fall with cross-entropy, the score is
    * uninformative).
    *
    * Determinism: binning keys off the ROUNDED cross-entropy — the
    * exact doubles q_lm_score already proves hash-identical across
    * engines — one identical IEEE multiply then floor; all bin stats are
    * integer counts with one final division. */
  def lmCalibration(s: SparkSession, d: String): DataFrame =
    lmScore(s, d)
      .join(qualityFilter(s, d).select(col("doc_id"), col("keep")),
        Seq("doc_id"))
      .select(floor(col("cross_entropy") * 10).cast("int").as("ce_bin"),
        col("keep"))
      .groupBy("ce_bin")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_keep"))
      .select(col("ce_bin"),
        round(col("ce_bin").cast("double") / 10.0, 1).as("ce_lo"),
        col("n_docs"), col("n_keep"),
        round(col("n_keep").cast("double") / col("n_docs").cast("double"), 6)
          .as("keep_rate"))
      .orderBy("ce_bin")

  // lazy: interpolates qualityFilterSql, declared later in the file
  lazy val lmCalibrationSql: String =
    s"""WITH lm AS ($lmScoreSql),
       |qf AS ($qualityFilterSql),
       |binned AS (
       |  SELECT CAST(floor(lm.cross_entropy * 10) AS INTEGER) AS ce_bin,
       |    qf.keep
       |  FROM lm JOIN qf ON lm.doc_id = qf.doc_id)
       |SELECT ce_bin,
       |  round(CAST(ce_bin AS DOUBLE) / 10.0, 1) AS ce_lo,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS keep_rate
       |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin

  /** CE threshold for the LM-side classifier in [[classifierAgreement]]
    * — the compare runs on the 4-dp ROUNDED cross-entropy that
    * q_lm_score proves hash-identical across engines, so the boolean is
    * engine-exact with no margin analysis needed. */
  val agreementCeMax = 3.405

  /** CLASSIFIER AGREEMENT: Cohen's κ and McNemar's paired test between
    * the two quality screens this engine ships — the heuristic cascade
    * ([[qualityFilter]]) and the unigram-LM threshold ([[lmScore]] ≤
    * [[agreementCeMax]]). The curation question they answer: do the
    * cheap rules and the model-based score AGREE beyond chance (κ), and
    * when they disagree, is the disagreement SYMMETRIC (McNemar on the
    * discordant cells — an asymmetry means one screen is strictly
    * stricter, so running both is near-redundant in one direction)?
    *
    * Exactness: all four confusion cells are exact longs; κ is computed
    * as one integer-ratio — ((a+d)·n − Σ marginal products) /
    * (n² − Σ marginal products) — and McNemar's χ² = (b−c)²/(b+c) is an
    * integer ratio too, so both are single pinned divisions (n² holds
    * to ~3·10⁹ docs; past that the cells graduate to decimal). One
    * doc-keyed join of two O(docs) frames. */
  def classifierAgreement(s: SparkSession, d: String): DataFrame = {
    val qf = qualityFilter(s, d).select(col("doc_id"), col("keep"))
    val lm = lmScore(s, d).select(col("doc_id"),
      (col("cross_entropy") <= agreementCeMax).as("lm_pass"))
    val cells = qf.join(lm, Seq("doc_id"))
      .agg(
        sum(when(col("keep") && col("lm_pass"), 1L).otherwise(0L)).as("a"),
        sum(when(col("keep") && !col("lm_pass"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("keep") && col("lm_pass"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("keep") && !col("lm_pass"), 1L).otherwise(0L)).as("dd"))
    val n = col("a") + col("b") + col("c") + col("dd")
    val peNum = (col("a") + col("b")) * (col("a") + col("c")) +
      (col("c") + col("dd")) * (col("b") + col("dd"))
    val kappaNum = (col("a") + col("dd")) * n - peNum
    val kappaDen = n * n - peNum
    val chi2 = ((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
      greatest(col("b") + col("c"), lit(1L)).cast("double")
    cells.select(col("a").as("both_keep"), col("b").as("qf_only"),
      col("c").as("lm_only"), col("dd").as("both_drop"),
      round((col("a") + col("dd")).cast("double") / n.cast("double"), 6)
        .as("agreement"),
      round(kappaNum.cast("double") / kappaDen.cast("double"), 6).as("kappa"),
      round(chi2, 6).as("mcnemar_chi2"),
      (chi2 > 3.841458820694124).as("classifiers_differ_95"))
  }

  lazy val classifierAgreementSql: String =
    s"""WITH lm AS ($lmScoreSql),
       |qf AS ($qualityFilterSql),
       |joined AS (
       |  SELECT qf.keep, (lm.cross_entropy <= $agreementCeMax) AS lm_pass
       |  FROM qf JOIN lm ON lm.doc_id = qf.doc_id),
       |cells AS (
       |  SELECT
       |    CAST(sum(CASE WHEN keep AND lm_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN keep AND NOT lm_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN NOT keep AND lm_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN NOT keep AND NOT lm_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS dd
       |  FROM joined),
       |fin AS (
       |  SELECT a, b, c, dd, a + b + c + dd AS n,
       |    (a + b) * (a + c) + (c + dd) * (b + dd) AS pe_num,
       |    CAST((b - c) * (b - c) AS DOUBLE)
       |      / CAST(greatest(b + c, 1) AS DOUBLE) AS chi2
       |  FROM cells)
       |SELECT a AS both_keep, b AS qf_only, c AS lm_only, dd AS both_drop,
       |  round(CAST(a + dd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS agreement,
       |  round(CAST((a + dd) * n - pe_num AS DOUBLE)
       |    / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa,
       |  round(chi2, 6) AS mcnemar_chi2,
       |  chi2 > 3.841458820694124 AS classifiers_differ_95
       |FROM fin""".stripMargin

  /** ROC AUC of the LM score as a predictor of the heuristic drop
    * decision — the one classifier metric the evaluation family still
    * lacked (q_classifier_metrics grades hard labels, q_brier
    * probabilities, q_lm_calibration reliability; AUC grades the
    * RANKING). Via the Mann–Whitney identity AUC = U/(n₊n₋) with
    * midrank tie handling, over the score DOMAIN (each distinct
    * 4-dp-rounded cross-entropy, ×10⁴ an exact long), so the whole
    * computation is the [[graft.ops.Behavior]] midrank machinery:
    * exact integer rank sums off one
    * [[graft.ops.Distributed.withRunningTotal]] pass, AUC and Gini one
    * pinned division each. Positive class = dropped docs (higher
    * cross-entropy should predict dropping); AUC ≈ 0.5 means the LM
    * score carries no signal about the heuristic's decision — the
    * ranking-level twin of q_rater_agreement's κ ≈ 0 finding. */
  def lmAuc(s: SparkSession, d: String): DataFrame = {
    val obs = lmScore(s, d)
      .select(col("doc_id"),
        round(col("cross_entropy") * 10000, 0).cast("long").as("v"))
      .join(qualityFilter(s, d).select(col("doc_id"), col("keep")),
        Seq("doc_id"))
    val byValue = obs.groupBy("v").agg(count(lit(1)).as("t"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("t1"))
    val cum = graft.ops.Distributed.withRunningTotal(
      byValue, Seq.empty, Seq("v"), "t", "cumt")
    cum.agg(
      sum(col("t")).as("n"), sum(col("t1")).as("n1"),
      sum(col("t1") * (lit(2L) * (col("cumt") - col("t")) + col("t") + lit(1L)))
        .as("r1_x2"))
      .select((col("n") - col("n1")).as("n_keep"), col("n1").as("n_drop"),
        (col("r1_x2") - col("n1") * (col("n1") + lit(1L))).as("u1_x2"),
        col("n"))
      .select(col("n_keep"), col("n_drop"),
        round(col("u1_x2").cast("double") /
          (lit(2.0) * col("n_keep").cast("double") *
            col("n_drop").cast("double")), 6).as("auc"),
        round(col("u1_x2").cast("double") /
          (col("n_keep").cast("double") * col("n_drop").cast("double")) -
          lit(1.0), 6).as("gini"))
  }

  lazy val lmAucSql: String =
    s"""WITH lm AS ($lmScoreSql),
       |qf AS ($qualityFilterSql),
       |obs AS (
       |  SELECT CAST(round(lm.cross_entropy * 10000, 0) AS BIGINT) AS v,
       |    qf.keep
       |  FROM lm JOIN qf ON qf.doc_id = lm.doc_id),
       |by_value AS (
       |  SELECT v, count(*) AS t,
       |    sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS t1
       |  FROM obs GROUP BY v),
       |cum AS (
       |  SELECT t, t1, sum(t) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumt
       |  FROM by_value),
       |wide AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(t1) AS BIGINT) AS n1,
       |    CAST(sum(t1 * (2 * (cumt - t) + t + 1)) AS BIGINT) AS r1_x2
       |  FROM cum),
       |stat AS (
       |  SELECT n - n1 AS n_keep, n1 AS n_drop,
       |    r1_x2 - n1 * (n1 + 1) AS u1_x2
       |  FROM wide)
       |SELECT n_keep, n_drop,
       |  round(CAST(u1_x2 AS DOUBLE)
       |    / (2.0 * CAST(n_keep AS DOUBLE) * CAST(n_drop AS DOUBLE)), 6)
       |    AS auc,
       |  round(CAST(u1_x2 AS DOUBLE)
       |    / (CAST(n_keep AS DOUBLE) * CAST(n_drop AS DOUBLE)) - 1.0, 6)
       |    AS gini
       |FROM stat""".stripMargin

  /** PRECISION–RECALL AUC (AVERAGE PRECISION) of the LM score against
    * the heuristic drop decision — [[lmAuc]]'s class-imbalance-honest
    * twin: ROC AUC is blind to prevalence (a 1%-positive screen can
    * post 0.95 AUC while every alert is noise); AP integrates
    * precision over recall, so its baseline IS the prevalence and the
    * gap above it is the usable signal. Convention: the step-wise
    * (non-interpolated) AP over score THRESHOLDS,
    * AP = Σ_blocks (t₊/n₊) · P(threshold), ties handled as one block —
    * the estimator sklearn's average_precision_score documents.
    *
    * Rendering: the SAME score-domain census as [[lmAuc]]; one
    * [[graft.ops.Distributed.withRunningTotal]] pass (counts packed
    * t·2³² + t₊) gives ascending cums, descending cums fall out by
    * complement, every precision is a ratio of exact integers, and
    * the block terms fold over the score-DESC-sorted array (the
    * [[graft.ops.Behavior]] census-fold discipline) before one
    * division by n₊.
    *
    * Scale: O(distinct scores) census off one doc-keyed aggregate —
    * the [[lmAuc]] posture exactly. */
  def prAuc(s: SparkSession, d: String): DataFrame = {
    val obs = lmScore(s, d)
      .select(col("doc_id"),
        round(col("cross_entropy") * 10000, 0).cast("long").as("v"))
      .join(qualityFilter(s, d).select(col("doc_id"), col("keep")),
        Seq("doc_id"))
    val byValue = obs.groupBy("v").agg(
      (count(lit(1)) * lit(4294967296L) +
        sum(when(!col("keep"), 1L).otherwise(0L))).as("w"))
    val cum = graft.ops.Distributed.withRunningTotal(
      byValue, Seq.empty, Seq("v"), "w", "cumw", Some("totw"))
      .select(col("v"),
        expr("(totw div 4294967296L) - (cumw div 4294967296L) + (w div 4294967296L)")
          .as("cumtd"),
        expr("(totw % 4294967296L) - (cumw % 4294967296L) + (w % 4294967296L)")
          .as("cum1d"),
        expr("w % 4294967296L").as("t1"),
        expr("totw div 4294967296L").as("n"),
        expr("totw % 4294967296L").as("n1"))
    cum.agg(max(col("n")).as("n"), max(col("n1")).as("n1"),
      sort_array(collect_list(struct((-col("v")).as("nv"), col("t1"),
        col("cum1d"), col("cumtd")))).as("a"))
      .select(col("n"), col("n1"),
        expr("""aggregate(a, CAST(0.0 AS DOUBLE), (acc, e) ->
            acc + CAST(e.t1 AS DOUBLE) *
              (CAST(e.cum1d AS DOUBLE) / CAST(e.cumtd AS DOUBLE)))""")
          .as("ap_sum"))
      .select((col("n") - col("n1")).as("n_keep"), col("n1").as("n_drop"),
        round(col("n1").cast("double") / col("n").cast("double"), 6)
          .as("prevalence"),
        round(col("ap_sum") / col("n1").cast("double"), 6)
          .as("avg_precision"))
  }

  lazy val prAucSql: String =
    s"""WITH lm AS ($lmScoreSql),
       |qf AS ($qualityFilterSql),
       |obs AS (
       |  SELECT CAST(round(lm.cross_entropy * 10000, 0) AS BIGINT) AS v,
       |    qf.keep
       |  FROM lm JOIN qf ON qf.doc_id = lm.doc_id),
       |by_value AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS t,
       |    CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS t1
       |  FROM obs GROUP BY v),
       |cum AS (
       |  SELECT v, t1,
       |    CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS cumt,
       |    CAST(sum(t1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS cum1,
       |    t
       |  FROM by_value),
       |tot AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(t1) AS BIGINT) AS n1
       |  FROM by_value),
       |blocks AS (
       |  SELECT v, t1, n - cumt + t AS cumtd, n1 - cum1 + t1 AS cum1d, n, n1
       |  FROM cum CROSS JOIN tot),
       |folded AS (
       |  SELECT max(n) AS n, max(n1) AS n1,
       |    list_sum(list_transform(
       |      list(struct_pack(t1 := t1, cum1d := cum1d, cumtd := cumtd)
       |        ORDER BY v DESC),
       |      e -> CAST(e.t1 AS DOUBLE) *
       |        (CAST(e.cum1d AS DOUBLE) / CAST(e.cumtd AS DOUBLE)))) AS ap_sum
       |  FROM blocks)
       |SELECT n - n1 AS n_keep, n1 AS n_drop,
       |  round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS prevalence,
       |  round(ap_sum / CAST(n1 AS DOUBLE), 6) AS avg_precision
       |FROM folded""".stripMargin

  val qualityFilterSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |s AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
       |    count(*) AS n_distinct, max(tf) AS max_tf
       |  FROM tf GROUP BY 1),
       |r AS (
       |  SELECT doc_id, n_tok, n_distinct, max_tf,
       |    CASE WHEN n_tok < $qfMinTokens THEN 'too_short'
       |         WHEN n_tok > $qfMaxTokens THEN 'too_long'
       |         WHEN max_tf * 4 > n_tok THEN 'repetitive'
       |         WHEN n_distinct * 10 < n_tok * 3 THEN 'low_diversity'
       |         ELSE 'keep' END AS reason
       |  FROM s)
       |SELECT doc_id, n_tok, n_distinct, max_tf, reason,
       |  reason = 'keep' AS keep FROM r""".stripMargin

  val oovRateSql: String =
    s"""WITH counts AS (
       |  SELECT source, tok, count(*) AS c FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY source, tok),
       |vocab AS (
       |  SELECT tok FROM (SELECT tok, sum(c) AS tc FROM counts GROUP BY tok)
       |  ORDER BY tc DESC, tok LIMIT ${oovVocabSize})
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS DOUBLE) / sum(c)
       |    AS oov_rate
       |FROM counts LEFT JOIN vocab v USING (tok)
       |GROUP BY source""".stripMargin

  /** Adjacent-character-pair census over the corpus — the statistic the
    * FIRST merge step of BPE tokenizer training reads (the most frequent
    * pair becomes the first merge rule). Computed the way production BPE
    * trainers do: aggregate the corpus to its token VOCABULARY first
    * (token, occurrence count), then expand character pairs over
    * distinct tokens only, weighting each pair by the token's count —
    * pair stats cost O(vocabulary × token length), not O(corpus), which
    * is the difference between re-scanning 100 TB per merge and reading
    * a vocabulary table. Top 20 pairs, ties pinned by pair text. */
  def bpePairCensus(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(length(col("tok")) >= 2)
    vocab
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("n").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(20)
  }

  val bpePairCensusSql: String =
    """WITH vocab AS (
      |  SELECT tok, count(*) AS n FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok HAVING len(tok) >= 2)
      |SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences FROM (
      |  SELECT n, unnest(list_transform(generate_series(1, len(tok) - 1),
      |    i -> substr(tok, i, 2))) AS pair
      |  FROM vocab)
      |GROUP BY pair ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin

  /** Pairwise source-vocabulary Jaccard — the corpus-diff audit ("how
    * much does source A's vocabulary overlap source B's?") that drives
    * source selection and contamination triage in mixture planning.
    *
    * Rendered join-free the same way [[graft.dedup.Dedup]]'s Jaccard
    * is: one (source, token) distinct pass, then a per-token posting
    * list of the sources containing it, pair-expanded locally. The
    * expansion is bounded by C(|sources|, 2) per token — sources are a
    * curated handful even at 100 TB, so the shuffle carries (src, src)
    * pairs, never token text against token text. A self-join rendering
    * would scan and shingle the corpus once per join leg; this scans
    * once. Jaccard rounds to 4 decimals like every ratio in the suite
    * (the counts themselves stay exact integers). */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .select(col("source"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .distinct()
    val vocab = st.groupBy("source").agg(count(lit(1)).as("v"))
    val inter = st.groupBy("tok")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs) - i - 1), y ->
          |    struct(x AS src_a, y AS src_b))))""".stripMargin)).as("p"))
      .select(col("p.src_a"), col("p.src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(vocab).withColumnRenamed("source", "src_a")
        .withColumnRenamed("v", "v_a"), Seq("src_a"))
      .join(broadcast(vocab).withColumnRenamed("source", "src_b")
        .withColumnRenamed("v", "v_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"),
        col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("v_a") + col("v_b") - col("n_shared")), 4).as("jaccard"))
  }

  /** Exact phrase search through a positional inverted index — the
    * "find every occurrence of this 2-gram without re-scanning text"
    * operation. The query phrase is the corpus's own most frequent
    * bigram (deterministic, self-contained); matching intersects the
    * two terms' posting lists on (doc, adjacent positions), which is
    * the inverted-index algorithm every search engine runs: work is
    * proportional to the two terms' posting sizes, never the corpus.
    *
    * The postings relation is built and term-filtered ONCE (the r6
    * verdict flagged the previous two-branch rendering for exploding
    * the corpus twice); adjacency then resolves with a single lead()
    * window over the filtered postings — no self-join at all. A t1
    * posting at position p matches iff the NEXT surviving posting in
    * its document is a t2 at exactly p + 1 (nothing can intervene
    * between adjacent positions, and the filter keeps only the two
    * query terms). Work stays proportional to the two terms' posting
    * sizes, never the corpus; the one shuffle keys by doc_id (full
    * width). In a real deployment the postings relation is materialized
    * once, bucketed by term (see [[graft.plans.Bucketing]]) — each
    * query then reads two bucket slices; this query inlines the index
    * build to stay self-contained. Output: per-document occurrence
    * counts of the phrase. */
  def phraseSearch(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val postings = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val top = docs.select(split(col("text"), " ").as("w"))
      .filter(org.apache.spark.sql.functions.size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1), i ->
          |  concat(element_at(w, i), ' ', element_at(w, i + 1)))""".stripMargin))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(1)
      .select(col("bigram"),
        split(col("bigram"), " ").getItem(0).as("t1"),
        split(col("bigram"), " ").getItem(1).as("t2"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    postings.crossJoin(broadcast(top))
      .filter(col("term") === col("t1") || col("term") === col("t2"))
      .withColumn("nxt_term", lead(col("term"), 1).over(byDoc))
      .withColumn("nxt_pos", lead(col("pos"), 1).over(byDoc))
      .filter(col("term") === col("t1") && col("nxt_term") === col("t2") &&
        col("nxt_pos") === col("pos") + 1)
      .groupBy(col("bigram").as("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  val phraseSearchSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i + 1])) AS bigram
      |  FROM w WHERE len(w) >= 2),
      |topq AS (
      |  SELECT bigram FROM (
      |    SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
      |  ORDER BY n DESC, bigram LIMIT 1),
      |q AS (
      |  SELECT bigram, string_split(bigram, ' ')[1] AS t1,
      |    string_split(bigram, ' ')[2] AS t2
      |  FROM topq),
      |t AS (
      |  SELECT doc_id, pt.pos AS pos, pt.term AS term FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
      |      i -> struct_pack(pos := i, term := w[i]))) AS pt
      |    FROM w))
      |SELECT q.bigram AS phrase, a.doc_id, count(*) AS n_matches
      |FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1, q
      |WHERE a.term = q.t1 AND b.term = q.t2
      |GROUP BY q.bigram, a.doc_id""".stripMargin

  val sourceOverlapSql: String =
    """WITH st AS (
      |  SELECT DISTINCT source, tok FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)),
      |v AS (SELECT source, count(*) AS v FROM st GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, va.v AS v_a, vb.v AS v_b, n_shared,
      |  round(CAST(n_shared AS DOUBLE) / (va.v + vb.v - n_shared), 4)
      |    AS jaccard
      |FROM inter
      |JOIN v va ON va.source = src_a
      |JOIN v vb ON vb.source = src_b""".stripMargin

  /** Text NORMALIZATION battery — the canonical-form pass that runs
    * before any hashing/dedup stage: Unicode NFC (via the native
    * [[graft.functions.NfcNormalize]] expression — Spark has no builtin),
    * case folding, whitespace squeezing, and punctuation-stripped
    * skeletons. The corpus is ASCII, so NFC's work is exercised on a
    * planted decomposed suffix (`e` + combining acute, U+0301): its
    * composed length must come out one character shorter, and the
    * composed form must equal the same literal built composed — proving
    * real composition happened, not an identity pass.
    *
    * Scale: pure per-row projection, no shuffle, fully codegen'd (the
    * NFC expression inlines as one static call with an isNormalized
    * fast path that skips allocation on already-composed text — the
    * ~100% case in the wild, so the pass is scan-speed at 100 TB). */
  def textNormalize(s: SparkSession, d: String): DataFrame = {
    val nfc = graft.functions.GraftFunctions.nfcNormalize _
    val rawDecomposed = concat(substring(col("text"), 1, 40), lit(" cafe\u0301"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), rawDecomposed.as("raw"))
      .select(
        col("doc_id"),
        lower(substring(col("text"), 1, 30)).as("folded"),
        regexp_replace(trim(lower(substring(col("text"), 1, 30))),
          "[^a-z0-9 ]", "").as("skeleton"),
        regexp_replace(substring(col("text"), 1, 30), "\\s+", " ")
          .as("squeezed"),
        length(col("raw")).as("len_nfd"),
        length(nfc(col("raw"))).as("len_nfc"),
        (nfc(col("raw")) ===
          // " caf" + LATIN SMALL LETTER E WITH ACUTE: the composed (NFC) spelling
          concat(substring(col("text"), 1, 40), lit(" caf\u00e9")))
          .as("composed_ok"))
  }

  val textNormalizeSql: String =
    """SELECT doc_id,
      |  lower(substr(text, 1, 30)) AS folded,
      |  regexp_replace(trim(lower(substr(text, 1, 30))),
      |    '[^a-z0-9 ]', '', 'g') AS skeleton,
      |  regexp_replace(substr(text, 1, 30), '\s+', ' ', 'g') AS squeezed,
      |  length(substr(text, 1, 40) || ' cafe' || chr(769)) AS len_nfd,
      |  length(nfc_normalize(substr(text, 1, 40) || ' cafe' || chr(769)))
      |    AS len_nfc,
      |  (nfc_normalize(substr(text, 1, 40) || ' cafe' || chr(769)) =
      |    substr(text, 1, 40) || ' caf' || chr(233)) AS composed_ok
      |FROM documents""".stripMargin

  /** LANGUAGE-ID CONFUSION MATRIX — the quality audit for [[langId]]:
    * labeled language × predicted bucket counts plus per-cell share of
    * the labeled row. The eval loop every classifier-in-the-pipeline
    * needs (precision/recall per language fall straight out of the
    * cells); same one-pass shape as langId itself with a final
    * O(langs × buckets) map-side-combinable rollup. */
  def langConfusion(s: SparkSession, d: String): DataFrame = {
    val hits = col("ts").getField("n_stopwords")
    Tables.documents(s, d)
      .select(col("lang"),
        graft.functions.GraftFunctions.tokenStats(col("text"), stopwords).as("ts"))
      .select(col("lang").as("labeled_lang"),
        when(hits >= 2, lit("en"))
          .when(hits === 1, lit("maybe_en"))
          .otherwise(lit("unknown")).as("predicted_lang"))
      .groupBy("labeled_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_total",
        sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("labeled_lang")))
      .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("row_total").cast("double"), 6)
          .as("row_share"))
      .orderBy("labeled_lang", "predicted_lang")
  }

  val langConfusionSql: String = {
    val hitExpr = s"len(list_filter(string_split(text,' '), t -> t IN ($stopList)))"
    s"""WITH pred AS (
       |  SELECT lang AS labeled_lang,
       |    CASE WHEN $hitExpr >= 2 THEN 'en'
       |    WHEN $hitExpr = 1 THEN 'maybe_en'
       |    ELSE 'unknown' END AS predicted_lang
       |  FROM documents),
       |cells AS (
       |  SELECT labeled_lang, predicted_lang, count(*) AS n_docs
       |  FROM pred GROUP BY 1, 2)
       |SELECT labeled_lang, predicted_lang, n_docs,
       |  round(CAST(n_docs AS DOUBLE) /
       |    CAST(sum(n_docs) OVER (PARTITION BY labeled_lang) AS DOUBLE), 6)
       |    AS row_share
       |FROM cells ORDER BY labeled_lang, predicted_lang""".stripMargin
  }

  /** CHARACTER-CLASS (script) PROFILE per language — the writing-system
    * audit that complements stopword [[langId]]: per lang, the corpus
    * share of ASCII letters, digits, whitespace, and everything else.
    * The production use is contamination triage ("why does the 'en'
    * bucket have 30% non-Latin bytes?") and tokenizer sizing (digit- and
    * symbol-heavy corpora fragment differently) — a one-pass,
    * shuffle-light signal computed BEFORE any expensive model-based
    * language ID.
    *
    * Class counts come from `length(x) − length(regexp_replace(x, cls,
    * ''))` — pure per-row string ops (codegen'd, no explode of
    * characters); the rollup is one map-side-combinable aggregate keyed
    * by lang (tiny domain, but the inputs are already per-doc COUNTS —
    * O(docs) rows of four longs, not text). All counts are exact longs;
    * each ratio is one pinned double division rounded to 6. DuckDB's
    * regexp_replace needs the 'g' flag to match Spark's replace-all. */
  def scriptProfile(s: SparkSession, d: String): DataFrame = {
    def clsCount(cls: String) =
      (length(col("text")) -
        length(regexp_replace(col("text"), cls, ""))).cast("long")
    val perDoc = Tables.documents(s, d)
      .select(col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        clsCount("[A-Za-z]").as("n_letter"),
        clsCount("[0-9]").as("n_digit"),
        clsCount("\\s").as("n_space"))
    perDoc
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("chars_total"),
        sum("n_letter").as("letters"),
        sum("n_digit").as("digits"),
        sum("n_space").as("spaces"))
      .select(col("lang"), col("n_docs"), col("chars_total"),
        round(col("letters").cast("double") / col("chars_total").cast("double"), 6)
          .as("letter_ratio"),
        round(col("digits").cast("double") / col("chars_total").cast("double"), 6)
          .as("digit_ratio"),
        round(col("spaces").cast("double") / col("chars_total").cast("double"), 6)
          .as("space_ratio"),
        round((col("chars_total") - col("letters") - col("digits") - col("spaces"))
          .cast("double") / col("chars_total").cast("double"), 6)
          .as("other_ratio"))
      .orderBy("lang")
  }

  val scriptProfileSql: String =
    """WITH per_doc AS (
      |  SELECT lang,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
      |      AS BIGINT) AS n_letter,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
      |      AS BIGINT) AS n_digit,
      |    CAST(length(text) - length(regexp_replace(text, '\s', '', 'g'))
      |      AS BIGINT) AS n_space
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
      |  round(CAST(sum(n_letter) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6)
      |    AS letter_ratio,
      |  round(CAST(sum(n_digit) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6)
      |    AS digit_ratio,
      |  round(CAST(sum(n_space) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6)
      |    AS space_ratio,
      |  round(CAST(sum(n_chars) - sum(n_letter) - sum(n_digit) - sum(n_space)
      |    AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6) AS other_ratio
      |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  /** Top-rank cutoff for [[zipfFit]]. */
  val zipfTopK = 500

  /** ZIPF'S-LAW FIT per language — the OLS slope of ln(frequency) on
    * ln(rank) over the top-[[zipfTopK]] tokens: the corpus-statistics
    * sanity check (natural language sits near slope −1; synthetic or
    * template-heavy text drifts off it), and the input to vocabulary
    * truncation decisions (how much mass the tail holds).
    *
    * Determinism: ranks are exact (row_number by (count DESC, token)
    * over the O(langs × vocab) census — never raw facts); the five OLS
    * power sums fold INSIDE a rank-sorted array (the decayedPopularity
    * / elasticity sequential-fold discipline: both engines accumulate
    * ln terms in identical rank order), slope and r² are each one
    * pinned double formula, rounded 6.
    *
    * Scale: corpus → token census is the wordcount shuffle (text never
    * moves); everything after is O(langs × [[zipfTopK]]). */
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    val census = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("tok"))
    val arr = census.withColumn("r", row_number().over(w))
      .filter(col("r") <= zipfTopK)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("c")).as("mass"),
        sort_array(collect_list(struct(col("r"), col("c")))).as("a"))
    // sequential fold of the five power sums in rank order
    val sums = arr.select(col("lang"), col("n_terms"), col("mass"),
      aggregate(col("a"),
        struct(lit(0.0).as("sx"), lit(0.0).as("sy"), lit(0.0).as("sxy"),
          lit(0.0).as("sxx"), lit(0.0).as("syy")),
        (acc, e) => {
          val x = log(e.getField("r").cast("double"))
          val y = log(e.getField("c").cast("double"))
          struct((acc.getField("sx") + x).as("sx"),
            (acc.getField("sy") + y).as("sy"),
            (acc.getField("sxy") + x * y).as("sxy"),
            (acc.getField("sxx") + x * x).as("sxx"),
            (acc.getField("syy") + y * y).as("syy"))
        }).as("s"))
    val n = col("n_terms").cast("double")
    val cov = n * col("s.sxy") - col("s.sx") * col("s.sy")
    val vx = n * col("s.sxx") - col("s.sx") * col("s.sx")
    val vy = n * col("s.syy") - col("s.sy") * col("s.sy")
    sums.select(col("lang"), col("n_terms"), col("mass"),
      round(cov / vx, 6).as("zipf_slope"),
      round(cov * cov / (vx * vy), 6).as("r2"))
      .orderBy("lang")
  }

  val zipfFitSql: String =
    s"""WITH census AS (
       |  SELECT lang, tok, count(*) AS c FROM (
       |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT lang, c,
       |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS r
       |  FROM census),
       |arr AS (
       |  SELECT lang, count(*) AS n_terms, CAST(sum(c) AS BIGINT) AS mass,
       |    list(struct_pack(r := r, c := c) ORDER BY r) AS a
       |  FROM rk WHERE r <= $zipfTopK GROUP BY 1),
       |sums AS (
       |  SELECT lang, n_terms, mass,
       |    list_sum(list_transform(a, e -> ln(CAST(e.r AS DOUBLE)))) AS sx,
       |    list_sum(list_transform(a, e -> ln(CAST(e.c AS DOUBLE)))) AS sy,
       |    list_sum(list_transform(a, e ->
       |      ln(CAST(e.r AS DOUBLE)) * ln(CAST(e.c AS DOUBLE)))) AS sxy,
       |    list_sum(list_transform(a, e ->
       |      ln(CAST(e.r AS DOUBLE)) * ln(CAST(e.r AS DOUBLE)))) AS sxx,
       |    list_sum(list_transform(a, e ->
       |      ln(CAST(e.c AS DOUBLE)) * ln(CAST(e.c AS DOUBLE)))) AS syy
       |  FROM arr)
       |SELECT lang, n_terms, mass,
       |  round((n_terms*sxy - sx*sy) / (n_terms*sxx - sx*sx), 6) AS zipf_slope,
       |  round((n_terms*sxy - sx*sy) * (n_terms*sxy - sx*sy)
       |    / ((n_terms*sxx - sx*sx) * (n_terms*syy - sy*sy)), 6) AS r2
       |FROM sums ORDER BY lang""".stripMargin

  /** HEAPS'-LAW VOCABULARY GROWTH — V(n) (distinct tokens seen) at
    * each decile of the corpus in doc_id order, plus the implied Heaps
    * exponent β from the first/last checkpoints (V ≈ K·nᵝ): the curve
    * that answers "how fast does vocabulary (and so tokenizer/embedding
    * table size) grow as the corpus scales" — measured, not assumed.
    *
    * The distributed trick: cumulative distinct counting needs no
    * ordered scan — a token is NEW at exactly one doc (its min doc_id),
    * so V at checkpoint c = #tokens whose first doc ≤ c. First-docs are
    * one map-side-combinable min aggregate; deciles are a pure integer
    * projection off the CONTIGUOUS doc_id domain (0..n−1, the testdata
    * contract — a loud raise_error guards it); the cumulation runs over
    * the 10-row decile frame (the q_share_of_total empty-frame class).
    * All outputs exact integers except β (one pinned formula, round 6). */
  def heapsLaw(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.agg(count(lit(1)).as("nd"),
      (max(col("doc_id")) - min(col("doc_id")) + 1).as("span"))
      .select(when(col("nd") === col("span"), col("nd"))
        .otherwise(raise_error(concat(lit("heapsLaw: doc_id not contiguous: n="),
          col("nd"), lit(" span="), col("span"))))
        .as("nd"))
    val perDoc = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("ntoks"))
      .crossJoin(broadcast(nDocs))
      .select(expr("doc_id * 10 DIV nd").as("decile"), col("ntoks"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntoks")).as("toks"))
    val firstDoc = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(nDocs))
      .select(expr("fd * 10 DIV nd").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("vocab_new"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = perDoc.join(firstDoc, Seq("decile"), "left")
      .select(col("decile"), col("n_docs"), col("toks"),
        coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
      .select(col("decile"), col("n_docs"),
        sum(col("n_docs")).over(w).as("cum_docs"),
        sum(col("toks")).over(w).as("cum_tokens"),
        sum(col("vocab_new")).over(w).as("cum_vocab"))
    val beta = curve.groupBy()
      .agg(min(when(col("decile") === 0, col("cum_tokens"))).as("n0"),
        min(when(col("decile") === 0, col("cum_vocab"))).as("v0"),
        max(when(col("decile") === 9, col("cum_tokens"))).as("n9"),
        max(when(col("decile") === 9, col("cum_vocab"))).as("v9"))
      .select(round(
        log(col("v9").cast("double") / col("v0").cast("double")) /
          log(col("n9").cast("double") / col("n0").cast("double")), 6)
        .as("heaps_beta"))
    curve.crossJoin(broadcast(beta))
      .select(col("decile").cast("int").as("decile"), col("n_docs"),
        col("cum_docs"), col("cum_tokens"), col("cum_vocab"),
        col("heaps_beta"))
      .orderBy("decile")
  }

  val heapsLawSql: String =
    """WITH nd AS (SELECT count(*) AS nd FROM documents),
      |per_doc AS (
      |  SELECT (doc_id * 10) // nd AS decile, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents CROSS JOIN nd GROUP BY 1),
      |first_doc AS (
      |  SELECT tok, min(doc_id) AS fd
      |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
      |      AS tok FROM documents)
      |  GROUP BY tok),
      |vocab AS (
      |  SELECT (fd * 10) // nd AS decile, count(*) AS vocab_new
      |  FROM first_doc CROSS JOIN nd GROUP BY 1),
      |curve AS (
      |  SELECT p.decile, p.n_docs,
      |    sum(p.n_docs) OVER (ORDER BY p.decile) AS cum_docs,
      |    sum(p.toks) OVER (ORDER BY p.decile) AS cum_tokens,
      |    sum(coalesce(v.vocab_new, 0)) OVER (ORDER BY p.decile) AS cum_vocab
      |  FROM per_doc p LEFT JOIN vocab v USING (decile)),
      |beta AS (
      |  SELECT round(
      |    ln(CAST(max(CASE WHEN decile = 9 THEN cum_vocab END) AS DOUBLE)
      |      / CAST(min(CASE WHEN decile = 0 THEN cum_vocab END) AS DOUBLE))
      |    / ln(CAST(max(CASE WHEN decile = 9 THEN cum_tokens END) AS DOUBLE)
      |      / CAST(min(CASE WHEN decile = 0 THEN cum_tokens END) AS DOUBLE)),
      |    6) AS heaps_beta FROM curve)
      |SELECT CAST(decile AS INTEGER) AS decile, n_docs,
      |  CAST(cum_docs AS BIGINT) AS cum_docs,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST(cum_vocab AS BIGINT) AS cum_vocab, heaps_beta
      |FROM curve CROSS JOIN beta ORDER BY decile""".stripMargin

  /** JENSEN–SHANNON DIVERGENCE between every pair of sources' token
    * distributions — the symmetric, bounded ([0, ln 2]) corpus-drift
    * measure: which sources speak the same language (in distribution,
    * not just vocabulary — [[sourceOverlap]]'s Jaccard sees shared
    * TYPES, this sees shared MASS). The standard readout for routing,
    * mixture design, and duplicate-source detection.
    *
    * Shape: the join-free posting-list pairing ([[sourceOverlap]]) —
    * per token, the ≤C(sources,2) source pairs expand LOCALLY from one
    * sorted struct array; only tokens present in BOTH sides need terms
    * (singleton mass folds in closed form: JSD = ½[Σ_both + ln2·(1−Sp)
    * + ln2·(1−Sq)] with Sp, Sq the shared-token mass — EXACT integers
    * over the totals). The float term sum follows the tokenEntropy
    * tolerance discipline (round 4; each term bounded by ln 2).
    *
    * Scale: one wordcount shuffle to the (source, tok) census; pair
    * expansion is bounded by sources², never rows; totals broadcast. */
  def jsdSources(s: SparkSession, d: String): DataFrame = {
    val census = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .pin() // two consumers: totals + postings
    val totals = census.groupBy("source").agg(sum(col("c")).as("nt"))
    val pairs = census.groupBy("tok")
      .agg(sort_array(collect_list(struct(col("source"), col("c")))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1), y ->
          |    struct(x.source AS s1, x.c AS c1, y.source AS s2, y.c AS c2))))"""
          .stripMargin)).as("p"))
      .select(col("p.s1"), col("p.c1"), col("p.s2"), col("p.c2"))
      .join(broadcast(totals).select(col("source").as("s1"),
        col("nt").as("n1")), Seq("s1"))
      .join(broadcast(totals).select(col("source").as("s2"),
        col("nt").as("n2")), Seq("s2"))
    val p = col("c1").cast("double") / col("n1").cast("double")
    val q = col("c2").cast("double") / col("n2").cast("double")
    pairs.groupBy("s1", "s2")
      .agg(count(lit(1)).as("n_shared"),
        sum(col("c1")).as("sc1"), sum(col("c2")).as("sc2"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(p * log(lit(2.0) * p / (p + q)) +
          q * log(lit(2.0) * q / (p + q))).as("both"))
      .select(col("s1"), col("s2"), col("n_shared"),
        round((col("both") +
          (lit(1.0) - col("sc1").cast("double") / col("n1").cast("double")) * log(lit(2.0)) +
          (lit(1.0) - col("sc2").cast("double") / col("n2").cast("double")) * log(lit(2.0)))
          / 2.0, 4).as("jsd"))
      .orderBy("s1", "s2")
  }

  val jsdSourcesSql: String =
    """WITH census AS (
      |  SELECT source, tok, count(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS nt FROM census
      |  GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS s1, a.c AS c1, b.source AS s2, b.c AS c2,
      |    ta.nt AS n1, tb.nt AS n2
      |  FROM census a JOIN census b ON a.tok = b.tok AND a.source < b.source
      |  JOIN totals ta ON ta.source = a.source
      |  JOIN totals tb ON tb.source = b.source)
      |SELECT s1, s2, count(*) AS n_shared,
      |  round((sum(
      |      (CAST(c1 AS DOUBLE)/n1) * ln(2.0*(CAST(c1 AS DOUBLE)/n1)
      |        / (CAST(c1 AS DOUBLE)/n1 + CAST(c2 AS DOUBLE)/n2))
      |      + (CAST(c2 AS DOUBLE)/n2) * ln(2.0*(CAST(c2 AS DOUBLE)/n2)
      |        / (CAST(c1 AS DOUBLE)/n1 + CAST(c2 AS DOUBLE)/n2)))
      |    + (1.0 - CAST(sum(c1) AS DOUBLE)/max(n1)) * ln(2.0)
      |    + (1.0 - CAST(sum(c2) AS DOUBLE)/max(n2)) * ln(2.0)) / 2.0,
      |    4) AS jsd
      |FROM pairs GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin

  /** CLASSIFIER METRICS for the stopword language-ID heuristic against
    * the corpus's declared labels, binarized on 'en': precision /
    * recall / F1 / accuracy / MCC from the exact confusion counts —
    * the model-evaluation readout [[langConfusion]]'s raw matrix feeds
    * (every filtered pipeline reports exactly this table).
    *
    * Determinism: TP/FP/FN/TN are exact integers; each metric is one
    * pinned double formula; MCC's denominator is one IEEE sqrt of an
    * exact product (decimal — the four marginals multiply past int64
    * at corpus scale). Degenerate zero marginals pin to NULL.
    *
    * Scale: one codegen'd scan → 4 counters. */
  def classifierMetrics(s: SparkSession, d: String): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val hits = col("ts").getField("n_stopwords")
    val scored = Tables.documents(s, d)
      .select(col("lang"),
        graft.functions.GraftFunctions.tokenStats(col("text"), stopwords)
          .as("ts"))
      .select((col("lang") === "en").as("actual"), (hits >= 2).as("pred"))
    val cells = scored.agg(
      sum(when(col("actual") && col("pred"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("actual") && col("pred"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("actual") && !col("pred"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("actual") && !col("pred"), 1L).otherwise(0L)).as("tn"))
    val denom2 = (col("tp") + col("fp")).cast(big) *
      (col("tp") + col("fn")) * (col("tn") + col("fp")) *
      (col("tn") + col("fn"))
    cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round(col("tp").cast("double") /
        greatest(col("tp") + col("fp"), lit(1L)), 6).as("precision"),
      round(col("tp").cast("double") /
        greatest(col("tp") + col("fn"), lit(1L)), 6).as("recall"),
      round(lit(2.0) * col("tp") /
        greatest(lit(2L) * col("tp") + col("fp") + col("fn"), lit(1L)), 6)
        .as("f1"),
      round((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("accuracy"),
      when(denom2 === 0, lit(null).cast("double"))
        .otherwise(round(
          (col("tp").cast(big) * col("tn") - col("fp").cast(big) * col("fn"))
            .cast("double") / sqrt(denom2.cast("double")), 6)).as("mcc"))
  }

  val classifierMetricsSql: String = {
    val hitExpr =
      s"len(list_filter(string_split(text,' '), t -> t IN ($stopList)))"
    s"""WITH scored AS (
       |  SELECT (lang = 'en') AS actual, ($hitExpr >= 2) AS pred
       |  FROM documents),
       |cells AS (
       |  SELECT
       |    CAST(sum(CASE WHEN actual AND pred THEN 1 ELSE 0 END) AS BIGINT)
       |      AS tp,
       |    CAST(sum(CASE WHEN NOT actual AND pred THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN actual AND NOT pred THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT actual AND NOT pred THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tn
       |  FROM scored)
       |SELECT tp, fp, fn, tn,
       |  round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6) AS precision,
       |  round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6) AS recall,
       |  round(2.0 * tp / greatest(2 * tp + fp + fn, 1), 6) AS f1,
       |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
       |    AS accuracy,
       |  CASE WHEN CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp)
       |      * (tn + fn) = 0 THEN NULL
       |    ELSE round(CAST(CAST(tp AS HUGEINT) * tn
       |        - CAST(fp AS HUGEINT) * fn AS DOUBLE)
       |      / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp)
       |        * (tn + fn) AS DOUBLE)), 6) END AS mcc
       |FROM cells""".stripMargin
  }

  /** N-GRAM NOVELTY CURVE: per doc_id decile, what fraction of each
    * document's distinct 3-grams were ALREADY seen in an earlier doc —
    * the corpus-freshness statistic behind "is the tail of my crawl
    * just recombinations" (and the doc-level face of [[heapsLaw]]'s
    * vocabulary curve; the Lee et al. dedup papers report exactly this
    * overlap ratio before/after dedup).
    *
    * Distributed form: NO ordered scan — a gram's first appearance is
    * its min doc_id (one combinable aggregate), and "seen before" for a
    * (doc, gram) pair is just fd < doc_id after an equi-join on the
    * gram key. Deciles are a pure projection off the contiguous doc_id
    * domain ([[heapsLaw]]'s guard: raise_error if not contiguous).
    *
    * Scale: two gram-keyed shuffles (first-doc aggregate + the join
    * back), both map-side-combinable; the 32-byte gram strings could
    * ride as xxhash64 keys at 100 TB (the [[graft.dedup.Dedup]]
    * span-dedup discipline) — kept as strings here for oracle parity. */
  def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.agg(count(lit(1)).as("nd"),
      (max(col("doc_id")) - min(col("doc_id")) + 1).as("span"))
      .select(when(col("nd") === col("span"), col("nd"))
        .otherwise(raise_error(concat(
          lit("ngramNovelty: doc_id not contiguous: n="),
          col("nd"), lit(" span="), col("span"))))
        .as("nd"))
    val pairs = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesFromWords(col("w"))).as("g"))
    val fd = pairs.groupBy("g").agg(min(col("doc_id")).as("fd"))
    val perDoc = pairs.join(fd, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(nDocs))
      .select(expr("doc_id * 10 DIV nd").as("decile"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).cast("long").as("grams"),
        sum(col("n_seen")).cast("long").as("grams_seen"))
      .select(col("decile").cast("int").as("decile"), col("n_docs"),
        col("grams"), col("grams_seen"),
        when(col("grams") === 0, lit(0.0))
          .otherwise(round(col("grams_seen").cast("double")
            / col("grams"), 6)).as("dup_frac"))
      .orderBy("decile")
  }

  val ngramNoveltySql: String =
    """WITH nd AS (
      |  SELECT count(*) AS nd,
      |    max(doc_id) - min(doc_id) + 1 AS span FROM documents),
      |words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pairs AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
      |  FROM words WHERE len(w) >= 3),
      |fd AS (SELECT g, min(doc_id) AS fd FROM pairs GROUP BY 1),
      |per_doc AS (
      |  SELECT p.doc_id, count(*) AS n_grams,
      |    sum(CASE WHEN f.fd < p.doc_id THEN 1 ELSE 0 END) AS n_seen
      |  FROM pairs p JOIN fd f USING (g) GROUP BY 1),
      |dec AS (
      |  SELECT (d.doc_id * 10) // nd.nd AS decile,
      |    coalesce(pd.n_grams, 0) AS n_grams,
      |    coalesce(pd.n_seen, 0) AS n_seen
      |  FROM documents d CROSS JOIN nd LEFT JOIN per_doc pd
      |    ON pd.doc_id = d.doc_id)
      |SELECT CAST(decile AS INT) AS decile, count(*) AS n_docs,
      |  CAST(sum(n_grams) AS BIGINT) AS grams,
      |  CAST(sum(n_seen) AS BIGINT) AS grams_seen,
      |  CASE WHEN sum(n_grams) = 0 THEN 0.0
      |    ELSE round(CAST(sum(n_seen) AS DOUBLE) / sum(n_grams), 6)
      |  END AS dup_frac
      |FROM dec GROUP BY decile ORDER BY decile""".stripMargin

  /** Pseudo-sentence length for corpora without terminal punctuation
    * (this corpus has zero `[.!?]` — verified): the standard
    * fixed-window chunking fallback. */
  val readabilityChunk = 20

  /** FLESCH READING EASE per document — the length/complexity prior
    * quality cascades add next to [[q_quality_filter]]'s Gopher rules:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Words = maximal `[a-z]+` runs of the lowercased text; syllables =
    * the vowel-group heuristic (maximal `[aeiouy]+` runs — the classic
    * dictionary-free approximation); sentences = real `[.!?]+`
    * terminators when present, else ⌈words/20⌉ pseudo-sentences
    * ([[readabilityChunk]]) so the formula stays defined on this
    * unpunctuated corpus.
    *
    * Exactness: all three inputs are exact integer counts (the regexes
    * are RE2/Java-identical literal classes); the score is one double
    * expression over them, rounded. Scale: embarrassingly parallel
    * map-side counting — no shuffle at all beyond the final ordering
    * the driver imposes. */
  def readability(s: SparkSession, d: String): DataFrame = {
    val lc = lower(col("text"))
    val words = size(regexp_extract_all(lc, lit("[a-z]+"), lit(0)))
      .cast("long")
    val syll = size(regexp_extract_all(lc, lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val realSent = size(regexp_extract_all(lc, lit("[.!?]+"), lit(0)))
      .cast("long")
    val flesch = lit(206.835) -
      lit(1.015) * (col("words").cast("double") / col("sentences")) -
      lit(84.6) * (col("syllables").cast("double") / col("words"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), words.as("words"),
        syll.as("syllables"), realSent.as("real_sent"))
      .select(col("doc_id"), col("lang"), col("words"), col("syllables"),
        when(col("real_sent") > 0L, col("real_sent"))
          .otherwise(expr(
            s"(words + ${readabilityChunk - 1}) div $readabilityChunk"))
          .as("sentences"))
      .filter(col("words") > 0L && col("sentences") > 0L)
      .select(col("doc_id"), col("lang"), col("words"),
        col("syllables"), col("sentences"),
        round(flesch, 6).as("flesch"),
        (flesch >= 60.0).as("easy_read"))
  }

  val readabilitySql: String =
    s"""WITH c AS (
       |  SELECT doc_id, lang,
       |    CAST(length(regexp_extract_all(lower(text), '[a-z]+'))
       |      AS BIGINT) AS words,
       |    CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
       |      AS BIGINT) AS syllables,
       |    CAST(length(regexp_extract_all(lower(text), '[.!?]+'))
       |      AS BIGINT) AS real_sent
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, lang, words, syllables,
       |    CASE WHEN real_sent > 0 THEN real_sent
       |      ELSE (words + ${readabilityChunk - 1}) // $readabilityChunk
       |    END AS sentences
       |  FROM c)
       |SELECT doc_id, lang, words, syllables, sentences,
       |  round(206.835
       |    - 1.015 * (CAST(words AS DOUBLE) / sentences)
       |    - 84.6 * (CAST(syllables AS DOUBLE) / words), 6) AS flesch,
       |  (206.835
       |    - 1.015 * (CAST(words AS DOUBLE) / sentences)
       |    - 84.6 * (CAST(syllables AS DOUBLE) / words) >= 60.0)
       |    AS easy_read
       |FROM n WHERE words > 0 AND sentences > 0""".stripMargin

  /** TextRank fixed-point iterations — unrolled like the graph
    * family's [[graft.ops.Graph.prIters]] so both engines compute the
    * identical integer trajectory. */
  val trIters = 5
  /** Integer score scale (1.0 ≡ 1 000 000 walks). */
  val trScale = 1000000L
  /** Corpus stopwords excluded from the keyword graph. */
  val trStop = Seq("a", "the")

  /** TEXTRANK KEYWORD EXTRACTION — PageRank over the word
    * CO-OCCURRENCE graph (Mihalcea & Tarau 2004): vertices are
    * non-stopword vocabulary terms, undirected edges weighted by
    * corpus-wide co-occurrence counts within a ±2 token window. The
    * rank runs in the graph family's EXACT-INTEGER fixed-point
    * discipline (scale [[trScale]], floor division at every step —
    * see [[graft.ops.Graph.pageRank]]), generalized to weighted
    * edges: r'(v) = 150000 + ⌊850·Σ_u ⌊r(u)·w_uv / wdeg(u)⌋ / 1000⌋,
    * so every iterate is an exact integer on both engines regardless
    * of partitioning or join order.
    *
    * Scale: token-pair extraction is the map-heavy stage — O(tokens)
    * rows shuffled once to aggregate pair counts (vocabulary² is the
    * ceiling, tiny against the corpus); the [[trIters]] iterations
    * then run on the O(vocabulary) rank frame — broadcast-size here,
    * key-shuffle joins at 100 TB vocabularies. */
  def textRank(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
      .filter(col("w").rlike("^[a-z]+$") && !col("w").isin(trStop: _*))
    // co-occurrence within ±2 positions (stopword slots still count as
    // positions — the standard surface-window convention)
    val pairs = Seq(1, 2).map { k =>
      toks.as("t1").join(toks.as("t2"),
        col("t1.doc_id") === col("t2.doc_id") &&
          col("t2.pos") === col("t1.pos") + k &&
          col("t1.w") =!= col("t2.w"))
        .select(least(col("t1.w"), col("t2.w")).as("u"),
          greatest(col("t1.w"), col("t2.w")).as("v"))
    }.reduce(_ unionAll _)
    val edges = pairs.groupBy("u", "v").agg(count(lit(1)).as("w"))
    val bi = edges.select(col("u"), col("v"), col("w"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
    val deg = bi.groupBy(col("u").as("x"))
      .agg(sum("w").cast("long").as("wdeg"))
    var r = deg.select(col("x"), col("wdeg"), lit(trScale).as("r"))
    for (_ <- 1 to trIters) {
      val contrib = bi
        .join(r.select(col("x").as("u"),
          col("r").as("ru"), col("wdeg").as("du")), Seq("u"))
        .groupBy(col("v").as("x"))
        .agg(sum(expr("(ru * w) div du")).cast("long").as("s"))
      r = deg.join(contrib, Seq("x"))
        .select(col("x"), col("wdeg"),
          (lit(150L * trScale / 1000L) + expr("(850 * s) div 1000"))
            .as("r"))
    }
    r.orderBy(col("r").desc, col("x")).limit(15)
      .select(col("x").as("keyword"), col("wdeg").as("cooc_weight"),
        col("r").as("rank_scaled"))
  }

  val textRankSql: String = {
    val base =
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split(lower(text), ' ')) AS w,
         |    unnest(range(1, len(string_split(lower(text), ' ')) + 1))
         |      AS pos
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, w, pos FROM toks
         |  WHERE regexp_full_match(w, '[a-z]+')
         |    AND w NOT IN ('a', 'the')),
         |pairs AS (
         |  SELECT least(t1.w, t2.w) AS u, greatest(t1.w, t2.w) AS v
         |  FROM tok t1 JOIN tok t2
         |    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
         |    AND t1.w <> t2.w
         |  UNION ALL
         |  SELECT least(t1.w, t2.w), greatest(t1.w, t2.w)
         |  FROM tok t1 JOIN tok t2
         |    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 2
         |    AND t1.w <> t2.w),
         |e AS (SELECT u, v, count(*) AS w FROM pairs GROUP BY 1, 2),
         |bi AS (SELECT u, v, w FROM e
         |  UNION ALL SELECT v AS u, u AS v, w FROM e),
         |deg AS (SELECT u AS x, CAST(sum(w) AS BIGINT) AS wdeg
         |  FROM bi GROUP BY u),
         |r0 AS (SELECT x, wdeg, CAST($trScale AS BIGINT) AS r
         |  FROM deg)""".stripMargin
    val iters = (1 to trIters).map { i =>
      s"""r$i AS (
         |  SELECT d.x, d.wdeg,
         |    ${150L * trScale / 1000L}
         |      + CAST((850 * s.s) // 1000 AS BIGINT) AS r
         |  FROM deg d JOIN (
         |    SELECT bi.v AS x,
         |      CAST(sum((p.r * bi.w) // p.wdeg) AS BIGINT) AS s
         |    FROM bi JOIN r${i - 1} p ON p.x = bi.u
         |    GROUP BY bi.v) s ON s.x = d.x)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + iters +
      s"""
         |SELECT x AS keyword, wdeg AS cooc_weight, r AS rank_scaled
         |FROM r$trIters ORDER BY r DESC, x LIMIT 15""".stripMargin
  }

  /** VOCABULARY RICHNESS ESTIMATORS over the corpus token distribution
    * — the capture-recapture idea applied WITHIN one corpus: Chao1
    * (bias-corrected, f₂-safe) estimates how many types the corpus has
    * NOT yet shown from the singleton/doubleton counts, Good–Turing
    * coverage 1 − f₁/N estimates the probability mass of unseen types,
    * and Simpson concentration Σnᵢ(nᵢ−1)/(N(N−1)) is the repeat-rate
    * dual ([[graft.ops.Sketches]]' F₂ normalized). Together they answer
    * the curation question "is more crawling still buying new
    * vocabulary?" — the saturation readout next to [[q: heaps]]' growth
    * curve.
    *
    * Exactness: every input (V, N, f₁, f₂, Σnᵢ(nᵢ−1)) is an exact
    * integer off the token-frequency relation; each estimator is one
    * pinned formula of them, rounded.
    *
    * Scale: the wordcount shape — explode to tokens, one combinable
    * groupBy, one O(1)-state reduce; text never shuffles. */
  def vocabRichness(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("c"))
      .agg(
        count(lit(1)).cast("long").as("v_types"),
        sum(col("c")).cast("long").as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
        sum(col("c") * (col("c") - 1)).cast("long").as("rep2"))
      .select(col("v_types"), col("n_tokens"), col("f1"), col("f2"),
        round(col("v_types").cast("double") +
          (col("f1") * (col("f1") - 1)).cast("double") /
          ((col("f2") + 1) * 2).cast("double"), 4).as("chao1"),
        round(lit(1.0) - col("f1").cast("double") /
          col("n_tokens").cast("double"), 6).as("gt_coverage"),
        round(col("rep2").cast("double") /
          (col("n_tokens").cast("double") *
            (col("n_tokens") - 1).cast("double")), 8).as("simpson"))

  lazy val vocabRichnessSql: String =
    """WITH tf AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS v_types,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep2
      |  FROM tf)
      |SELECT v_types, n_tokens, f1, f2,
      |  round(CAST(v_types AS DOUBLE)
      |    + CAST(f1 * (f1 - 1) AS DOUBLE) / CAST((f2 + 1) * 2 AS DOUBLE), 4)
      |    AS chao1,
      |  round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
      |    AS gt_coverage,
      |  round(CAST(rep2 AS DOUBLE) /
      |    (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)), 8)
      |    AS simpson
      |FROM agg""".stripMargin


  /** Minimum length (chars) for the third screen of [[fleissKappa]]. */
  val fleissLenMin = 200L

  /** FLEISS' KAPPA across THREE quality screens — the multi-rater
    * generalization completing the agreement family
    * ([[classifierAgreement]] is the 2-rater Cohen form): raters are
    * the heuristic cascade ([[qualityFilter]].keep), the unigram-LM
    * threshold (cross_entropy ≤ [[agreementCeMax]], as in
    * [[classifierAgreement]]), and the plain length screen
    * (n_chars ≥ [[fleissLenMin]]). With m = 3 binary raters, per-item
    * agreement is Pᵢ = (v² + (3−v)² − 3)/6 for v keep-votes, so
    * P̄·6N = Σ(v² + (3−v)²) − 3N is an exact integer, the chance
    * agreement P̄ₑ comes from the exact global vote share, and
    * κ = (P̄ − P̄ₑ)/(1 − P̄ₑ) is a pinned double formula over four
    * exact integers. The vote histogram (how many docs got 0/1/2/3
    * keeps) ships alongside — the disagreement surface itself.
    *
    * Scale: three doc-keyed screens join on doc_id (combinable
    * aggregates or pure projections), one O(1)-state reduce. */
  def fleissKappa(s: SparkSession, d: String): DataFrame = {
    val qf = qualityFilter(s, d).select(col("doc_id"),
      col("keep").cast("int").as("r1"))
    val lm = lmScore(s, d).select(col("doc_id"),
      (col("cross_entropy") <= agreementCeMax).cast("int").as("r2"))
    val len = Tables.documents(s, d).select(col("doc_id"),
      (col("n_chars") >= fleissLenMin).cast("int").as("r3"))
    val votes = qf.join(lm, Seq("doc_id")).join(len, Seq("doc_id"))
      .select((col("r1") + col("r2") + col("r3")).cast("long").as("v"))
    val agg = votes.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("long").as("keeps"),
      sum(col("v") * col("v") + (lit(3) - col("v")) * (lit(3) - col("v")))
        .cast("long").as("sq"),
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("v0"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("v1"),
      sum(when(col("v") === 2, 1L).otherwise(0L)).as("v2"),
      sum(when(col("v") === 3, 1L).otherwise(0L)).as("v3"))
    val pbar = (col("sq") - lit(3) * col("n")).cast("double") /
      (lit(6.0) * col("n").cast("double"))
    val pk = col("keeps").cast("double") / (lit(3.0) * col("n").cast("double"))
    val pe = pk * pk + (lit(1.0) - pk) * (lit(1.0) - pk)
    agg.select(col("n").as("n_docs"), col("v0"), col("v1"), col("v2"),
      col("v3"),
      round(pbar, 6).as("p_bar"),
      round(pe, 6).as("p_e"),
      round((pbar - pe) / (lit(1.0) - pe), 6).as("fleiss_kappa"))
  }

  lazy val fleissKappaSql: String =
    s"""WITH qf AS ($qualityFilterSql),
       |lm AS ($lmScoreSql),
       |votes AS (
       |  SELECT (CAST(qf.keep AS INT) +
       |    CAST((lm.cross_entropy <= $agreementCeMax) AS INT) +
       |    CAST((dd.n_chars >= $fleissLenMin) AS INT)) AS v
       |  FROM qf
       |  JOIN lm ON lm.doc_id = qf.doc_id
       |  JOIN documents dd ON dd.doc_id = qf.doc_id),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(v) AS BIGINT) AS keeps,
       |    CAST(sum(v * v + (3 - v) * (3 - v)) AS BIGINT) AS sq,
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
       |    CAST(sum(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
       |    CAST(sum(CASE WHEN v = 3 THEN 1 ELSE 0 END) AS BIGINT) AS v3
       |  FROM votes),
       |f AS (
       |  SELECT *,
       |    CAST(sq - 3 * n AS DOUBLE) / (6.0 * CAST(n AS DOUBLE)) AS pbar,
       |    (CAST(keeps AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) AS pk
       |  FROM agg)
       |SELECT n AS n_docs, v0, v1, v2, v3,
       |  round(pbar, 6) AS p_bar,
       |  round(pk * pk + (1.0 - pk) * (1.0 - pk), 6) AS p_e,
       |  round((pbar - (pk * pk + (1.0 - pk) * (1.0 - pk))) /
       |    (1.0 - (pk * pk + (1.0 - pk) * (1.0 - pk))), 6) AS fleiss_kappa
       |FROM f""".stripMargin

  /** CRONBACH'S ALPHA (KR-20) over the SAME three binary quality
    * screens as [[fleissKappa]] — the INTERNAL-CONSISTENCY reading of
    * the rater family: κ asks "do the screens agree beyond chance on
    * each doc", α asks "do the screens measure ONE underlying quality
    * trait" (can their sum be used as a composite score?). For k
    * dichotomous items this is exactly Kuder–Richardson 20:
    * α = k/(k−1) · (1 − Σᵢ pᵢqᵢ / σ²_total).
    *
    * Exactness: with binary items, rᵢ² = rᵢ, so every moment is an
    * integer aggregate — item sums s₁..s₃, pairwise product sums
    * p₁₂, p₁₃, p₂₃ — and both variances share the n² scale:
    * n²·Var(item i) = n·sᵢ − sᵢ², n²·Var(total) = n·Σv² − (Σv)² with
    * Σv² = Σsᵢ + 2Σpᵢⱼ. α and each ALPHA-IF-DELETED (the k=2
    * Spearman–Brown-adjacent diagnostic: which screen hurts the
    * composite?) are single divisions of exact integers; the item
    * marginals ship alongside.
    *
    * Scale: the [[fleissKappa]] posture — three doc-keyed screens,
    * one O(1)-state reduce. */
  def cronbachAlpha(s: SparkSession, d: String): DataFrame = {
    val qf = qualityFilter(s, d).select(col("doc_id"),
      col("keep").cast("long").as("r1"))
    val lm = lmScore(s, d).select(col("doc_id"),
      (col("cross_entropy") <= agreementCeMax).cast("long").as("r2"))
    val len = Tables.documents(s, d).select(col("doc_id"),
      (col("n_chars") >= fleissLenMin).cast("long").as("r3"))
    val agg = qf.join(lm, Seq("doc_id")).join(len, Seq("doc_id"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("r1")).cast("long").as("s1"),
        sum(col("r2")).cast("long").as("s2"),
        sum(col("r3")).cast("long").as("s3"),
        sum(col("r1") * col("r2")).cast("long").as("p12"),
        sum(col("r1") * col("r3")).cast("long").as("p13"),
        sum(col("r2") * col("r3")).cast("long").as("p23"))
    // n²-scaled variances: vi = n·si − si²; pair totals for drop-1.
    val v1 = col("n") * col("s1") - col("s1") * col("s1")
    val v2 = col("n") * col("s2") - col("s2") * col("s2")
    val v3 = col("n") * col("s3") - col("s3") * col("s3")
    def vtot(ss: Column, sq: Column) = col("n") * sq - ss * ss
    val sv = col("s1") + col("s2") + col("s3")
    val sq3 = sv + lit(2L) * (col("p12") + col("p13") + col("p23"))
    def alpha(k: Double, items: Column, total: Column): Column =
      lit(k / (k - 1.0)) *
        (lit(1.0) - items.cast("double") / total.cast("double"))
    agg.select(col("n").as("n_docs"),
      col("s1").as("keep_cascade"), col("s2").as("keep_lm"),
      col("s3").as("keep_len"),
      round(alpha(3.0, v1 + v2 + v3, vtot(sv, sq3)), 6).as("alpha"),
      round(alpha(2.0, v2 + v3,
        vtot(col("s2") + col("s3"),
          col("s2") + col("s3") + lit(2L) * col("p23"))), 6)
        .as("alpha_drop_cascade"),
      round(alpha(2.0, v1 + v3,
        vtot(col("s1") + col("s3"),
          col("s1") + col("s3") + lit(2L) * col("p13"))), 6)
        .as("alpha_drop_lm"),
      round(alpha(2.0, v1 + v2,
        vtot(col("s1") + col("s2"),
          col("s1") + col("s2") + lit(2L) * col("p12"))), 6)
        .as("alpha_drop_len"))
  }

  lazy val cronbachAlphaSql: String =
    s"""WITH qf AS ($qualityFilterSql),
       |lm AS ($lmScoreSql),
       |items AS (
       |  SELECT CAST(qf.keep AS BIGINT) AS r1,
       |    CAST((lm.cross_entropy <= $agreementCeMax) AS BIGINT) AS r2,
       |    CAST((dd.n_chars >= $fleissLenMin) AS BIGINT) AS r3
       |  FROM qf
       |  JOIN lm ON lm.doc_id = qf.doc_id
       |  JOIN documents dd ON dd.doc_id = qf.doc_id),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(r1) AS BIGINT) AS s1, CAST(sum(r2) AS BIGINT) AS s2,
       |    CAST(sum(r3) AS BIGINT) AS s3,
       |    CAST(sum(r1 * r2) AS BIGINT) AS p12,
       |    CAST(sum(r1 * r3) AS BIGINT) AS p13,
       |    CAST(sum(r2 * r3) AS BIGINT) AS p23
       |  FROM items)
       |SELECT n AS n_docs,
       |  s1 AS keep_cascade, s2 AS keep_lm, s3 AS keep_len,
       |  round((3.0 / 2.0) * (1.0 -
       |    CAST((n*s1 - s1*s1) + (n*s2 - s2*s2) + (n*s3 - s3*s3) AS DOUBLE)
       |    / CAST(n * (s1 + s2 + s3 + 2*(p12 + p13 + p23))
       |           - (s1+s2+s3) * (s1+s2+s3) AS DOUBLE)), 6) AS alpha,
       |  round(2.0 * (1.0 -
       |    CAST((n*s2 - s2*s2) + (n*s3 - s3*s3) AS DOUBLE)
       |    / CAST(n * (s2 + s3 + 2*p23) - (s2+s3) * (s2+s3) AS DOUBLE)), 6)
       |    AS alpha_drop_cascade,
       |  round(2.0 * (1.0 -
       |    CAST((n*s1 - s1*s1) + (n*s3 - s3*s3) AS DOUBLE)
       |    / CAST(n * (s1 + s3 + 2*p13) - (s1+s3) * (s1+s3) AS DOUBLE)), 6)
       |    AS alpha_drop_lm,
       |  round(2.0 * (1.0 -
       |    CAST((n*s1 - s1*s1) + (n*s2 - s2*s2) AS DOUBLE)
       |    / CAST(n * (s1 + s2 + 2*p12) - (s1+s2) * (s1+s2) AS DOUBLE)), 6)
       |    AS alpha_drop_len
       |FROM agg""".stripMargin

  /** GOOD–TURING frequency-of-frequencies table (r = 1..10) over the
    * corpus TRIGRAM counts — the smoothing estimator behind every
    * count-based LM ([[knBigramScore]]'s absolute discount D = 0.75 is
    * the fixed-D approximation of exactly this table; Katz backoff
    * reads it directly): r* = (r+1)·N_{r+1}/N_r is the adjusted count,
    * and the unseen mass P₀ = N₁/N is the probability budget the LM
    * reserves for n-grams it has never seen. Trigrams, not unigrams,
    * because GT lives in the sparse tail and this corpus's 31-word
    * vocabulary has NO rare unigrams (min count 26) — exactly why real
    * LMs apply GT at the n-gram level where N₁ is large (9.4k singleton
    * trigrams at sf0.01). [[vocabRichness]] reports the r=1,2 summary
    * (Chao1/coverage); this is the full table those cells come from.
    *
    * Exactness: N_r, N_{r+1}, N are exact longs off the n-gram
    * census; r* and p_r are one double division each (round 6/10).
    * Empty N_{r+1} cells (count gaps) surface as r_star = 0 — the
    * honest "smoothing needs a fit here" signal (Gale's simple GT
    * regression), not a silent interpolation.
    *
    * Scale: trigram expansion is per-row local (no shuffle); then two
    * map-side-combinable aggregates (tri → c → N_c); the freq-of-freq
    * relation is at most max-count rows. */
  def goodTuring(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(explode(expr(
        """transform(sequence(0, size(t) - 3),
          |  i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))""".stripMargin))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .pin() // consumers: freq-of-freq census + total mass
    val fof = counts.groupBy("c").agg(count(lit(1)).as("n_r"))
    val tot = counts.agg(sum(col("c")).cast("long").as("n"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("n1"))
    fof.filter(col("c") <= 10)
      .join(fof.select((col("c") - 1).as("c"), col("n_r").as("n_r1")),
        Seq("c"), "left")
      .crossJoin(broadcast(tot))
      .select(col("c").cast("int").as("r"), col("n_r"),
        coalesce(col("n_r1"), lit(0L)).as("n_r_plus1"),
        round((col("c") + 1).cast("double") *
          coalesce(col("n_r1"), lit(0L)) / col("n_r"), 6).as("r_star"),
        round((col("c") + 1).cast("double") *
          coalesce(col("n_r1"), lit(0L)) / col("n_r") /
          col("n").cast("double"), 10).as("p_gt"),
        round(col("n1").cast("double") / col("n").cast("double"), 8)
          .as("p0_unseen"))
      .orderBy("r")
  }

  val goodTuringSql: String =
    """WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |counts AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(list_transform(
      |      generate_series(1, greatest(len(ts) - 2, 0)),
      |      i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS tok
      |    FROM toks)
      |  GROUP BY 1),
      |fof AS (SELECT c, CAST(count(*) AS BIGINT) AS n_r FROM counts
      |  GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |  FROM counts)
      |SELECT CAST(f.c AS INTEGER) AS r, f.n_r,
      |  coalesce(f1.n_r, 0) AS n_r_plus1,
      |  round(CAST(f.c + 1 AS DOUBLE) * coalesce(f1.n_r, 0) / f.n_r, 6)
      |    AS r_star,
      |  round(CAST(f.c + 1 AS DOUBLE) * coalesce(f1.n_r, 0) / f.n_r
      |    / CAST(n AS DOUBLE), 10) AS p_gt,
      |  round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE), 8) AS p0_unseen
      |FROM fof f LEFT JOIN fof f1 ON f1.c = f.c + 1 CROSS JOIN tot
      |WHERE f.c <= 10 ORDER BY r""".stripMargin

  /** TOKENIZER FERTILITY by language — subwords per whitespace word,
    * THE tokenizer-evaluation metric (a tokenizer trained on English
    * "spends" more subwords per word on other scripts; fertility by
    * language is how multilingual-budget papers report it) plus
    * bytes-per-subword, the compression view. Completes the tokenizer
    * family: [[textStats]] counts per doc, [[q: oov]] measures vocab
    * coverage, this rolls the cost up to the language level where
    * mixture decisions are made.
    *
    * Exactness: token/subword/char sums are exact longs off the
    * one-pass native [[graft.functions.TokenStats]] scan; each ratio
    * is one double division (round 6).
    *
    * Scale: codegen'd scan → 5-row aggregate; nothing else moves. */
  def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    val ts = col("ts")
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        graft.functions.GraftFunctions.tokenStats(col("text"), stopwords)
          .as("ts"))
      .select(col("lang"), col("n_chars"),
        ts.getField("n_tokens").as("n_tokens"),
        ts.getField("n_subwords").as("n_subwords"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("tokens"),
        sum(col("n_subwords")).cast("long").as("subwords"),
        sum(col("n_chars")).cast("long").as("chars"))
      .select(col("lang"), col("n_docs"), col("tokens"), col("subwords"),
        round(col("subwords").cast("double") / col("tokens"), 6)
          .as("fertility"),
        round(col("chars").cast("double") / col("subwords"), 6)
          .as("chars_per_subword"))
      .orderBy("lang")
  }

  val tokenizerFertilitySql: String =
    """WITH per_doc AS (
      |  SELECT lang, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(list_sum(list_transform(string_split(text, ' '),
      |      t -> (length(t) + 2) // 3)) AS BIGINT) AS n_subwords
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
      |  CAST(sum(n_subwords) AS BIGINT) AS subwords,
      |  round(CAST(sum(n_subwords) AS DOUBLE) / sum(n_tokens), 6)
      |    AS fertility,
      |  round(CAST(sum(n_chars) AS DOUBLE) / sum(n_subwords), 6)
      |    AS chars_per_subword
      |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  /** BURROWS' DELTA between every pair of sources — the classic
    * stylometry / authorship-attribution distance (Burrows 2002):
    * z-score each source's relative frequency of the top-K corpus
    * words (function words dominate any top-K list, and function-word
    * profiles are the stylistic fingerprint), then Δ(a,b) = mean
    * |z_a − z_b|. Complements [[jsdSources]]: JSD sees distribution
    * MASS (what is said), Delta normalizes each word by its
    * cross-source spread (how it's said) — two sources can be JSD-near
    * and Delta-far.
    *
    * Determinism: counts/totals exact; the full K×|sources| grid is
    * materialized (missing cells = exact 0) so both engines see
    * identical term sets; per-word mean/variance and the per-pair
    * |Δz| sum are bounded-term float folds rounded at 4 dp (the
    * [[jsdSources]] tolerance discipline). Top-K selection tie-breaks
    * by token text. Zero-variance words contribute exactly 0.
    *
    * Scale: one wordcount shuffle; everything after the census is
    * O(K·|sources|) + O(K·pairs) — sources², never rows. */
  def burrowsDelta(s: SparkSession, d: String): DataFrame = {
    val topK = 20
    val census = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .pin() // consumers: totals, top-K selection, grid fill
    val totals = census.groupBy("source").agg(sum(col("c")).as("nt"))
    val top = census.groupBy("tok").agg(sum(col("c")).as("ct"))
      .orderBy(col("ct").desc, col("tok").asc).limit(topK)
      .select(col("tok"))
    // full grid: every (source, top word) cell, absent counts = exact 0
    val grid = totals.crossJoin(broadcast(top))
      .join(census, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"),
        (coalesce(col("c"), lit(0L)).cast("double") /
          col("nt").cast("double")).as("f"))
    val stats = grid.groupBy("tok")
      .agg(count(lit(1)).as("k"), sum(col("f")).as("sf"),
        sum(col("f") * col("f")).as("sf2"))
      .select(col("tok"),
        (col("sf") / col("k")).as("mean"),
        sqrt(greatest(col("sf2") / col("k") -
          (col("sf") / col("k")) * (col("sf") / col("k")), lit(0.0)))
          .as("sd"))
    val z = grid.join(broadcast(stats), Seq("tok"))
      .select(col("source"), col("tok"),
        when(col("sd") > 0, (col("f") - col("mean")) / col("sd"))
          .otherwise(lit(0.0)).as("z"))
    z.as("a").join(z.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_words"),
        round(sum(abs(col("a.z") - col("b.z"))) / count(lit(1)), 4)
          .as("burrows_delta"))
      .orderBy("source_a", "source_b")
  }

  val burrowsDeltaSql: String =
    """WITH census AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  GROUP BY 1, 2),
      |totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS nt FROM census
      |  GROUP BY 1),
      |top AS (
      |  SELECT tok FROM (SELECT tok, sum(c) AS ct FROM census GROUP BY 1)
      |  ORDER BY ct DESC, tok ASC LIMIT 20),
      |grid AS (
      |  SELECT t.source, w.tok,
      |    CAST(coalesce(c.c, 0) AS DOUBLE) / CAST(t.nt AS DOUBLE) AS f
      |  FROM totals t CROSS JOIN top w
      |  LEFT JOIN census c ON c.source = t.source AND c.tok = w.tok),
      |stats AS (
      |  SELECT tok, sum(f) / count(*) AS mean,
      |    sqrt(greatest(sum(f * f) / count(*)
      |      - (sum(f) / count(*)) * (sum(f) / count(*)), 0.0)) AS sd
      |  FROM grid GROUP BY tok),
      |z AS (
      |  SELECT g.source, g.tok,
      |    CASE WHEN s.sd > 0 THEN (g.f - s.mean) / s.sd ELSE 0.0 END AS z
      |  FROM grid g JOIN stats s USING (tok))
      |SELECT a.source AS source_a, b.source AS source_b,
      |  count(*) AS n_words,
      |  round(sum(abs(a.z - b.z)) / count(*), 4) AS burrows_delta
      |FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  /** G-TEST of independence between document language and source — the
    * likelihood-ratio twin of [[graft.ops.Analytics.chiSquareStatusPriority]]'s
    * Pearson form, and the one that equals 2N·MI exactly (reported: the
    * mutual-information link makes this THE corpus-audit readout — "does
    * each source have its own language mix?" — in nats, comparable
    * across corpora where raw G grows with N). G is additive across
    * partitions of the table where Pearson χ² is not, which is why
    * log-likelihood ratios are the collocation/corpus-comparison
    * standard (Dunning 1993).
    *
    * Determinism: observed counts and all margins are exact longs; each
    * cell's log-ratio argument is a division of two exactly-computed
    * doubles (O·N ≤ 2⁵³, R·C ≤ 2⁵³), the ln rounds 12 dp (the
    * metaFixedEffect libm-ulp guard), and the ≤100 cell terms fold in
    * (lang, source)-sorted order. Empty cells contribute 0 to G by the
    * O·ln(O) → 0 limit and simply don't exist in the census.
    *
    * Scale: one map-side-combinable (lang, source) aggregate;
    * everything after is O(cells). */
  def gTestLangSource(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).cast("long").as("o"))
    val rowT = cells.groupBy("lang").agg(sum(col("o")).cast("long").as("r"))
    val colT = cells.groupBy("source").agg(sum(col("o")).cast("long").as("c"))
    val grand = cells.agg(sum(col("o")).cast("long").as("nn"))
    val packed = cells
      .join(broadcast(rowT), Seq("lang"))
      .join(broadcast(colT), Seq("source"))
      .crossJoin(broadcast(grand))
      .groupBy(col("nn"))
      .agg(sort_array(collect_list(struct(col("lang"), col("source"),
        col("o"), col("r"), col("c")))).as("cs"),
        countDistinct(col("lang")).cast("long").as("nl"),
        countDistinct(col("source")).cast("long").as("ns"))
    val g = expr(
      """aggregate(cs, CAST(0.0 AS DOUBLE), (acc, e) ->
        |  acc + CAST(2 * e.o AS DOUBLE) *
        |    round(ln((CAST(e.o AS DOUBLE) * nn) /
        |      (CAST(e.r AS DOUBLE) * e.c)), 12))""".stripMargin)
    packed.select(col("nn").as("n_docs"),
      ((col("nl") - 1) * (col("ns") - 1)).as("dof"),
      round(g, 4).as("g_stat"),
      round(g / (lit(2.0) * col("nn").cast("double")), 6).as("mi_nats"))
  }

  val gTestLangSourceSql: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |nt AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
      |packed AS (
      |  SELECT nn,
      |    list(struct_pack(lang := lang, source := source, o := o,
      |      r := r, c := c) ORDER BY lang, source) AS cs,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS nl,
      |    CAST(count(DISTINCT source) AS BIGINT) AS ns
      |  FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN nt
      |  GROUP BY nn),
      |gq AS (
      |  SELECT nn, nl, ns,
      |    list_sum(list_transform(cs, e ->
      |      CAST(2 * e.o AS DOUBLE) *
      |        round(ln((CAST(e.o AS DOUBLE) * nn) /
      |          (CAST(e.r AS DOUBLE) * e.c)), 12))) AS g
      |  FROM packed)
      |SELECT nn AS n_docs, (nl - 1) * (ns - 1) AS dof,
      |  round(g, 4) AS g_stat,
      |  round(g / (2.0 * CAST(nn AS DOUBLE)), 6) AS mi_nats
      |FROM gq""".stripMargin

}
