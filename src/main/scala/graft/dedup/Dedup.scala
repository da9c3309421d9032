package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Pin.Pinned

/** Deduplication operators over `documents` — the LLM-corpus-curation
  * surface (north star, SURVEY.md §7.4): exact, n-gram Jaccard, MinHash
  * LSH, and SimHash near-dup detection.
  *
  * Scale design notes (the 100 TB story, per operator):
  *  - signatures (minhash vectors, simhash ints, shingle arrays) are pure
  *    per-row array expressions — no UDFs, no shuffle, codegen'd;
  *  - candidate generation shuffles on *short hash keys* (band signature /
  *    simhash half), never on document text: shuffle volume is
  *    O(docs × bands × 32 bytes), independent of document length;
  *  - pairwise verification only touches candidate pairs, never the
  *    full cross product — the same block-then-verify shape that holds
  *    when "500 docs" becomes "5 billion docs" (cf. the GPT-3/C4
  *    dedup recipe: MinHash bucketing then exact Jaccard on buckets);
  *  - all hashes are md5-derived so every stage is engine-portable and
  *    deterministic (no seed state, no RNG).
  */
object Dedup {

  /** Word tokens, the shared shingle base. */
  private def toks: Column = split(col("text"), " ")

  /** Distinct word 3-gram shingles from an ALREADY-MATERIALIZED words
    * column. Callers must stage `split(text, " ")` in its own projection
    * first: Catalyst performs no common-subexpression elimination inside
    * lambda functions, so passing `split(...)` directly re-tokenizes the
    * document for every `element_at` — measured 5x-100x slowdowns on the
    * shingle-heavy queries. Guarded for docs shorter than 3 words
    * (Spark's `sequence(1, n)` runs DESCENDING when n < 1, which would
    * fabricate bogus shingles rather than none). */
  def shinglesFromWords(w: Column): Column =
    when(size(w) < 3, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))

  /** doc_id + staged shingle column (words materialized in an inner
    * projection so the lambda sees a cheap attribute, see
    * [[shinglesFromWords]]). */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), shinglesFromWords(col("w")).as("sh"))

  /** Exact dedup keyed on an 8-word prefix (the "URL/snapshot collapse"
    * shape: same leading content = same doc). Keeps the smallest doc_id
    * per group — deterministic winner, matching the usual keep-first rule.
    * One hash-aggregate shuffle on the md5 key, map-side partial combine. */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(toks, 1, 8))).as("prefix_key"))
      .groupBy("prefix_key")
      .agg(min("doc_id").as("kept_doc_id"), count("*").as("n_members"))

  /** Pairwise n-gram Jaccard over candidate pairs that share >= 1 shingle.
    * Inverted-index form WITHOUT a self-join: explode shingles once,
    * group docs per gram, generate the per-gram doc pairs from the
    * (sorted) posting list, then count pairs. Halves the scan+shingle
    * work vs the classic two-leg self-join (Spark recomputes identical
    * join legs; measured). Posting lists here are bounded (<=25 docs per
    * gram at sf0.1); at web scale a document-frequency cap on grams is
    * the standard knob before pair generation — a stop-shingle appearing
    * in k docs materializes k²/2 pairs. Emits pairs with J >= 0.2;
    * Jaccard is an exact int/int division — oracle-stable. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    // set sizes ride along inside the posting lists, so Jaccard needs no
    // size-lookup joins at the end — joining a sizes leg would recompute
    // the scan+shingle subtree once per join (Spark plans share nothing
    // across subtrees)
    val exploded = docShingles(s, d)
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
    val postings = exploded
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) > 1)
    postings
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x.doc_id AS doc_a, x.n AS n_a,
          |           y.doc_id AS doc_b, y.n AS n_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.n_a").as("n_a"),
        col("p.doc_b").as("doc_b"), col("p.n_b").as("n_b"))
      .agg(count("*").as("n_inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
  }

  /** Asymmetric shingle CONTAINMENT — the near-dup measure Jaccard
    * misses: a short document wholly quoted inside a long one has tiny
    * Jaccard (the union is dominated by the long doc) but containment
    * n_inter/|short| ≈ 1. This is the right metric for sub-document
    * duplication: boilerplate inclusion, quote-heavy posts, page-in-site
    * collapses. Both directions ship per pair; the filter keeps pairs
    * where either direction reaches [[containmentThreshold]].
    *
    * Same posting-list shape as [[ngramJaccard]] (explode shingles once,
    * pair within each gram's posting list, one aggregate — no self-join,
    * no second scan of the corpus), so the scale posture is identical:
    * shuffles carry gram keys and integer pairs only, and the documented
    * stop-shingle df-cap bounds degenerate posting lists. */
  def containment(s: SparkSession, d: String): DataFrame = {
    val exploded = docShingles(s, d)
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
    exploded
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x.doc_id AS doc_a, x.n AS n_a,
          |           y.doc_id AS doc_b, y.n AS n_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.n_a").as("n_a"),
        col("p.doc_b").as("doc_b"), col("p.n_b").as("n_b"))
      .agg(count("*").as("n_inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / col("n_a")).as("contain_a_in_b"),
        (col("n_inter").cast("double") / col("n_b")).as("contain_b_in_a"))
      .filter(greatest(col("contain_a_in_b"), col("contain_b_in_a")) >=
        containmentThreshold)
  }

  /** Direction-max containment needed to report a pair. */
  val containmentThreshold = 0.5

  /** Number of minhash functions and LSH band width (rows per band).
    * 16 hashes in 8 bands of 2: detection probability 1-(1-J^2)^8 —
    * ~0.99 at J=0.7, ~0.75 at J=0.4 — tuned to surface the planted
    * near-dup pairs while keeping random-collision candidates rare. */
  val numHashes = 16
  val bandWidth = 2
  val numBands: Int = numHashes / bandWidth

  /** Universal-hash family for minhash: h_j(x) = (a_j·x + b_j) mod P over
    * a base fingerprint x = first 15 md5 hex digits of the shingle.
    * ONE md5 per shingle instead of one per (hash, shingle): the digests
    * were 16/17ths of q_dedup_minhash's runtime (6.3s warm → sub-second).
    * Constants are Knuth-multiplier-derived literals so the DuckDB oracle
    * reproduces them exactly; all arithmetic stays below 2^61 (x,a,b < P
    * = 1e9+7 < 2^30), so no engine-divergent overflow. */
  val minhashP = 1000000007L
  def minhashA(j: Int): Long = (2654435761L * (j + 1)) % minhashP
  def minhashB(j: Int): Long = (40503L * (j + 1) + 17L) % minhashP

  /** Base shingle fingerprints: md5 → 15 hex chars → long mod P. Must be
    * applied to a STAGED shingle column and itself staged before the 16
    * per-hash transforms (no CSE inside lambdas). */
  def shingleFingerprints(shingleCol: Column): Column =
    transform(shingleCol, g =>
      conv(substring(md5(g), 1, 15), 16, 10).cast("long") % minhashP)

  /** Minhash signature from staged fingerprints: 16 array_min over cheap
    * integer transforms — signatures never shuffle document text. */
  def minhashSignature(fpCol: Column): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(fpCol, x =>
        (lit(minhashA(j)) * x + lit(minhashB(j))) % minhashP))
    }: _*)

  /** THE memoized signature frame, one build per (session, dataset):
    * `(doc_id, fp — DISTINCT shingle fingerprints, sig — 16-slot minhash
    * signature)`, featureless docs (< 3 words → empty shingle set)
    * already excluded — see [[minhashLsh]] for why exclusion is the
    * correct semantics, not a convenience.
    *
    * Four suite consumers used to rebuild this identical
    * docShingles→fingerprints→signature subtree per query
    * (q_dedup_minhash, q_minhash_calib, q_decontam_fuzzy — both its
    * train and eval legs — and q_dedup_eval's candidate leg; VERDICT
    * r12 #1); now it builds once under the [[graft.Memo.Cache]]
    * contract and every consumer reads pinned blocks. Deliberately
    * COMPACT: doc_id plus integer arrays only — the raw shingle TEXT
    * (corpus-sized) is never pinned, so the memo stores the signature
    * derivative, not a second copy of the corpus; that is the 100 TB
    * storage posture (the text-bearing legs, e.g. [[ngramJaccard]]'s
    * posting lists, re-scan parquet instead of pinning text).
    *
    * `sig` is computed over the DISTINCT fingerprints: array_min is
    * duplicate-insensitive, so the signature equals the raw-fingerprint
    * form and one frame serves both the banding consumers (sig) and the
    * calibration/exact-Jaccard joins (fp sets). */
  def signatures(s: SparkSession, d: String): DataFrame =
    dedupMemo(s, d, "signatures") {
      // The exclusion predicate is `size(w) >= 3`, NOT `size(sh) > 0`,
      // though they are equivalent ([[shinglesFromWords]] maps shorter
      // docs to the empty array and a >= 3-word doc always yields >= 1
      // distinct 3-gram): filtering on the staged shingle column — the
      // r12 banding-fix form — let PushDownPredicate rewrite the
      // condition BELOW the shingle-defining projection in terms of the
      // whole tokenize+3-gram+distinct subtree, evaluating it once in
      // the filter and again in the projection. Measured ~15x on the
      // warm sf0.1 build (0.20 s -> 3.9 s) — the r12 bench's minhash
      // family 3x regression, adjudicated with a quiet best-of-5
      // capture before this fix (VERDICT r12 #1; PERF.md round 13).
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), shinglesFromWords(col("w")).as("sh"))
        .select(col("doc_id"),
          array_distinct(shingleFingerprints(col("sh"))).as("fp"))
        .select(col("doc_id"), col("fp"),
          minhashSignature(col("fp")).as("sig"))
        .pin()
    }

  /** MinHash LSH candidate pairs: docs agreeing on at least one full band
    * of the signature. Output: (doc_a, doc_b, n_bands_shared).
    *
    * Posting-list form, like [[ngramJaccard]] — NOT a bands-on-bands
    * self-join: Spark shares nothing across join legs, so the self-join
    * evaluated the whole md5+signature subtree twice and was the
    * engine's most variance-sensitive query under CPU contention
    * (driver bench r2: 18.2s vs 2.4s local on the same data). Here
    * signatures are computed once; the only shuffles are a groupBy on
    * (band_idx, band_sig) — a short string key — and the final pair
    * count. Bucket sizes are near-duplicate cluster sizes (tiny by
    * construction); at web scale a bucket-size cap before pair
    * generation bounds the k²/2 blowup of degenerate buckets
    * (boilerplate documents), same knob as the stop-shingle cap in
    * [[ngramJaccard]]. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    // featureless docs (< 3 words -> empty shingle set) are EXCLUDED
    // from banding (the exclusion lives in [[signatures]]): their
    // all-NULL signatures would otherwise collapse into one degenerate
    // "" band key on the Spark side (concat_ws skips nulls) while the
    // oracle's `||` renders NULL keys that never join — a silent
    // cross-engine divergence on any corpus with a short doc, and
    // semantically wrong anyway (no features is not evidence of
    // duplication). Mirrored by `WHERE len(s) > 0` in
    // [[minhashPairsBody]]; pinned by DegenerateGuardSpec.
    val sig = signatures(s, d)
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until numBands).map { b =>
        concat_ws("|",
          element_at(col("sig"), b * bandWidth + 1),
          element_at(col("sig"), b * bandWidth + 2))
      }: _*)).as(Seq("band_idx", "band_sig")))
    bands
      .groupBy("band_idx", "band_sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count("*").as("n_bands_shared"))
  }

  /** MINHASH CALIBRATION TABLE: for every LSH candidate pair, the
    * signature-agreement ESTIMATE (matching slots / [[numHashes]] — the
    * unbiased MinHash estimator of Jaccard) against the EXACT Jaccard
    * on fingerprint sets, aggregated per agreement level. This is the
    * tuning artifact behind every banding decision ([[lshPlanning]]
    * gives the theoretical S-curve; this measures what the 16-hash
    * signature actually delivers on THIS corpus): each row says "pairs
    * agreeing on k of 16 slots have true Jaccard in [min, max], micro-
    * average m" — what you consult before moving a production
    * threshold.
    *
    * Determinism: slot agreements and intersection/union sizes are
    * exact integers; micro_jaccard is a ratio of integer SUMS (one
    * double division — never an average of doubles, whose summation
    * order is engine-divergent); min/max pick from identical
    * per-pair doubles.
    *
    * Scale: the signature pipeline runs ONCE over the corpus and is
    * pinned; pairs come from the same posting-list banding as
    * [[minhashLsh]] (no self-join); the fingerprint-set join touches
    * only candidate pairs — O(pairs · shingles/doc), the bounded
    * near-dup candidate volume, never all-pairs. */
  def minhashCalibration(s: SparkSession, d: String): DataFrame = {
    // featureless docs excluded from banding — see [[minhashLsh]];
    // the memoized [[signatures]] frame (already pinned) serves all
    // three consumers here: banding + both pair-join sides
    val base = signatures(s, d)
    val pairs = base.select(col("doc_id"),
      posexplode(array((0 until numBands).map { b =>
        concat_ws("|",
          element_at(col("sig"), b * bandWidth + 1),
          element_at(col("sig"), b * bandWidth + 2))
      }: _*)).as(Seq("band_idx", "band_sig")))
      .groupBy("band_idx", "band_sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    val cal = pairs
      .join(base.select(col("doc_id").as("doc_a"), col("fp").as("fa"),
        col("sig").as("sa")), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("fp").as("fb"),
        col("sig").as("sb")), Seq("doc_b"))
      .select(
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), z -> z))")
          .cast("int").as("est16"),
        size(array_intersect(col("fa"), col("fb"))).cast("long").as("ni"),
        (size(col("fa")) + size(col("fb"))).cast("long").as("nab"))
      // greatest(nu, 1): two empty-shingle docs sharing a degenerate
      // band would make the ratio 0/0 — ANSI errors where DuckDB
      // NULLs; the total form is identical in both engines (trap list)
      .select(col("est16"), col("ni"),
        greatest(col("nab") - col("ni"), lit(1L)).as("nu"))
    cal.groupBy("est16")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("ni")).cast("long").as("sum_inter"),
        sum(col("nu")).cast("long").as("sum_union"),
        round(min(col("ni").cast("double") / col("nu")), 6).as("min_jaccard"),
        round(max(col("ni").cast("double") / col("nu")), 6).as("max_jaccard"))
      .select(col("est16"), col("n_pairs"), col("sum_inter"), col("sum_union"),
        round(col("sum_inter").cast("double") / col("sum_union"), 6)
          .as("micro_jaccard"),
        col("min_jaccard"), col("max_jaccard"))
      .orderBy("est16")
  }

  // lazy: interpolates [[minhashPairsBody]], declared later in the file
  lazy val minhashCalibrationSql: String =
    s"""WITH $minhashPairsBody,
       |fpd AS (SELECT doc_id, list_distinct(fp) AS fp FROM fps),
       |cal AS (
       |  SELECT
       |    len(list_filter(generate_series(1, $numHashes),
       |      i -> sa.sig[i] = sb.sig[i])) AS est16,
       |    len(list_intersect(fa.fp, fb.fp)) AS ni,
       |    greatest(len(fa.fp) + len(fb.fp)
       |      - len(list_intersect(fa.fp, fb.fp)), 1) AS nu
       |  FROM (SELECT DISTINCT doc_a, doc_b FROM pairs) p
       |  JOIN sig sa ON sa.doc_id = p.doc_a
       |  JOIN sig sb ON sb.doc_id = p.doc_b
       |  JOIN fpd fa ON fa.doc_id = p.doc_a
       |  JOIN fpd fb ON fb.doc_id = p.doc_b)
       |SELECT CAST(est16 AS INTEGER) AS est16,
       |  count(*) AS n_pairs,
       |  CAST(sum(ni) AS BIGINT) AS sum_inter,
       |  CAST(sum(nu) AS BIGINT) AS sum_union,
       |  round(CAST(sum(ni) AS DOUBLE) / sum(nu), 6) AS micro_jaccard,
       |  round(min(CAST(ni AS DOUBLE) / nu), 6) AS min_jaccard,
       |  round(max(CAST(ni AS DOUBLE) / nu), 6) AS max_jaccard
       |FROM cal GROUP BY 1 ORDER BY 1""".stripMargin

  /** SimHash width in bits. 16 bits = the 16 leading hex chars of md5. */
  val simhashBits = 16

  /** 16-bit SimHash over word occurrences (multiplicity = tf weighting):
    * bit i is the sign of sum over words of ±1, where the ±1 is hex char
    * i of md5(word) >= '8' (the high bit of that nibble). Pure integer
    * arithmetic — portable and exact. */
  def simhash(wordsCol: Column): Column =
    (0 until simhashBits).map { i =>
      val bitSum = aggregate(wordsCol, lit(0),
        (acc, w) => acc + when(substring(md5(w), i + 1, 1) >= "8", 1).otherwise(-1))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SimHash near-dup pairs at hamming distance <= 1, found by the
    * multi-index trick: split the 16-bit hash into two 8-bit halves; any
    * pair at distance <= 1 agrees exactly on at least one half
    * (pigeonhole), so blocking on each half finds ALL such pairs with no
    * cross product — the scale-correct rendering of "group by simhash".
    * Output: per-doc simhash plus its near-dup partner count. */
  def simhashDedup(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), simhash(col("w")).as("sh16"))
    val halves = base.select(col("doc_id"), col("sh16"),
      posexplode(array((col("sh16") % 256).cast("long"),
        (col("sh16") / 256).cast("long")))
        .as(Seq("half_idx", "half_val")))
    // posting-list pairing, not a halves-on-halves self-join: the join
    // legs would each recompute the 16-lambda simhash subtree (Spark
    // shares nothing across subtrees) — see minhashLsh
    val pairs = halves
      .groupBy("half_idx", "half_val")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh16")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
          |           x.sh16 AS sh_a, y.sh16 AS sh_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.sh_a").as("sh_a"), col("p.sh_b").as("sh_b"))
      .distinct()
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 1)
    base.join(
        pairs.select(col("doc_a").as("doc_id"))
          .unionAll(pairs.select(col("doc_b").as("doc_id")))
          .groupBy("doc_id").agg(count("*").as("n_near_dups")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("sh16").as("simhash"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
  }

  /** Transitive near-dup clusters: connected components over the
    * [[minhashLsh]] candidate pairs. Pairwise dedup is not enough for
    * corpus curation — if A~B and B~C, all three are one duplicate
    * group and exactly one representative survives; pairs alone would
    * keep two. Output: every doc appearing in a pair, its cluster id
    * (= min doc_id in the component — the kept representative), and the
    * component size.
    *
    * Algorithm: min-label propagation. labels start at
    * min(self, neighbors); each iteration replaces a label with the min
    * over neighbors' labels; fixpoint = components. Converges in
    * O(component diameter) rounds — near-dup clusters are shallow by
    * construction (diameter a handful), so 3-4 rounds at any corpus
    * size; each round is one shuffle join on short (id, label) pairs.
    * This is GraphX-free by design: the DataFrame rendering keeps AQE,
    * codegen, and the same shuffle machinery as everything else; at
    * web scale the standard large-star/small-star variant bounds the
    * high-degree-node fan-in the same way. Edges are localCheckpoint'd
    * once so the minhash signature pipeline runs exactly once, and each
    * iteration's labels are checkpointed to keep the plan flat
    * (iterative lineage otherwise grows exponentially). */
  /** Memo cache for suite-shared dedup frames ([[graft.Memo.Cache]]
    * contract: slot reserved under the module lock, pinned build runs
    * outside it, Bench attributes build time to the absorbing query). */
  private val dedupMemo = new graft.Memo.Cache("dedup")

  def dedupClusters(s: SparkSession, d: String): DataFrame =
    // memoized per (session, dataset): q_dedup_clusters AND
    // q_canonical_docs both consume the full propagation — previously
    // each ran its own signature pipeline + label fixpoint (~3 s of
    // q_canonical_docs' in-suite bill at sf0.1 was this duplicate)
    dedupMemo(s, d, "clusters") { dedupClustersBuild(s, d) }

  private def dedupClustersBuild(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashLsh(s, d).select(col("doc_a"), col("doc_b")).pin()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = edges.groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("doc_id"), least(col("doc_id"), col("nbr")).as("label"))
      .pin()
    var converged = false
    var iter = 0
    while (!converged && iter < 16) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("label").as("dst_label")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("dst_label")).as("nbr_label"))
      // the `changed` flag rides along in the same pass, so convergence
      // detection is a cheap scan of the checkpointed result — not a
      // second join of old vs new labels (halves the jobs per round)
      val next = labels.join(nbrMin, Seq("doc_id"))
        .select(col("doc_id"),
          least(col("label"), col("nbr_label")).as("label"),
          (col("nbr_label") < col("label")).as("changed"))
        .pin()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("doc_id"), col("label"))
      iter += 1
    }
    // fail loudly rather than return silently-split components: a graph
    // with diameter > the round cap would otherwise yield wrong cluster
    // ids that no downstream check can detect (ADVICE r3)
    require(converged,
      s"dedup cluster label propagation did not converge in $iter rounds — " +
        "component diameter exceeds the cap; raise the iteration limit or " +
        "switch to large-star/small-star rewrites for deep graphs")
    val sizes = labels.groupBy(col("label")).agg(count("*").as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
      .pin() // memo contract: consumers read materialized blocks
  }

  /** Fuzzy (edit-distance) duplicate detection over the DISTINCT name
    * domain: pairs of part names within levenshtein distance 3, each
    * carrying its row count. Comparing the distinct value dictionary
    * (64 names) instead of the fact table (20k rows at sf0.1) is the
    * scale-correct shape — entity resolution cost is O(|domain|²), not
    * O(|rows|²), and the dictionary aggregate is a map-side-combinable
    * groupBy. At larger domains the all-pairs stage gets a blocking
    * key (first token / phonetic code) exactly like [[ngramJaccard]]'s
    * posting lists. */
  def fuzzyNames(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d).groupBy(col("p_name")).agg(count("*").as("n_parts"))
    val a = names.select(col("p_name").as("name_a"), col("n_parts").as("n_a"))
    val b = names.select(col("p_name").as("name_b"), col("n_parts").as("n_b"))
    a.join(b, col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }

  /** BLOCKED JARO–WINKLER record linkage over the same distinct-name
    * dictionary as [[fuzzyNames]] — the classic two-stage entity
    * resolution shape: a cheap BLOCKING key (first token) prunes the
    * candidate space (~10× here: 224 pairs vs C(64,2) = 2016
    * all-pairs), then the native codegen'd
    * [[graft.functions.JaroWinklerSim]] expression scores only the
    * survivors. Complements [[fuzzyNames]]' levenshtein cutoff: edit
    * distance counts operations, Jaro–Winkler rewards shared prefixes
    * and tolerates transpositions — the actual geometry of name/title
    * variants.
    *
    * Determinism: the expression's constants are pinned to DuckDB's
    * builtin (integer transposition halving, 0.7 boost threshold,
    * empty→0.0 — probed and spec-tested, `JaroWinklerSpec`); outputs
    * round to 6 dp so a last-ulp divergence in the 3-term jaro average
    * can't flip a cell.
    *
    * Scale: the dictionary groupBy is map-side combinable; pair cost is
    * O(Σ block²) not O(|domain|²), and the block key shuffles only the
    * O(|domain|) dictionary — at 100 TB the block key graduates to
    * (first token, length bucket) exactly like [[ngramJaccard]]'s
    * posting lists. */
  def jaroWinklerPairs(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name")).agg(count("*").as("n_parts"))
      .withColumn("blk", split(col("p_name"), " ").getItem(0))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_b"))
    a.join(b, Seq("blk")).filter(col("name_a") < col("name_b"))
      .withColumn("jw",
        graft.functions.GraftFunctions.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= 0.8)
      .select(col("name_a"), col("name_b"), round(col("jw"), 6).as("jw_sim"),
        col("n_a"), col("n_b"))
  }

  val jaroWinklerPairsSql: String =
    """WITH names AS (
      |  SELECT p_name, count(*) AS n_parts FROM part GROUP BY 1),
      |blk AS (
      |  SELECT split_part(p_name, ' ', 1) AS b, p_name, n_parts FROM names)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim,
      |  a.n_parts AS n_a, b.n_parts AS n_b
      |FROM blk a JOIN blk b ON a.b = b.b AND a.p_name < b.p_name
      |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8""".stripMargin

  /** Embedding-cosine near-duplicate pairs: vectors within cosine >= 0.4
    * (threshold chosen from the corpus: max pairwise cosine ~0.51, so the
    * output is the discriminative near-dup tail, not noise).
    *
    * This is the exact all-pairs form — O(n²) pairs, but the per-pair
    * work is hoisted down to ONE fused dot-product loop
    * ([[graft.functions.DotProduct]]): each side precomputes its L2 norm
    * once per ROW, and `dot / (norm_a * norm_b)` is bit-identical to
    * [[graft.functions.CosineSimilarity]] (same accumulation order, same
    * `sqrt(nx) * sqrt(ny)` denominator grouping, same null-on-zero-norm
    * contract) at a third of the pair-loop flops. The bit-identity
    * REQUIRES equal-length vectors: CosineSimilarity accumulates all
    * three sums over min(len_a, len_b) while L2Norm covers each full
    * vector, so ragged pairs diverge — fine here because the embeddings
    * table is fixed-dim by construction (what makes VectorOpsSpec's
    * bit-equality hold); assert dimensionality first before reusing the
    * identity on untrusted input. At 100 TB this
    * operator runs with an LSH blocking stage first
    * ([[graft.similarity.Similarity.lshTopK]] shape: bucket-join then
    * verify); the all-pairs form stays the per-bucket verifier, and the
    * norms column rides the O(n) row side, never the O(n²) pair space.
    * Oracle rounds to 4 decimals (engine-portable, see Similarity
    * scaladoc). */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.{dotProduct, l2Norm}
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      l2Norm(col("embedding")).as("norm_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      l2Norm(col("embedding")).as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dotProduct(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")), 4)
          .as("cosine"))
      .filter(col("cosine") >= 0.4)
  }

  /** Corpus-wide recall floor for the blocked near-dup path vs the
    * exact all-pairs verifier (measured ~0.75-0.85 on this corpus:
    * pairs at cosine 0.4-0.51 agree with a 4-plane hyperplane ~63-67%
    * per plane → per-table collision p⁴ ≈ 0.16-0.20, lifted by 8 OR'd
    * tables). */
  val blockedMinRecall = 0.5

  /** Cosine threshold for the near-dup audit pair (shared by the exact
    * verifier and the blocked production path). */
  val nearDupEps = 0.4

  /** The PRODUCTION rendering of [[embeddingNearDup]], graded through
    * its contract (the q_knn_lsh discipline). VERDICT r14 #3 reshape:
    * the r14 graded form JOINED THE FULL O(n²) exact verifier to
    * measure corpus recall, so the graded query itself was quadratic
    * (scale-sweep slope 1.98, flagged). Now the query runs ONLY the
    * production path — [[graft.similarity.Similarity.blockedScoredPairs]],
    * the adaptive-granularity LSH generator whose verified-candidate
    * volume is linear×log(n) — and the exact verification is anchored
    * to the DETERMINISTIC CONSTANT-SIZE sample (vec_id <
    * [[graft.similarity.Similarity.blockedSampleCap]]): true pairs
    * within the sample cost O(cap²) at any corpus scale, and the
    * oracle computes the identical number. Corpus-wide recall (the
    * full-verifier figure) is pinned in DedupBlockedRecallSpec at
    * sf0.001/0.01, where O(n²) is a spec-budget cost, not a graded-
    * query cost.
    *
    * Contract row: the sample's exact pair count (oracle-exact),
    * whether the production path finds ≥ [[blockedMinRecall]] of those
    * sample pairs (deterministic — md5-derived hyperplanes), and
    * whether each found pair's blocked score equals the independently-
    * computed exact score (subset-correctness of the scoring plumbing).
    * Booleans are NULL when the sample has no true pairs — nothing to
    * grade (the sketch-floor discipline). */
  def embeddingNearDupBlocked(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.{dotProduct, l2Norm}
    val e = Tables.embeddings(s, d)
    val cap = graft.similarity.Similarity.blockedSampleCap
    val sample = e.filter(col("vec_id") < cap)
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
    val sa = sample.select(col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val sb = sample.select(col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val sampleTrue = sa.join(sb, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dotProduct(col("ea"), col("eb")) / (col("na") * col("nb")), 4)
          .as("cosine"))
      .filter(col("cosine") >= nearDupEps)
    // the production run: full-corpus blocked pairs; the sample
    // restriction pushes down into the pinned frame's scan
    val blockedSam = graft.similarity.Similarity.blockedScoredPairs(s, d)
      .filter(col("cosine") >= nearDupEps)
      .filter(col("vec_a") < cap && col("vec_b") < cap)
    sampleTrue.as("e")
      .join(blockedSam.as("b"), Seq("vec_a", "vec_b"), "left")
      .agg(count(lit(1)).as("n_true_pairs_sample"),
        sum(when(col("b.cosine").isNotNull, 1L).otherwise(0L)).as("found"),
        min(when(col("b.cosine").isNotNull, col("b.cosine") === col("e.cosine")))
          .as("sm"))
      .select(col("n_true_pairs_sample"),
        when(col("n_true_pairs_sample") > 0,
          col("found").cast("double") >=
            lit(blockedMinRecall) * col("n_true_pairs_sample").cast("double"))
          .as("recall_ok"),
        when(col("n_true_pairs_sample") > 0, coalesce(col("sm"), lit(true)))
          .as("scores_match"))
  }

  val embeddingNearDupBlockedSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_true_pairs_sample,
      |  CASE WHEN count(*) > 0 THEN TRUE END AS recall_ok,
      |  CASE WHEN count(*) > 0 THEN TRUE END AS scores_match
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE a.vec_id < ${graft.similarity.Similarity.blockedSampleCap}
      |  AND b.vec_id < ${graft.similarity.Similarity.blockedSampleCap}
      |  AND round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4)
      |  >= $nearDupEps""".stripMargin

  /** Span length (tokens) for cross-document substring dedup. */
  val spanLen = 8

  /** Cross-document duplicated-SPAN audit — the substring-level dedup of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), which removes repeated ~50-token spans the document-level
    * passes above cannot see (boilerplate headers, license blocks,
    * templated paragraphs shared across otherwise-distinct pages). Here
    * the unit is the [[spanLen]]-token sliding window: a span is
    * "duplicated" when the same window occurs in ≥ 2 documents; per doc
    * we report how much of its distinct-span surface is shared.
    *
    * Scale shape: spans are hashed to md5 keys IN the per-row projection,
    * so the one shuffle of the query (the span-partition window count)
    * carries 32-byte keys, never the 8-word text — volume is
    * O(tokens × 32 B) regardless of span length, the same short-key
    * discipline as the MinHash band shuffle. Document frequency comes
    * from a window over the SAME exploded relation (no join back through
    * a second tokenize subtree — the lambda-CSE trap), and the per-doc
    * rollup is a map-side-combinable aggregate. At 100 TB the one extra
    * knob is a df cap on stop-spans (drop spans with df > K before the
    * rollup), exactly the [[ngramJaccard]] posting-cap note.
    *
    * Flag threshold compares the ROUNDED fraction so the boolean is
    * engine-portable. Docs shorter than [[spanLen]] tokens have no spans
    * and drop out (mirrored in the oracle's WHERE). */
  def spanDedup(s: SparkSession, d: String): DataFrame = {
    val w = col("w")
    val spans = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .filter(size(w) >= spanLen)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(w) - (spanLen - 1)),
          i => md5(concat_ws(" ",
            (0 until spanLen).map(o => element_at(w, i + lit(o))): _*))))
          .as("spans"))
      .select(col("doc_id"), explode(col("spans")).as("span_key"))
    spans
      .withColumn("df", count(lit(1)).over(Window.partitionBy("span_key")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_spans"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_spans"), 4).as("shared_frac"))
      .withColumn("is_span_dup", col("shared_frac") >= 0.2)
  }

  val spanDedupSql: String =
    """WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |spans AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 7),
      |    i -> md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
      |             w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7])))) AS span_key
      |  FROM words WHERE len(w) >= 8),
      |df AS (
      |  SELECT doc_id, count(*) OVER (PARTITION BY span_key) AS df FROM spans),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_spans,
      |    CAST(count(*) FILTER (df >= 2) AS BIGINT) AS n_shared
      |  FROM df GROUP BY doc_id)
      |SELECT doc_id, n_spans, n_shared,
      |  round(CAST(n_shared AS DOUBLE) / n_spans, 4) AS shared_frac,
      |  round(CAST(n_shared AS DOUBLE) / n_spans, 4) >= 0.2 AS is_span_dup
      |FROM agg""".stripMargin

  /** Non-overlapping block width (tokens) for [[blockDedup]]. */
  val blockLen = 10

  /** BLOCK-LEVEL survivorship dedup — the exact-substring-dedup
    * approximation at fixed granularity: each document is cut into
    * consecutive non-overlapping [[blockLen]]-token blocks, and a block
    * OCCURRENCE survives iff it is the corpus-wide FIRST occurrence of
    * its content (smallest (doc_id, block_no) among equal-content
    * blocks). Unlike [[spanDedup]] (an overlapping-window SHARING census
    * that scores documents), this op produces the retention PLAN: which
    * token ranges of which documents a dedup pass would actually keep —
    * deterministic, idempotent, and append-stable in the same sense as
    * [[graft.text.Curation.packShards]] (a new document never steals
    * first-occurrence from an old one, since new doc_ids sort after).
    *
    * Scale: block construction is a pure per-row array expression (no
    * explode of raw tokens — `transform` over a `sequence` slices the
    * token array locally); the survivorship census groups by block HASH
    * (md5 — shuffle keys are 32 bytes regardless of document length) at
    * O(block occurrences / blockLen) volume; first-occurrence is one
    * min(struct) aggregate, map-side combinable. Per-doc rollup keys by
    * doc_id — cardinality grows with data. */
  def blockDedup(s: SparkSession, d: String): DataFrame = {
    val w = col("w")
    val blocks = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"(size(w) - 1) div $blockLen")),
          b => struct(
            md5(concat_ws(" ",
              slice(w, b * blockLen + 1, lit(blockLen)))).as("h"),
            least(size(w) - b * blockLen, lit(blockLen)).as("n_tok"))))
          .as(Seq("block_no", "blk")))
      .select(col("doc_id"), col("block_no"),
        col("blk.h").as("h"), col("blk.n_tok").as("n_tok"))
    // first-occurrence key: (doc_id, block_no) packed into one long —
    // a single min() is map-side combinable and avoids any cross-engine
    // struct-ordering subtlety. Shift is 2^32: block_no < 2^32 admits
    // ~43-billion-token documents at blockLen 10 (the previous 2^20
    // shift silently corrupted ordering past ~10.5M tokens, and both
    // engines shared the bug so the oracle could not see it); doc_id
    // must stay < 2^31 for the product to fit a signed 64-bit — guarded
    // loudly here (raise_error), which covers the oracle too since both
    // engines pack identically
    val occ = when(col("doc_id") >= 2147483648L,
        raise_error(concat(lit("blockDedup: doc_id >= 2^31 breaks (doc_id, block_no) packing: "),
          col("doc_id").cast("string"))).cast("long"))
      .otherwise(col("doc_id") * 4294967296L + col("block_no")).as("occ")
    val firstOwner = blocks.select(col("h"), occ)
      .groupBy("h").agg(min(col("occ")).as("f_occ"))
    blocks.select(col("doc_id"), col("h"), col("n_tok"), occ)
      .join(firstOwner, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("occ") === col("f_occ"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("occ") === col("f_occ"), col("n_tok"))
          .otherwise(0L)).cast("long").as("tokens_kept"),
        sum(col("n_tok")).cast("long").as("tokens_total"))
  }

  val blockDedupSql: String =
    s"""WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |blocks AS (
       |  SELECT doc_id, b AS block_no,
       |    md5(array_to_string(w[b * $blockLen + 1 : b * $blockLen + $blockLen], ' ')) AS h,
       |    least(len(w) - b * $blockLen, $blockLen) AS n_tok
       |  FROM words, UNNEST(range(0, CAST(floor((len(w) - 1) / $blockLen) AS BIGINT) + 1)) AS u(b)),
       |first_owner AS (
       |  SELECT h, min(doc_id * 4294967296 + block_no) AS f_occ
       |  FROM blocks GROUP BY h)
       |SELECT b.doc_id,
       |  count(*) AS n_blocks,
       |  CAST(sum(CASE WHEN b.doc_id * 4294967296 + b.block_no = f.f_occ
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN b.doc_id * 4294967296 + b.block_no = f.f_occ
       |    THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
       |  CAST(sum(n_tok) AS BIGINT) AS tokens_total
       |FROM blocks b JOIN first_owner f USING (h)
       |GROUP BY b.doc_id""".stripMargin

  /** (bands, rows-per-band) configurations for [[lshPlanningTable]] —
    * all factorizations of the [[numHashes]] budget. */
  val lshConfigs: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4), (2, 8))

  /** LSH BAND-PLANNING TABLE — the tuning sheet behind [[minhashLsh]]'s
    * (bands, rows) choice: for every factorization of the hash budget
    * and a Jaccard grid, the candidate-detection probability
    * 1 − (1 − J^r)^b. This is how the b/r knob is actually chosen
    * (find the S-curve whose threshold sits at the dedup cutoff), and
    * shipping it as a query makes the tuning reproducible instead of a
    * notebook artifact. Pure generated compute — a literal config
    * frame × an integer J grid, every probability one pinned pow
    * formula rounded 6; no table scan at all. */
  def lshPlanningTable(s: SparkSession, d: String): DataFrame = {
    val configs = lshConfigs.map { case (b, r) => s"struct($b AS b, $r AS r)" }
      .mkString("array(", ", ", ")")
    s.range(1, 10).toDF("j10")
      .select((col("j10").cast("double") / 10.0).as("jaccard"),
        explode(expr(configs)).as("cfg"))
      .select(col("cfg.b").as("bands"), col("cfg.r").as("rows_per_band"),
        col("jaccard"),
        round(lit(1.0) - pow(lit(1.0) -
          pow(col("jaccard"), col("cfg.r").cast("double")),
          col("cfg.b").cast("double")), 6).as("p_detect"))
      .orderBy("bands", "jaccard")
  }

  val lshPlanningTableSql: String = {
    val cfgRows = lshConfigs.map { case (b, r) => s"($b, $r)" }.mkString(", ")
    s"""WITH cfg(b, r) AS (VALUES $cfgRows),
       |grid AS (SELECT unnest(generate_series(1, 9)) AS j10)
       |SELECT CAST(b AS INTEGER) AS bands, CAST(r AS INTEGER) AS rows_per_band,
       |  CAST(j10 AS DOUBLE) / 10.0 AS jaccard,
       |  round(1.0 - pow(1.0 - pow(CAST(j10 AS DOUBLE) / 10.0,
       |    CAST(r AS DOUBLE)), CAST(b AS DOUBLE)), 6) AS p_detect
       |FROM cfg CROSS JOIN grid ORDER BY bands, jaccard""".stripMargin
  }

  /** Document frequency at which a shingle counts as boilerplate. */
  val dfBoiler = 4L

  /** BOILERPLATE RATIO — the C4-recipe signal at shingle grain: per
    * document, what fraction of its distinct 3-gram shingles occur in
    * ≥ [[dfBoiler]] documents corpus-wide? High-ratio docs are
    * navigation chrome, license banners, templated listings — content
    * the dedup passes above keep exactly once but quality filtering
    * wants DOWN-WEIGHTED even in its first occurrence (the
    * boilerplate-removal step of C4/RefinedWeb-style pipelines, reduced
    * to a measurable per-doc score).
    *
    * Scale: one shingle explode (O(tokens)), one map-side-combinable
    * df aggregate keyed by gram (cardinality grows with the corpus — no
    * funnel), one hash join back on the gram key, one per-doc rollup.
    * Counts are exact longs; the ratio is one pinned double division
    * rounded 6. Contract: docs with < 3 words have no shingles and no
    * output row (the [[graft.text.Winnowing]] short-doc contract). */
  def boilerplateRatio(s: SparkSession, d: String): DataFrame = {
    val ex = docShingles(s, d)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val df = ex.groupBy("g").agg(count(lit(1)).as("df"))
    ex.join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= dfBoiler, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_shingles").cast("double"), 6)
          .as("boiler_ratio"))
      .orderBy("doc_id")
  }

  val boilerplateRatioSql: String =
    s"""WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
       |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM words),
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |df AS (SELECT g, count(*) AS df FROM ex GROUP BY g)
       |SELECT e.doc_id,
       |  count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN df.df >= $dfBoiler THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_boiler,
       |  round(CAST(sum(CASE WHEN df.df >= $dfBoiler THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
       |FROM ex e JOIN df USING (g)
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  // ---- DuckDB oracle SQL ----------------------------------------------

  /** Shared shingle CTE (DuckDB): distinct word 3-grams per doc. */
  private val shingleCte =
    """WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
      |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM words)""".stripMargin

  val exactDedupSql: String =
    """SELECT md5(array_to_string((string_split(text,' '))[1:8], ' ')) AS prefix_key,
      |  min(doc_id) AS kept_doc_id, count(*) AS n_members
      |FROM documents GROUP BY 1""".stripMargin

  val ngramJaccardSql: String =
    s"""$shingleCte,
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.2""".stripMargin

  val containmentSql: String =
    s"""$shingleCte,
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / sa.n AS contain_a_in_b,
       |  CAST(n_inter AS DOUBLE) / sb.n AS contain_b_in_a
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE greatest(CAST(n_inter AS DOUBLE) / sa.n,
       |               CAST(n_inter AS DOUBLE) / sb.n) >= $containmentThreshold""".stripMargin

  val embeddingNearDupSql: String =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) >= 0.4""".stripMargin

  /** CTE body (no leading WITH) computing minhash LSH candidate `pairs` —
    * shared between [[minhashLshSql]] and the recursive-CTE clusters
    * oracle (WITH RECURSIVE must own the single WITH keyword). */
  private[graft] val minhashPairsBody: String = {
    val sigExprs = (0 until numHashes).map { j =>
      s"list_min(list_transform(fp, x -> (${minhashA(j)} * x + ${minhashB(j)}) % $minhashP))"
    }
    val bandExprs = (0 until numBands).map { b =>
      s"(sig[${b * bandWidth + 1}] || '|' || sig[${b * bandWidth + 2}])"
    }
    s"""words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
       |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM words),
       |fps AS (SELECT doc_id, list_transform(s,
       |  g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % $minhashP) AS fp
       |  FROM sh WHERE len(s) > 0),
       |sig AS (SELECT doc_id, [${sigExprs.mkString(",\n  ")}] AS sig FROM fps),
       |bands AS (SELECT doc_id, i - 1 AS band_idx, [${bandExprs.mkString(",\n  ")}][i] AS band_sig
       |  FROM sig, generate_series(1, $numBands) AS t(i)),
       |pairs AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_bands_shared
       |  FROM bands x JOIN bands y
       |    ON x.band_idx = y.band_idx AND x.band_sig = y.band_sig
       |   AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  val minhashLshSql: String =
    s"""WITH $minhashPairsBody
       |SELECT doc_a, doc_b, n_bands_shared FROM pairs""".stripMargin

  /** Connected components as a recursive CTE: `reach(doc, r)` holds every
    * node r reachable from doc; the component id is min(r). Equivalent to
    * the Spark min-label-propagation fixpoint by construction. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $minhashPairsBody,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(doc_id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, re.r FROM edges e JOIN reach re ON re.doc_id = e.dst),
       |labels AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, s.cluster_size
       |FROM labels l JOIN (
       |  SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY 1) s
       |USING (cluster_id)""".stripMargin

  val fuzzyNamesSql: String =
    """WITH names AS (SELECT p_name, count(*) AS n_parts FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  levenshtein(a.p_name, b.p_name) AS dist,
      |  a.n_parts AS n_a, b.n_parts AS n_b
      |FROM names a JOIN names b ON a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin

  val simhashDedupSql: String = {
    val bitExprs = (0 until simhashBits).map { i =>
      s"""CASE WHEN list_sum(list_transform(w,
         |  x -> CASE WHEN substr(md5(x), ${i + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0
         |  THEN CAST(${1L << i} AS BIGINT) ELSE 0 END""".stripMargin
    }
    s"""WITH words AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |base AS (SELECT doc_id, (${bitExprs.mkString("\n + ")}) AS sh16 FROM words),
       |halves AS (
       |  SELECT doc_id, sh16, i - 1 AS half_idx,
       |    [sh16 % 256, sh16 // 256][i] AS half_val
       |  FROM base, generate_series(1, 2) AS t(i)),
       |pairs AS (
       |  SELECT DISTINCT p.doc_id AS doc_a, q.doc_id AS doc_b,
       |    p.sh16 AS sh_a, q.sh16 AS sh_b
       |  FROM halves p JOIN halves q
       |    ON p.half_idx = q.half_idx AND p.half_val = q.half_val
       |   AND p.doc_id < q.doc_id),
       |near AS (
       |  SELECT * FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 1),
       |cnt AS (
       |  SELECT doc_id, count(*) AS n_near_dups FROM (
       |    SELECT doc_a AS doc_id FROM near
       |    UNION ALL SELECT doc_b AS doc_id FROM near) GROUP BY 1)
       |SELECT b.doc_id, b.sh16 AS simhash,
       |  coalesce(c.n_near_dups, 0) AS n_near_dups
       |FROM base b LEFT JOIN cnt c ON b.doc_id = c.doc_id""".stripMargin
  }

  /** SEMDEDUP (Abbas et al. 2023): semantic deduplication blocked by
    * CLUSTER — pairwise cosine runs only WITHIN a cluster, and each
    * near-dup group keeps its smallest id. Here the `label` column is
    * the cluster assignment (the paper's k-means step — any clustering
    * plugs in, see [[graft.similarity.Similarity.kmeansCheck]]); τ=0.3
    * picks the discriminative tail on this corpus (max pairwise cosine
    * ~0.51). Reports per-cluster members / candidate pairs / drops and
    * the keep rate — the curation dashboard for "how much does semantic
    * dedup shrink my corpus".
    *
    * Determinism: cosine is the [[embeddingNearDup]] hoisted-norm form,
    * bit-identical to the native expression, rounded to 4 before the τ
    * compare (engine-portable); drop rule "v is dropped iff some u < v
    * in its cluster has cos(u,v) ≥ τ" needs no tie-breaking at all.
    *
    * Scale: the pair space is per-cluster (Σ_c n_c² — the SemDeDup
    * design point: clusters bound the quadratic), reached by an
    * EQUI-join on the cluster key, so it shuffle-partitions across the
    * cluster domain; norms ride the O(n) row side.
    *
    * Grading stability (ADVICE r7): the Spark side rounds
    * dot/(na·nb) where DuckDB rounds list_cosine_similarity — two
    * float pipelines that can differ by an ulp. Only the ≥ 0.3
    * CLASSIFICATION reaches the output (counts, never the cosine), so
    * the only dangerous inputs are raw cosines within an ulp of the
    * round-up edge 0.29995. Measured margin on this corpus:
    * min |cos − 0.29995| = 1.4e-4 at sf0.01 and 3.0e-5 at sf0.1 —
    * ten orders of magnitude above ulp-level engine divergence; same
    * accepted bounded-risk class as embeddingNearDup, recorded in the
    * verify-skill trap list. */
  def semDedup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.{dotProduct, l2Norm}
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("label"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("label"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("label")).filter(col("va") < col("vb"))
      .select(col("label"), col("va"), col("vb"),
        round(dotProduct(col("ea"), col("eb")) / (col("na") * col("nb")), 4)
          .as("cosine"))
      .filter(col("cosine") >= 0.3)
    val perCluster = pairs.groupBy("label")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("vb")).as("n_dropped"))
    e.groupBy("label").agg(count(lit(1)).as("n_members"))
      .join(perCluster, Seq("label"), "left")
      .select(col("label"), col("n_members"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        round((col("n_members") - coalesce(col("n_dropped"), lit(0L)))
          .cast("double") / col("n_members"), 6).as("keep_rate"))
      .orderBy("label")
  }

  val semDedupSql: String =
    """WITH pairs AS (
      |  SELECT a.label, a.vec_id AS va, b.vec_id AS vb
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE round(CAST(list_cosine_similarity(a.embedding, b.embedding)
      |    AS DOUBLE), 4) >= 0.3),
      |pc AS (
      |  SELECT label, count(*) AS n_pairs,
      |    count(DISTINCT vb) AS n_dropped
      |  FROM pairs GROUP BY 1),
      |m AS (SELECT label, count(*) AS n_members FROM embeddings GROUP BY 1)
      |SELECT m.label, CAST(m.n_members AS BIGINT) AS n_members,
      |  CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
      |  CAST(coalesce(pc.n_dropped, 0) AS BIGINT) AS n_dropped,
      |  round(CAST(m.n_members - coalesce(pc.n_dropped, 0) AS DOUBLE)
      |    / m.n_members, 6) AS keep_rate
      |FROM m LEFT JOIN pc USING (label) ORDER BY m.label""".stripMargin

  /** Truth threshold for [[dedupEval]]: a pair is a REAL near-dup iff
    * its exact shingle Jaccard reaches this. */
  val dedupEvalJaccard = 0.5

  /** DEDUP PIPELINE EVALUATION — precision/recall of the [[minhashLsh]]
    * banding against exact-Jaccard ground truth, the END-TO-END grade
    * of the near-dup index ([[minhashCalibration]] characterizes the
    * estimator per agreement level; this answers the production
    * question: "of the pairs the index surfaces, how many are real,
    * and how many real pairs does it miss at J ≥
    * [[dedupEvalJaccard]]?"). The theoretical banding recall at the
    * threshold, 1−(1−J^b)^r, ships alongside so measured-vs-theory is
    * one row.
    *
    * Ground truth is COMPLETE without all-pairs: a pair with J ≥ 0.5
    * shares shingles, so the [[ngramJaccard]] posting-list enumeration
    * (pairs sharing ≥ 1 shingle) provably contains every true pair —
    * the inverted index IS the exhaustive oracle at any corpus size.
    * Precision/recall are one division of exact longs each; F1 uses
    * the harmonic identity 2·hit/(cand + true) — one more exact
    * division, no 0/0 (denominators guarded total).
    *
    * Scale: both legs are the existing posting-list pipelines (no
    * self-join, df-capped); the comparison join touches only candidate
    * pairs. */
  def dedupEval(s: SparkSession, d: String): DataFrame = {
    val truth = ngramJaccard(s, d)
      .filter(col("jaccard") >= dedupEvalJaccard)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_true"))
    val cand = minhashLsh(s, d)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_cand"))
    val theory = 1.0 - math.pow(
      1.0 - math.pow(dedupEvalJaccard, bandWidth), numBands)
    truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        // outer coalesce: on a corpus with NO pairs at all the join is
        // empty and sum-over-empty is NULL on the Spark side while the
        // oracle's count(*) subqueries read 0 — the same empty-frame
        // edge the CEM guard had (DegenerateGuardSpec)
        coalesce(sum(coalesce(col("is_cand"), lit(0L))), lit(0L))
          .cast("long").as("n_candidates"),
        coalesce(sum(coalesce(col("is_true"), lit(0L))), lit(0L))
          .cast("long").as("n_true"),
        coalesce(sum(when(col("is_cand").isNotNull && col("is_true").isNotNull,
          1L).otherwise(0L)), lit(0L)).cast("long").as("n_hit"))
      .select(col("n_candidates"), col("n_true"), col("n_hit"),
        round(col("n_hit").cast("double") /
          greatest(col("n_candidates"), lit(1L)).cast("double"), 6)
          .as("precision"),
        round(col("n_hit").cast("double") /
          greatest(col("n_true"), lit(1L)).cast("double"), 6).as("recall"),
        round(lit(2.0) * col("n_hit").cast("double") /
          greatest(col("n_candidates") + col("n_true"), lit(1L))
            .cast("double"), 6).as("f1"),
        round(lit(theory), 6).as("theory_recall_at_t"))
  }

  lazy val dedupEvalSql: String = {
    val theory = 1.0 - math.pow(
      1.0 - math.pow(dedupEvalJaccard, bandWidth), numBands)
    s"""WITH $minhashPairsBody,
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
       |    >= $dedupEvalJaccard),
       |cand AS (SELECT doc_a, doc_b FROM pairs),
       |j AS (
       |  SELECT
       |    CAST(count(c.doc_a) AS BIGINT) AS n_candidates_hitside,
       |    CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       |    CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       |    CAST(coalesce(sum(CASE WHEN t.doc_a IS NOT NULL
       |      AND c.doc_a IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
       |      AS n_hit
       |  FROM truth t FULL OUTER JOIN cand c
       |    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
       |SELECT n_candidates, n_true, n_hit,
       |  round(CAST(n_hit AS DOUBLE)
       |    / CAST(greatest(n_candidates, 1) AS DOUBLE), 6) AS precision,
       |  round(CAST(n_hit AS DOUBLE)
       |    / CAST(greatest(n_true, 1) AS DOUBLE), 6) AS recall,
       |  round(2.0 * CAST(n_hit AS DOUBLE)
       |    / CAST(greatest(n_candidates + n_true, 1) AS DOUBLE), 6) AS f1,
       |  round(CAST($theory AS DOUBLE), 6) AS theory_recall_at_t
       |FROM j""".stripMargin
  }
}
