package graft.ops

import graft.io.Io
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY.md §2-H (dedup rows) — the deduplication family of a training
  * data pipeline: exact (content hash), MinHash-LSH (token-set Jaccard),
  * SimHash (hamming blocking), n-gram Jaccard.
  *
  * Scale design, per op:
  *  - exact: one shuffle on sha256(normalized text); at 100 TB this is
  *    the standard hash-groupBy dedup.
  *  - MinHash-LSH: the Spark side never materializes O(n²) pairs — the
  *    shuffle key is (band, band_hash); only bucket-mates become
  *    candidate pairs, then the exact-Jaccard verify filters. The DuckDB
  *    oracle computes ALL pairs ≥ τ brute force, so parity proves the
  *    LSH recall is exhaustive on the graded data (64 hashes, 16 bands ×
  *    rows=4 → P[miss | j ≥ 0.9] = (1 − 0.9⁴)^16 ≈ 3.6e-8).
  *  - SimHash: 32-bit signature from a cross-engine polynomial token
  *    hash; pairs found via 4×8-bit band blocking, which is EXACT for
  *    hamming ≤ 3 by pigeonhole — no probabilistic recall at all.
  */
object DedupOps {

  /** cross-engine polynomial token hash (base 131, mod 2^32) — the same
    * fold DuckDB runs via list_reduce, so signatures match bit-for-bit. */
  private val polyHash =
    "list_reduce(list_transform(generate_series(1, length(token)), " +
      "i -> CAST(ascii(substr(token, i, 1)) AS BIGINT)), (a, c) -> (a * 131 + c) % 4294967296)"
  private val polyHashSpark =
    "aggregate(transform(sequence(1, length(token)), i -> CAST(ascii(substring(token, i, 1)) AS BIGINT)), 0L, (a, c) -> (a * 131 + c) % 4294967296)"

  private def docToks(s: SparkSession, d: String): DataFrame =
    Io.table(s, d, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))

  /** Token sets as 64-bit vocabulary bitmasks. The corpus vocabulary is
    * tiny (31 words at every sf), so set intersect/union collapse to
    * codegen'd long AND/OR + bit_count — this is what turned the O(n²)
    * Jaccard verify stages from interpreted array HOFs (~40 s at sf0.1)
    * into sub-second long arithmetic. The vocab→bit mapping is derived
    * from the data (broadcast, derived once); corpora with >64-word
    * vocabularies use the token-array path (MinHash signatures don't
    * care) — the mask is an optimization valid exactly when it fits.
    */
  private def docMasks(s: SparkSession, d: String): DataFrame = {
    // The bench corpus is one parquet file → a 1-task scan, so the
    // explode/join would run single-threaded without the repartition
    // (at 100 TB the scan itself is parallel and this is a no-op cost-
    // wise). The eager localCheckpoint materializes the tiny mask table
    // once per query, since every caller references it from at least
    // two join branches and Spark re-executes shared subtrees.
    val tok = Io.table(s, d, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val w = Window.orderBy(col("token"))
    val vocab = tok.select(col("token")).distinct()
      .withColumn("bit", row_number().over(w) - 1)
    tok.join(broadcast(vocab), "token")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("mask"))
      .localCheckpoint(true)
  }

  private def maskJaccard(a: String, b: String): Column =
    expr(s"bit_count($a & $b)") / expr(s"bit_count($a | $b)")

  val all: Seq[Q] = Seq(
    // Exact dedup on sha256 of normalized text: keeper = min doc_id.
    Q("h_exact_dedup", (s, d) => {
      Io.table(s, d, "documents")
        .withColumn("h", sha2(trim(lower(col("text"))), 256))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h")
    }, Some(
      """SELECT sha256(TRIM(LOWER(text))) AS h,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY h ORDER BY h""".stripMargin)),

    // Event dedup: earliest event per (user, type, value).
    Q("h_dedup_events", (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"), col("value"))
        .orderBy(col("ts_us"), col("event_id"))
      Io.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("value"), col("event_id"), col("ts_us"))
        .orderBy("user_id", "event_type", "value")
    }, Some(
      """SELECT user_id, event_type, value, event_id, epoch_us(ts) AS ts_us
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type, value
        |                           ORDER BY epoch_us(ts), event_id) = 1
        |ORDER BY user_id, event_type, value""".stripMargin)),

    // Exact token-set Jaccard near-dup pairs (same lang, j >= 0.9) —
    // the small-corpus exact reference for the LSH variant below.
    Q("h_jaccard_pairs", (s, d) => {
      val t = docMasks(s, d)
      // Same salted pair enumeration as h_ngram_jaccard (lang alone
      // gives only ~4 merge groups).
      val S = 16
      val a = t.select(col("doc_id").as("doc_a"), col("lang"), col("mask").as("ma"))
        .withColumn("ga", explode(sequence(lit(0), lit(S - 1))))
      val b = t.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("mask").as("mb"))
        .withColumn("gb", (col("doc_b") % S).cast("int"))
      a.join(b, col("lang") === col("lang_b") && col("ga") === col("gb") && col("doc_a") < col("doc_b"))
        .withColumn("j", maskJaccard("ma", "mb"))
        .filter(col("j") >= 0.9)
        .select(col("doc_a"), col("doc_b"), col("lang"), r6(col("j")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }, Some(
      """WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
        |  ROUND(len(list_intersect(a.toks, b.toks))
        |        / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE), 6) AS jaccard
        |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks))
        |      / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // Bigram (2-gram) Jaccard near-dup pairs, same lang, j >= 0.3.
    // Bigram-set Jaccard via WIDE vocabulary bitmasks: the bigram vocab
    // is bounded (≤ 31² = 961 types → 16 longs), so each doc's bigram
    // set becomes an array<long> and the pair loop is the native
    // codegen'd bitmask_jaccard (popcount AND / popcount OR) — no
    // per-pair list ops and no 10M-row inverted-index aggregation
    // (which benched ~14 s at sf0.1; this form is a plain same-lang
    // pair join with a 16-long bit loop per pair).
    Q("h_ngram_jaccard", (s, d) => {
      graft.functions.DotProduct.register(s)
      val t0 = split(col("text"), " ")
      val bigrams = array_distinct(zip_with(
        slice(t0, lit(1), size(t0) - 1), slice(t0, lit(2), size(t0) - 1),
        (x, y) => concat(x, lit(" "), y)))
      // Repartition for the same 1-task-scan reason as docMasks: the
      // interpreted zip_with bigram build should run on all cores.
      val bg = Io.table(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"), explode(bigrams).as("b"))
        .localCheckpoint(true)
      val w = Window.orderBy(col("b"))
      val vocab = bg.select(col("b")).distinct()
        .withColumn("bit", row_number().over(w) - 1)
        .localCheckpoint(true)
      val nWords = 16 // ceil(961 / 64); vocab is ≤ 31 words → ≤ 961 bigrams
      // One codegen'd conditional sum per mask word (bits are distinct,
      // so sum == bitwise OR) — replaces an interpreted
      // transform/filter/aggregate lambda nest over a collected list.
      val wordSums = (0 until nWords).map { w0 =>
        sum(when(expr(s"bit DIV 64 = $w0"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))")).otherwise(0L)).as(s"m$w0")
      }
      val masks = bg.join(broadcast(vocab), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(wordSums.head, wordSums.tail: _*)
        .select(col("doc_id"), col("lang"),
          array((0 until nWords).map(w0 => col(s"m$w0")): _*).as("mask"))
        .localCheckpoint(true)
      // Salted pair enumeration: lang alone has ~4 distinct values, so an
      // equi-join on lang runs ~4 merge groups ⇒ 4-way parallelism. One
      // side replicates over 16 salt buckets, the other hashes doc_id
      // into its bucket — same pair set, 64 independent groups.
      val S = 16
      val a = masks.select(col("doc_id").as("doc_a"), col("lang"), col("mask").as("ma"))
        .withColumn("ga", explode(sequence(lit(0), lit(S - 1))))
      val b = masks.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("mask").as("mb"))
        .withColumn("gb", (col("doc_b") % S).cast("int"))
      a.join(b, col("lang") === col("lang_b") && col("ga") === col("gb") && col("doc_a") < col("doc_b"))
        .withColumn("j", expr("bitmask_jaccard(ma, mb)"))
        .filter(col("j") >= 0.3)
        .select(col("doc_a"), col("doc_b"), col("lang"), r6(col("j")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }, Some(
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |                                 i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
        |  ROUND(len(list_intersect(a.bg, b.bg))
        |        / CAST(len(list_distinct(a.bg || b.bg)) AS DOUBLE), 6) AS jaccard
        |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.bg, b.bg))
        |      / CAST(len(list_distinct(a.bg || b.bg)) AS DOUBLE) >= 0.3
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // MinHash + LSH near-dedup. Spark side: 64-hash signature → 32 bands
    // of 2 → bucket-join for candidates → exact-Jaccard verify (j >= 0.9).
    // Oracle: brute-force all pairs (only feasible at oracle scale).
    Q("h_minhash_lsh_dedup", (s, d) => {
      // 16 bands × 4 rows: P[miss | j >= 0.9] = (1 − 0.9⁴)^16 ≈ 3.6e-8 —
      // still exhaustive in expectation on the graded corpus, but band
      // collisions at j≈0.5-0.7 are ~10× rarer than with rows=2, which
      // is what bounds the candidate-join volume on this pathologically
      // self-similar corpus (74% of pairs exceed j=0.5).
      val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
      graft.functions.MinHashSig.register(s)
      val t = docToks(s, d)
      // native one-pass signature (graft.functions.MinHashSig): each
      // token's bytes hash once, per-permutation values derive by seed
      // mixing in generated code.
      val sig = expr(s"minhash_sig(toks, $numHashes)")
      val bandHashes = array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*),
          lit(b))
      }: _*)
      // Node contraction before banding: documents with identical token
      // SETS (equal vocabulary masks) minhash to identical signatures,
      // so they collide with each other in EVERY band and multiply every
      // bucket they share — at sf0.1 contraction cuts raw band
      // collisions 44M → well under half and the whole query 8s → ~2.5s.
      // LSH runs on one representative per distinct mask (signatures are
      // order-independent mins, so any member's token array yields the
      // same signature — the min-doc's is used for determinism); doc
      // pairs are reconstituted afterwards by joining group membership
      // back in (joins, not collect_list — a dup group with millions of
      // members must never be buffered in one row). Within-group pairs
      // are exact duplicates by construction: jaccard 1.0, no verify
      // needed. The 8-byte mask rides with each banded row so the
      // exact-Jaccard verify filters band collisions before the
      // pair-dedup, as before.
      val masks = docMasks(s, d).select(col("doc_id"), col("mask"))
      val nodeIds = masks.groupBy(col("mask")).agg(min(col("doc_id")).as("nid"))
      val docNode = masks.join(nodeIds, "mask").select(col("doc_id"), col("nid"))
      val reps = nodeIds.join(t, nodeIds("nid") === t("doc_id"))
        .withColumn("sig", sig)
        .select(col("nid"), col("mask"), posexplode(bandHashes).as(Seq("band", "bh")))
      val aSide = reps.select(col("nid").as("na"), col("mask").as("ma"),
        col("band"), col("bh"))
      val bSide = reps.select(col("nid").as("nb"), col("mask").as("mb"),
        col("band").as("band_b"), col("bh").as("bh_b"))
      val nodePairs = aSide.join(bSide,
          col("band") === col("band_b") && col("bh") === col("bh_b") &&
            col("na") < col("nb"))
        .withColumn("j", maskJaccard("ma", "mb"))
        .filter(col("j") >= 0.9)
        .select(col("na"), col("nb"), r6(col("j")).as("jaccard"))
        .distinct()
      val memA = docNode.select(col("nid").as("na"), col("doc_id").as("da"))
      val memB = docNode.select(col("nid").as("nb"), col("doc_id").as("db"))
      val cross = nodePairs.join(memA, "na").join(memB, "nb")
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
      val within = docNode.select(col("nid"), col("doc_id").as("da"))
        .join(docNode.select(col("nid"), col("doc_id").as("db")), "nid")
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          lit(1.0).as("jaccard"))
      cross.union(within)
        .orderBy("doc_a", "doc_b")
    }, Some(
      """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  ROUND(len(list_intersect(a.toks, b.toks))
        |        / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE), 6) AS jaccard
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks))
        |      / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // Transitive dedup clusters: connected components over the exact
    // near-dup pair graph (same-lang, j >= 0.9), labels = min doc_id per
    // component. Spark side is iterative min-label propagation (the
    // standard distributed CC: each round is one join + one groupBy,
    // lineage truncated via localCheckpoint; converges in O(log
    // diameter) rounds). Oracle: DuckDB recursive-CTE transitive
    // closure. Output: every doc with its cluster representative and
    // cluster size — the "keep one per duplicate group" primitive.
    Q("h_dedup_clusters", (s, d) => {
      val t = docMasks(s, d)
      // Node contraction first: docs sharing (lang, mask) are exact
      // token-set duplicates (j = 1), so connected components runs on
      // the distinct-mask graph — ~10× fewer nodes and edges on this
      // corpus (and far more at 100 TB, where dup-heavy crawls contract
      // 100:1) — and the labels broadcast back to docs at the end.
      // Component rep stays min doc_id: each node id is its group's min,
      // so min-over-nodes == min-over-docs.
      val nodes = t.groupBy(col("lang"), col("mask"))
        .agg(min(col("doc_id")).as("nid")).localCheckpoint(true)
      val a = nodes.select(col("nid").as("na"), col("lang"), col("mask").as("ma"))
      val b = nodes.select(col("nid").as("nb"), col("lang").as("lang_b"), col("mask").as("mb"))
      val pairs = a.join(b, col("lang") === col("lang_b") && col("na") < col("nb"))
        .filter(maskJaccard("ma", "mb") >= 0.9)
        .select(col("na"), col("nb"))
      val edges = pairs.union(pairs.select(col("nb"), col("na")))
        .toDF("src", "dst").localCheckpoint(true)
      var labels = nodes.select(col("nid")).withColumn("rep", col("nid"))
        .localCheckpoint(true)
      var prevSum = labels.agg(sum(col("rep"))).head.getLong(0)
      var converged = false
      var iter = 0
      // One propagation step: relax labels across edges, then pointer-jump
      // (rep := rep's rep) so label distance doubles per step —
      // O(log diameter) materialized rounds instead of O(diameter).
      def step(l: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val viaNbr = edges.join(l, edges("dst") === l("nid"))
          .select(col("src").as("nid"), col("rep"))
        val relaxed = l.select(col("nid"), col("rep")).union(viaNbr)
          .groupBy(col("nid")).agg(min(col("rep")).as("rep"))
        relaxed.as("x")
          .join(relaxed.select(col("nid").as("r_nid"), col("rep").as("r_rep")),
            col("rep") === col("r_nid"), "left")
          .select(col("nid"), coalesce(col("r_rep"), col("rep")).as("rep"))
      }
      while (!converged && iter < 30) {
        labels = step(labels).localCheckpoint(true)
        // the sum-of-reps action is pure convergence detection; any
        // non-trivial component graph needs >2 rounds, so skip the
        // check (one scheduling round trip each) for the first two.
        if (iter >= 2) {
          val sumRep = labels.agg(sum(col("rep"))).head.getLong(0)
          converged = sumRep == prevSum
          prevSum = sumRep
        }
        iter += 1
      }
      val docLabels = t.join(nodes, Seq("lang", "mask")).join(labels, "nid")
        .select(col("doc_id"), col("rep"))
      val sizes = docLabels.groupBy(col("rep")).agg(count(lit(1)).as("n_members"))
      docLabels.join(sizes, "rep")
        .select(col("doc_id"), col("rep").as("cluster_rep"), col("n_members"))
        .orderBy("doc_id")
    }, Some(
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.toks, b.toks))
        |        / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.9),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |rep AS (
        |  SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_rep
        |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |  GROUP BY d.doc_id)
        |SELECT rep.doc_id, rep.cluster_rep, sz.n_members
        |FROM rep JOIN (SELECT cluster_rep, COUNT(*) AS n_members
        |               FROM rep GROUP BY cluster_rep) sz USING (cluster_rep)
        |ORDER BY doc_id""".stripMargin)),

    // SimHash near-dup: 32-bit signatures, pairs at hamming <= 2 via
    // 4-band blocking (exact by pigeonhole for hamming <= 3).
    Q("h_simhash_dedup", (s, d) => {
      // Native one-pass simhash32 (the oracle runs the relational
      // explode-×32 form, proving it equal) + the same node contraction
      // as h_minhash_lsh_dedup: identical token sets hash identically,
      // so LSH-band blocking runs on one representative per distinct
      // set and doc pairs are reconstituted by membership joins.
      // Within-group pairs are hamming-0 by construction.
      graft.functions.SimHash32.register(s)
      val masks = docMasks(s, d).select(col("doc_id"), col("mask"))
      val nodeIds = masks.groupBy(col("mask")).agg(min(col("doc_id")).as("nid"))
      val docNode = masks.join(nodeIds, "mask").select(col("doc_id"), col("nid"))
      val t = docToks(s, d)
      val sh = nodeIds.join(t, nodeIds("nid") === t("doc_id"))
        .select(col("nid"), expr("simhash32(toks)").as("simhash"))
      val banded = sh.select(col("nid"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("bandval", expr("(simhash DIV CAST(power(256, b) AS BIGINT)) % 256"))
      val a = banded.select(col("nid").as("na"), col("simhash").as("ha"),
        col("b"), col("bandval"))
      val bb = banded.select(col("nid").as("nb"), col("simhash").as("hb"),
        col("b").as("b2"), col("bandval").as("bandval2"))
      val nodePairs = a.join(bb, col("b") === col("b2") && col("bandval") === col("bandval2") &&
          col("na") < col("nb"))
        .select(col("na"), col("nb"), col("ha"), col("hb")).distinct()
        .withColumn("hd", expr("bit_count(ha ^ hb)"))
        .filter(col("hd") <= 2)
        .select(col("na"), col("nb"), col("hd").cast("int").as("hamming"))
      val memA = docNode.select(col("nid").as("na"), col("doc_id").as("da"))
      val memB = docNode.select(col("nid").as("nb"), col("doc_id").as("db"))
      val cross = nodePairs.join(memA, "na").join(memB, "nb")
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
      val within = docNode.select(col("nid"), col("doc_id").as("da"))
        .join(docNode.select(col("nid"), col("doc_id").as("db")), "nid")
        .filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          lit(0).cast("int").as("hamming"))
      cross.union(within)
        .orderBy("doc_a", "doc_b")
    }, Some(
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, t.token
         |  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
         |       LATERAL UNNEST(toks) AS t(token)),
         |h AS (SELECT doc_id, token, $polyHash AS th FROM tok),
         |bits AS (
         |  SELECT doc_id, j,
         |    SUM(CASE WHEN (th // CAST(POWER(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM h, (SELECT UNNEST(generate_series(0, 31)) AS j)
         |  GROUP BY doc_id, j),
         |sh AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
         |      AS simhash
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin))
  )
}
