package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication family (north-star): exact, n-gram Jaccard, MinHash+LSH,
  * SimHash. All hashing is md5/hex-based so the DuckDB oracle computes the
  * *identical* signatures — no engine-specific hash functions.
  *
  * Scale design:
  *  - shingling is a per-doc generate+window pass (no shuffle across docs);
  *  - candidate generation joins on (band, bucket) — the classic LSH
  *    band-join that keeps the pair space linear-ish instead of O(n²);
  *  - the exact-Jaccard verify joins only same-language buckets (blocking).
  */
object DedupQueries {

  /** word 3-gram shingles WITH duplicates — one row per position, formed
    * per row by the codegen'd gram regex ([[Dedup.gramMatches]]) and
    * exploded: zero shuffles, where the old posexplode + lead-window form
    * paid a full exchange+sort of every token in the corpus (guide §2.4).
    * Consumers that need per-doc set semantics (Jaccard) use [[shingles]];
    * duplicate-insensitive consumers (minhash banding: `min(md5(...))`
    * cannot change under duplicates) take this form directly.
    */
  private[ops] def shinglesRaw(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(Dedup.gramMatches(col("text"), 3)).as("sh"))

  /** word 3-gram shingles, distinct per doc. `doc_id` is the documents
    * table's key (one row per doc), so the global `.distinct()` the old
    * form shuffled the whole shingle frame for is exactly per-array
    * `array_distinct` — applied before the explode, for free. KEY
    * ASSUMPTION: this equivalence holds ONLY while doc_id is unique —
    * [[shinglesSql]] (the oracle mirror) still computes a global SELECT
    * DISTINCT, so a fixture with duplicate doc_id rows would surface as
    * an oracle hash mismatch here, not a silent wrong answer.
    * Empty tokens are kept — both engines split identically, so parity
    * beats cosmetic cleanliness.
    */
  private[ops] def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(Dedup.gramMatches(col("text"), 3))).as("sh"))

  /** DuckDB mirror of [[shingles]] as a CTE prefix. */
  private[ops] val shinglesSql =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, lang, sh FROM (
      |    SELECT doc_id, lang,
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS sh
      |    FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)) t
      |  WHERE sh IS NOT NULL)""".stripMargin

  private def q(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), doc)

  val q28_dedup_exact: QueryDef = q(
    "q28_dedup_exact",
    """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS text_hash
      |FROM documents
      |GROUP BY text
      |ORDER BY keep_id""".stripMargin,
    "Exact dedup: hash-groupBy on content, keep lowest id (map-side combine)") {
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("text"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
          md5(col("text")).as("text_hash"))
        .select("keep_id", "n_copies", "text_hash")
        .orderBy("keep_id")
  }

  /** Skew guard for the shingle self-join: a shingle occurring in f docs of
    * a language block contributes f² join rows, so one hot boilerplate
    * shingle ("terms of service …") is quadratic at scale. Shingles above
    * this document frequency carry no discriminative signal and are dropped
    * from the Jaccard universe — in BOTH engines, so parity is structural.
    * 64 is >4× sf0.1's observed max (14), so small-SF results are identical
    * to the uncapped operator while the plan stays linear-ish at 100×.
    */
  private val MaxShingleDocFreq = 64

  val q29_ngram_jaccard: QueryDef = q(
    "q29_ngram_jaccard",
    shinglesSql +
      s""",
        |shc AS (
        |  SELECT doc_id, lang, sh FROM (
        |    SELECT doc_id, lang, sh, COUNT(*) OVER (PARTITION BY lang, sh) AS df
        |    FROM sh) t
        |  WHERE df <= $MaxShingleDocFreq),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,
    "n-gram Jaccard near-dup: shingle-set overlap within language blocks, " +
      "hot-shingle capped") {
    (s, d) =>
      // hot-shingle cap via map-side-combinable groupBy + anti-join (the
      // Dedup.ngramJaccardPairs shape) — the oracle keeps COUNT(*) OVER,
      // which is semantically identical and only ever runs in DuckDB
      val shAll = shingles(Tables.documents(s, d))
      val hot = shAll.groupBy("lang", "sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > MaxShingleDocFreq)
        .select("lang", "sh")
      val sh = shAll.join(hot, Seq("lang", "sh"), "left_anti")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("id_a"), col("lang"), col("sh"))
      val b = sh.select(col("doc_id").as("id_b"), col("lang").as("lang_b"), col("sh").as("sh_b"))
      val pairs = a
        .join(b, col("sh") === col("sh_b") && col("lang") === col("lang_b") &&
          col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
        .withColumn("jaccard",
          col("shared").cast(DoubleType) / (col("na") + col("nb") - col("shared")))
        .filter(col("jaccard") >= 0.2)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
  }

  /** 8 portable min-hashes (md5-keyed) + 2 LSH band buckets per doc. */
  val q30_minhash_sig: QueryDef = q(
    "q30_minhash_sig",
    shinglesSql +
      """,
        |sigs AS (
        |  SELECT doc_id,
        |    min(md5('0' || sh)) AS s0, min(md5('1' || sh)) AS s1,
        |    min(md5('2' || sh)) AS s2, min(md5('3' || sh)) AS s3,
        |    min(md5('4' || sh)) AS s4, min(md5('5' || sh)) AS s5,
        |    min(md5('6' || sh)) AS s6, min(md5('7' || sh)) AS s7
        |  FROM sh GROUP BY doc_id)
        |SELECT doc_id, s0, s1, s2, s3, s4, s5, s6, s7,
        |  md5(s0 || s1 || s2 || s3) AS band0, md5(s4 || s5 || s6 || s7) AS band1
        |FROM sigs
        |ORDER BY doc_id""".stripMargin,
    "MinHash signatures + LSH band buckets (shingle→minhash→band)") { (s, d) =>
    // raw shingles: min() is duplicate-insensitive, so the distinct's
    // extra shuffle would buy nothing (oracle keeps DISTINCT — same mins)
    val sh = shinglesRaw(Tables.documents(s, d))
    val sigCols = (0 until 8).map(i =>
      min(md5(concat(lit(i.toString), col("sh")))).as(s"s$i"))
    sh.groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .withColumn("band0", md5(concat(col("s0"), col("s1"), col("s2"), col("s3"))))
      .withColumn("band1", md5(concat(col("s4"), col("s5"), col("s6"), col("s7"))))
      .orderBy("doc_id")
  }

  /** Bucket-size cap for the LSH band join's PAIR output: a bucket of f
    * docs emits f² pairs, and a real dedup corpus is full of huge
    * near-identical clusters — exactly what the [[MaxShingleDocFreq]] guard
    * fixes for shingles. Applied in BOTH engines (windowed count ≤ cap), so
    * parity is structural. 64 is ~3× sf0.1's observed max bucket (22), so
    * small-SF results are identical to uncapped while the pair space stays
    * linear-ish at 100×. Component resolution (q52) does NOT need the cap:
    * it uses star edges, O(f) per bucket by construction.
    */
  private val MaxBandBucketSize = 64

  /** LSH candidate pairs: docs sharing any single minhash (8 bands × 1 row
    * — recall-heavy banding, right for a near-dup *candidate* stage).
    * Hot buckets above [[MaxBandBucketSize]] are dropped in both engines.
    */
  val q37_minhash_pairs: QueryDef = q(
    "q37_minhash_pairs",
    shinglesSql +
      s""",
        |hs AS (
        |  SELECT doc_id, band, min(md5(band || sh)) AS bucket
        |  FROM sh, (SELECT CAST(unnest(list_value(0,1,2,3,4,5,6,7)) AS STRING) AS band) b
        |  GROUP BY doc_id, band),
        |hsc AS (
        |  SELECT doc_id, band, bucket FROM (
        |    SELECT doc_id, band, bucket,
        |      COUNT(*) OVER (PARTITION BY band, bucket) AS bs
        |    FROM hs) t
        |  WHERE bs <= $MaxBandBucketSize)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM hsc a JOIN hsc b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "LSH band-join candidate generation (bucket-capped: linear pair space " +
      "even on boilerplate-heavy corpora)") {
    (s, d) => bandCandidates(s, d).orderBy("id_a", "id_b")
  }

  /** (doc_id, band, bucket) minhash-band assignment shared by q37 and q52:
    * one groupBy with 8 partial-agg mins (shuffles |shingles| rows), then
    * stack-unpivot to (band, bucket) — identical result to exploding 8×
    * before the shuffle at an 8th of the shuffle volume.
    */
  private def bandedBuckets(s: SparkSession, d: String): DataFrame = {
    // raw shingles: duplicate-insensitive min, no distinct shuffle
    val sh = shinglesRaw(Tables.documents(s, d))
    val sigCols = (0 until 8).map(i =>
      min(md5(concat(lit(i.toString), col("sh")))).as(s"s$i"))
    sh.groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"), expr(
        "stack(8, '0', s0, '1', s1, '2', s2, '3', s3, '4', s4, '5', s5, '6', s6, '7', s7) AS (band, bucket)"))
  }

  /** q37's candidate pairs: band equi-join with the hot-bucket cap. */
  private def bandCandidates(s: SparkSession, d: String): DataFrame = {
    // hot-bucket cap via groupBy + anti-join (no bucket-partitioned
    // window — the Dedup.minhashCandidates shape)
    val banded = bandedBuckets(s, d)
    val hot = banded.groupBy("band", "bucket").agg(count(lit(1)).as("_bs"))
      .filter(col("_bs") > MaxBandBucketSize)
      .select("band", "bucket")
    val hs = banded.join(hot, Seq("band", "bucket"), "left_anti")
    val a = hs.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val b = hs.select(col("doc_id").as("id_b"), col("band").as("band_b"), col("bucket").as("bucket_b"))
    a.join(b, col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** q52's edge list: star edges (doc → bucket-min) instead of clique
    * pairs. Identical connected components — within a bucket every doc
    * reaches the min, so transitive reachability matches the full pair
    * graph — at O(f) edges per bucket instead of O(f²), which removes the
    * dedup family's last quadratic skew exposure (big near-dup clusters
    * are the NORM in the data this resolves). No cap: connectivity must
    * not be dropped, and star edges make dropping unnecessary.
    */
  private[ops] def starEdges(s: SparkSession, d: String): DataFrame =
    bandedBuckets(s, d)
      .withColumn("_root",
        min(col("doc_id")).over(Window.partitionBy("band", "bucket")))
      .filter(col("doc_id") =!= col("_root"))
      .select(col("_root").as("id_a"), col("doc_id").as("id_b"))
      .distinct()

  /** The dedup pipeline's missing last mile: LSH buckets → connected
    * components → a canonical keep/drop set. Components via iterative
    * min-label propagation ([[Dedup.connectedComponents]]) over STAR edges
    * ([[starEdges]] — O(f) per bucket, no clique enumeration); the oracle
    * computes the same fixpoint with a recursive CTE over the full
    * uncapped candidate-pair graph (md5 banding is engine-portable), which
    * has the same components by construction — so the check also pins the
    * star-edge equivalence.
    */
  val q52_neardup_components: QueryDef = q(
    "q52_neardup_components",
    "WITH RECURSIVE " + shinglesSql.stripPrefix("WITH ") +
      """,
        |hs AS (
        |  SELECT doc_id, band, min(md5(band || sh)) AS bucket
        |  FROM sh, (SELECT CAST(unnest(list_value(0,1,2,3,4,5,6,7)) AS STRING) AS band) b
        |  GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hs a JOIN hs b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |e AS (SELECT id_a AS a, id_b AS b FROM cand
        |      UNION SELECT id_b, id_a FROM cand),
        |r(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM r GROUP BY a)
        |SELECT d.doc_id,
        |  COALESCE(c.canonical_id, d.doc_id) AS canonical_id,
        |  CAST(CASE WHEN COALESCE(c.canonical_id, d.doc_id) = d.doc_id
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_keep
        |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "Near-dup cluster resolution: LSH star edges → connected components → " +
      "canonical keep/drop set (shared CorpusBuilds artifact, reused by " +
      "q123)") { (s, d) =>
    CorpusBuilds.documentsCanonical(s, d)
      .select("doc_id", "canonical_id", "is_keep")
      .orderBy("doc_id")
  }

  /** The keeper-selection step real dedup pipelines run after q52: keep
    * each near-dup cluster's BEST copy by quality score, not its minimum
    * id ([[Dedup.selectRepresentatives]] — a lexicographic struct-min hash
    * aggregate, so a million-doc boilerplate cluster costs map-side
    * combiner rows, not a single-partition window sort). Components and
    * quality both reuse their oracled kernels (q52's star-edge components,
    * q26's 0–3 score); the oracle replays the same fixpoint + a
    * per-cluster (quality DESC, doc_id) rank — identical keeper by
    * construction, so the row also pins the struct-min ≡ window-rank
    * equivalence.
    */
  val q123_neardup_representative: QueryDef = q(
    "q123_neardup_representative",
    "WITH RECURSIVE " + shinglesSql.stripPrefix("WITH ") +
      """,
        |hs AS (
        |  SELECT doc_id, band, min(md5(band || sh)) AS bucket
        |  FROM sh, (SELECT CAST(unnest(list_value(0,1,2,3,4,5,6,7)) AS STRING) AS band) b
        |  GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hs a JOIN hs b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |e AS (SELECT id_a AS a, id_b AS b FROM cand
        |      UNION SELECT id_b, id_a FROM cand),
        |r(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM r GROUP BY a),
        |qual AS (
        |  SELECT doc_id,
        |    CAST((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1 ELSE 0 END)
        |       + (CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END)
        |       + (CASE WHEN CAST(len(regexp_extract_all(text, '([.,!?])', 1)) AS BIGINT) * 10
        |               <= CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS quality
        |  FROM documents),
        |base AS (
        |  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS canonical_id, q.quality
        |  FROM documents d
        |  LEFT JOIN comp c ON c.doc_id = d.doc_id
        |  JOIN qual q ON q.doc_id = d.doc_id),
        |rep AS (
        |  SELECT canonical_id, doc_id AS rep_id FROM (
        |    SELECT canonical_id, doc_id,
        |      row_number() OVER (PARTITION BY canonical_id
        |                         ORDER BY quality DESC, doc_id) AS rn
        |    FROM base) t
        |  WHERE rn = 1)
        |SELECT b.doc_id, b.canonical_id, b.quality, rep.rep_id,
        |  CAST(CASE WHEN b.doc_id = rep.rep_id THEN 1 ELSE 0 END AS BIGINT) AS is_rep
        |FROM base b JOIN rep USING (canonical_id)
        |ORDER BY b.doc_id""".stripMargin,
    "Near-dup keeper selection: components (q52, shared CorpusBuilds " +
      "artifact) + quality (q26) → best-copy representative per cluster, " +
      "min-id tiebreak") { (s, d) =>
    val scored = Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    Dedup.selectRepresentatives(
        CorpusBuilds.documentsCanonical(s, d), scored, "doc_id", "quality")
      .orderBy("doc_id")
  }

  /** [[Dedup.snapshotDiff]] over a simulated recrawl of the documents
    * corpus: ids ≡3 (mod 10) vanish, ids ≡7 get re-extracted with extra
    * content, ids ≡0 spawn brand-new pages. The oracle builds the
    * identical snapshots and replays the classification through a full
    * outer join — every (id, status) row value-checked.
    */
  val q126_snapshot_diff: QueryDef = q(
    "q126_snapshot_diff",
    """WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
      |oh AS (SELECT doc_id, md5(text) AS h FROM documents),
      |neu AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 7 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 3
      |  UNION ALL
      |  SELECT doc_id + (SELECT o FROM off) AS doc_id,
      |    'new page ' || CAST(doc_id AS STRING) AS text
      |  FROM documents WHERE doc_id % 10 = 0),
      |nh AS (SELECT doc_id, md5(text) AS h FROM neu)
      |SELECT COALESCE(oh.doc_id, nh.doc_id) AS doc_id,
      |  CASE WHEN oh.doc_id IS NULL THEN 'added'
      |       WHEN nh.doc_id IS NULL THEN 'removed'
      |       WHEN oh.h = nh.h THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM oh FULL OUTER JOIN nh ON oh.doc_id = nh.doc_id
      |ORDER BY doc_id, status""".stripMargin,
    "Corpus snapshot diff (recrawl CDC): added/removed/changed/unchanged " +
      "by content hash, one full-outer hash join") { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    // collision-proof synthetic-id offset: max(doc_id)+1 (a one-row
    // broadcast aggregate) instead of a fixed constant, so 'added' ids
    // can never land on a real id at any testdata generation; status
    // stays a secondary sort key as belt-and-braces
    val off = docs.agg((max(col("doc_id")) + 1L).as("_off"))
    val neu = docs.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 7, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("_off")).as("doc_id"),
          concat(lit("new page "), col("doc_id").cast(StringType)).as("text")))
    Dedup.snapshotDiff(docs, neu, "doc_id", "text").orderBy("doc_id", "status")
  }

  /** N-gram NOVELTY scoring — the memorization/diversity metric corpus
    * curators rank documents by: in ingestion order (doc_id), how much of
    * each document's content is appearing for the FIRST time? Each
    * distinct 3-gram is attributed to its minimum doc_id (one hash agg
    * over the shingle frame — no per-doc sequential scan, the same
    * first-occurrence trick q19 uses for first-per-key), then each doc
    * reports total distinct grams, novel grams, and floor-ppm novelty.
    * A replicated page scores ~0 on every copy but its first; boilerplate
    * decays as the template repeats — exactly the ranking signal. Scale
    * shape: two hash aggs + one join on the gram, all map-side combined.
    */
  val q158_novelty_scoring: QueryDef = q(
    "q158_novelty_scoring",
    shinglesSql +
      """,
        |firsts AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
        |per AS (
        |  SELECT s.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
        |  FROM sh s JOIN firsts f ON s.sh = f.sh
        |  GROUP BY s.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN 0
        |       ELSE CAST(floor((1000000 * p.n_novel) / p.n_grams) AS BIGINT) END AS BIGINT)
        |    AS novelty_ppm
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "N-gram novelty in ingestion order: distinct grams attributed to " +
      "their first doc; per-doc novel fraction in exact floor ppm") {
    (s, d) =>
      val sh = shingles(Tables.documents(s, d))
      val firsts = sh.groupBy("sh").agg(min("doc_id").as("first_doc"))
      val per = sh.join(firsts, Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      Tables.documents(s, d).select("doc_id")
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(coalesce(col("n_grams"), lit(0L)) === 0L, 0L)
            .otherwise(expr("(1000000 * n_novel) div n_grams"))
            .cast(LongType).as("novelty_ppm"))
        .orderBy("doc_id")
  }

  /** 60-bit SimHash from md5-derived word hashes (portable bit arithmetic:
    * hex → bigint via conv/strtol-equivalents on both engines).
    */
  val q31_simhash: QueryDef = q(
    "q31_simhash",
    """WITH tokw AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS hv
      |  FROM tokw WHERE w <> ''),
      |votes AS (
      |  SELECT doc_id, j, SUM(((hv >> j) & 1) * 2 - 1) AS vote
      |  FROM h CROSS JOIN range(0, 60) AS t(j)
      |  GROUP BY doc_id, j)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |FROM votes
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin,
    "SimHash: per-bit majority vote over word hashes → 60-bit fingerprint") {
    (s, d) =>
      val tokw = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .distinct()
      val h = tokw.select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast(LongType).as("hv"))
      h.select(col("doc_id"), col("hv"), explode(sequence(lit(0), lit(59))).as("j"))
        .select(col("doc_id"), col("j"),
          expr("(shiftright(hv, j) & 1) * 2 - 1").as("delta"))
        .groupBy("doc_id", "j")
        .agg(sum("delta").as("vote"))
        .select(col("doc_id"),
          when(col("vote") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
            .otherwise(lit(0L)).as("bit"))
        .groupBy("doc_id")
        .agg(sum("bit").cast(LongType).as("simhash"))
        .orderBy("doc_id")
  }

  /** Incremental dedup (the [[Dedup.dedupAgainst]] shape, md5-banded for
    * oracle portability): the corpus is doc_id % 5 ≠ 0, the "new ingest
    * batch" is doc_id % 5 = 0, and each batch doc is flagged when any of
    * its band buckets collides with a corpus bucket. Corpus×corpus pairs
    * are never formed — the probe is a semi-join of batch buckets against
    * corpus buckets, which is the O(|batch|) per-ingest cost a standing
    * 100 TB corpus demands (re-running q37/q52 over corpus+batch would be
    * O(|corpus|) every ingest).
    */
  val q58_incremental_dedup: QueryDef = q(
    "q58_incremental_dedup",
    shinglesSql +
      """,
        |hs AS (
        |  SELECT doc_id, band, min(md5(band || sh)) AS bucket
        |  FROM sh, (SELECT CAST(unnest(list_value(0,1,2,3,4,5,6,7)) AS STRING) AS band) b
        |  GROUP BY doc_id, band),
        |dup AS (
        |  SELECT DISTINCT a.doc_id
        |  FROM hs a JOIN hs c ON a.band = c.band AND a.bucket = c.bucket
        |  WHERE a.doc_id % 5 = 0 AND c.doc_id % 5 <> 0)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        |FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
        |WHERE d.doc_id % 5 = 0
        |ORDER BY d.doc_id""".stripMargin,
    "Incremental dedup: new-batch docs probed against standing-corpus LSH " +
      "buckets via semi-join (no corpus self-pairing)") { (s, d) =>
    val bb = bandedBuckets(s, d)
    val corpusBuckets = bb.filter(col("doc_id") % 5 =!= 0).select("band", "bucket")
    val flagged = bb.filter(col("doc_id") % 5 === 0)
      .join(corpusBuckets, Seq("band", "bucket"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("_dup", lit(1L))
    Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
      .select("doc_id")
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_dup"), lit(0L)).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Segment-level corpus dedup ([[Dedup.segmentDedup]], the CCNet-style
    * "line dedup" pass over 4-token windows — at this width ~11% of
    * segment instances at sf0.01 are cross-doc duplicates, so the drop
    * path is genuinely exercised). Keep-first semantics: the lowest doc_id
    * retains its copy. The oracle replays the identical windowing, md5
    * doc-frequency, keeper rule, and in-order reassembly in DuckDB; the
    * rebuilt text is compared by md5.
    */
  val q70_line_dedup: QueryDef = q(
    "q70_line_dedup",
    """WITH b AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    CAST(CAST(floor((len(string_split(text, ' ')) + 3) / 4) AS BIGINT) AS BIGINT) AS nseg
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS seg_no,
      |    array_to_string(list_slice(toks, u.i*4+1, u.i*4+4), ' ') AS seg
      |  FROM b, unnest(range(0, nseg)) AS u(i)),
      |h AS (SELECT doc_id, seg_no, seg, md5(seg) AS hh FROM seg),
      |over_cap AS (
      |  SELECT hh, min(doc_id) AS keeper FROM h
      |  GROUP BY hh HAVING count(DISTINCT doc_id) > 1),
      |kept AS (
      |  SELECT s.doc_id, s.seg_no, s.seg
      |  FROM h s LEFT JOIN over_cap o ON s.hh = o.hh
      |  WHERE o.hh IS NULL OR s.doc_id = o.keeper),
      |r AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |    string_agg(seg, ' ' ORDER BY seg_no) AS txt
      |  FROM kept GROUP BY doc_id)
      |SELECT b.doc_id AS id, b.nseg AS n_segments,
      |  coalesce(r.n_kept, CAST(0 AS BIGINT)) AS n_kept,
      |  md5(coalesce(r.txt, '')) AS text_md5
      |FROM b LEFT JOIN r USING (doc_id)
      |ORDER BY id""".stripMargin,
    "Corpus segment (line) dedup: keep-first over 4-token windows") { (s, d) =>
    Dedup.segmentDedup(Tables.documents(s, d), "doc_id", "text",
        width = 4, maxDocFreq = 1)
      .select(col("id"), col("n_segments"), col("n_kept"),
        md5(col("text_dedup")).as("text_md5"))
      .orderBy("id")
  }

  /** [[Dedup.editDistance1Pairs]] over the corpus vocabulary: SymSpell
    * deletion-neighborhood blocking (|V|·(len+1) candidate space, never
    * |V|²), levenshtein-verified. The oracle rebuilds the identical
    * neighborhoods with generate_series + substr, so the blocking
    * completeness property (distance ≤ 1 ⟺ neighborhoods intersect) is
    * pinned structurally, not assumed.
    */
  val q88_fuzzy_names: QueryDef = q(
    "q88_fuzzy_names",
    """WITH words AS (SELECT DISTINCT c_name AS w FROM customer),
      |vars AS (
      |  SELECT DISTINCT w, v FROM (
      |    SELECT w, w AS v FROM words
      |    UNION ALL
      |    SELECT w, substr(w, 1, i - 1) || substr(w, i + 1, length(w)) AS v
      |    FROM (SELECT w, unnest(generate_series(1, length(w))) AS i
      |          FROM words) g) u),
      |cand AS (
      |  SELECT DISTINCT a.w AS w1, b.w AS w2
      |  FROM vars a JOIN vars b ON a.v = b.v AND a.w < b.w)
      |SELECT w1, w2, CAST(levenshtein(w1, w2) AS BIGINT) AS dist
      |FROM cand WHERE levenshtein(w1, w2) <= 1
      |ORDER BY w1, w2""".stripMargin,
    "Fuzzy entity matching: edit-distance-1 name pairs via SymSpell " +
      "deletion-neighborhood blocking (never an all-pairs scan)") { (s, d) =>
    Dedup.editDistance1Pairs(
        Tables.t(s, d, "customer").select("c_name"), "c_name")
      .orderBy("w1", "w2")
  }

  /** [[Dedup.repeatedWindows]] — substring-level exact-repetition
    * detection (the "dedup training data" window approximation):
    * 8-token sliding windows hashed corpus-wide, positions whose window
    * recurs anywhere counted per doc. Complements q70 (line-level) at
    * sub-line granularity. The oracle slices the identical filtered token
    * lists, so window boundaries, the empty-token rule, and the global
    * frequency threshold are all pinned.
    */
  val q92_repeated_windows: QueryDef = q(
    "q92_repeated_windows",
    """WITH tok2 AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
      |  FROM tok2),
      |wins AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
      |  FROM pos),
      |rep AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
      |cnt AS (
      |  SELECT doc_id, COUNT(*) AS n_repeated
      |  FROM wins JOIN rep USING (h) GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(greatest(len(t.toks) - 7, 0) AS BIGINT) AS n_windows,
      |  COALESCE(c.n_repeated, 0) AS n_repeated
      |FROM tok2 t LEFT JOIN cnt c ON c.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin,
    "Substring-level exact-repetition detection: 8-token windows hashed " +
      "corpus-wide, repeated positions counted per doc") { (s, d) =>
    Dedup.repeatedWindows(Tables.documents(s, d), "doc_id", "text", w = 8)
      .orderBy("doc_id")
  }

  /** [[Dedup.containmentPairs]] — one-sided Jaccard (shared / min set
    * size): the wrapper detector symmetric near-dup misses (a doc that
    * embeds another plus boilerplate has high containment, low Jaccard).
    * Same hot-shingle cap as q29; the oracle replays set sizes, shared
    * counts, and the min-denominator ratio, ppm-floored for engine-exact
    * comparison.
    */
  val q97_containment: QueryDef = q(
    "q97_containment",
    // Self-contained shingle CTE replaying Dedup.shingleRows EXACTLY —
    // `\s+` regex split (not the single-space split of shinglesSql) and
    // the short-doc whole-text fallback — so oracle parity is structural
    // on ANY corpus, not an accident of single-spaced ≥3-token testdata
    // (round-5 ADVICE finding, closed round 7). Both engines keep regex
    // splits' edge empties identically; `array_to_string(…, ' ')` mirrors
    // the engine's concat_ws re-join for <3-token docs.
    s"""WITH tokc AS (
       |  SELECT doc_id,
       |    generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS i,
       |    unnest(regexp_split_to_array(text, '\\s+')) AS w
       |  FROM documents
       |  WHERE len(regexp_split_to_array(text, '\\s+')) >= 3),
       |shl AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT doc_id,
       |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS sh
       |    FROM tokc WINDOW win AS (PARTITION BY doc_id ORDER BY i)) t
       |  WHERE sh IS NOT NULL),
       |shs AS (
       |  SELECT doc_id, array_to_string(regexp_split_to_array(text, '\\s+'), ' ') AS sh
       |  FROM documents
       |  WHERE len(regexp_split_to_array(text, '\\s+')) < 3),
       |sh97 AS (SELECT DISTINCT doc_id, sh FROM (
       |  SELECT doc_id, sh FROM shl UNION ALL SELECT doc_id, sh FROM shs) u),
       |shc AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df
       |    FROM sh97 d) t
       |  WHERE df <= $MaxShingleDocFreq),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(floor(1000000 * CAST(shared AS DOUBLE) / least(sa.n, sb.n)) AS BIGINT) AS cont_ppm
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "Containment (one-sided Jaccard) pairs: near-subset/wrapper " +
      "detection, hot-shingle capped") { (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.5)
      .select(col("id_a"), col("id_b"),
        floor(lit(1000000) * col("containment")).cast(LongType).as("cont_ppm"))
      .orderBy("id_a", "id_b")
  }

  /** [[Dedup.removeRepeatedWindows]] — q92's detector turned into the
    * actual Lee-et-al TRANSFORM: cut every token covered by a corpus-wide
    * repeated 8-token window, emit the reconstruction digest. The oracle
    * replays tokenization, window hashing, the repeated set, the
    * w-token cover expansion, and the exact rebuilt text (md5 of the
    * ordered re-join), so a single off-by-one in the cover interval or a
    * mis-ordered rebuild hash-fails.
    */
  val q106_repeated_removal: QueryDef = q(
    "q106_repeated_removal",
    """WITH tokarr AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p, unnest(toks) AS t
      |  FROM tokarr),
      |win AS (
      |  SELECT doc_id, p, md5(wtxt) AS h FROM (
      |    SELECT doc_id, p,
      |      t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
      |        || ' ' || lead(t, 3) OVER win || ' ' || lead(t, 4) OVER win
      |        || ' ' || lead(t, 5) OVER win || ' ' || lead(t, 6) OVER win
      |        || ' ' || lead(t, 7) OVER win AS wtxt,
      |      lead(t, 7) OVER win AS lst
      |    FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)) x
      |  WHERE lst IS NOT NULL),
      |rep AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
      |starts AS (SELECT doc_id, p FROM win WHERE h IN (SELECT h FROM rep)),
      |cov AS (
      |  SELECT DISTINCT doc_id, p + k AS idx
      |  FROM starts, range(0, 8) AS u(k)),
      |kept AS (
      |  SELECT tok.doc_id, tok.p, tok.t
      |  FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.idx = tok.p
      |  WHERE cov.idx IS NULL),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS nk,
      |    md5(string_agg(t, ' ' ORDER BY p)) AS cleaned_md5
      |  FROM kept GROUP BY doc_id),
      |b AS (SELECT doc_id, len(toks) AS n FROM tokarr)
      |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
      |  CAST(b.n - COALESCE(a.nk, 0) AS BIGINT) AS n_removed,
      |  COALESCE(a.cleaned_md5, md5('')) AS cleaned_md5
      |FROM b LEFT JOIN agg a ON a.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin,
    "Substring-level repeated-window REMOVAL (Lee et al. transform): cut " +
      "covered tokens, digest the rebuilt text") { (s, d) =>
    Dedup.removeRepeatedWindows(Tables.documents(s, d), "doc_id", "text", w = 8)
      .orderBy("doc_id")
  }

  /** Train/test SPLIT-LEAKAGE audit — the composition every eval pipeline
    * needs before trusting a benchmark number: near-duplicate pairs
    * (q37's bucket-capped LSH band join) classified by which side of the
    * deterministic train/val/test split ([[Sampling.stableSplit]], q53)
    * each endpoint landed on. A near-dup pair straddling train and test
    * means the model sees the answer key — `is_cross = 1` rows are the
    * leaks. The pair is canonicalized by the lexicographic (lo, hi) split
    * label so direction never splits a cell. Scale shape: the pair space
    * is q37's (band-blocked, hot-bucket capped — linear-ish), the split
    * is a per-row pure function, and the classification is two hash
    * joins on doc_id — no new quadratic surface.
    */
  val q243_split_leakage: QueryDef = q(
    "q243_split_leakage",
    shinglesSql +
      s""",
        |hs AS (
        |  SELECT doc_id, band, min(md5(band || sh)) AS bucket
        |  FROM sh, (SELECT CAST(unnest(list_value(0,1,2,3,4,5,6,7)) AS STRING) AS band) b
        |  GROUP BY doc_id, band),
        |hsc AS (
        |  SELECT doc_id, band, bucket FROM (
        |    SELECT doc_id, band, bucket,
        |      COUNT(*) OVER (PARTITION BY band, bucket) AS bs
        |    FROM hs) t
        |  WHERE bs <= $MaxBandBucketSize),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hsc a JOIN hsc b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |spl AS (
        |  SELECT doc_id,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))
        |             AS BIGINT) / 4294967296.0 < 0.8 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))
        |             AS BIGINT) / 4294967296.0 < 0.9 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT least(sa.split, sb.split) AS split_lo,
        |  greatest(sa.split, sb.split) AS split_hi,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_cross
        |FROM pairs p
        |JOIN spl sa ON sa.doc_id = p.id_a
        |JOIN spl sb ON sb.doc_id = p.id_b
        |GROUP BY 1, 2, 4
        |ORDER BY split_lo, split_hi""".stripMargin,
    "Split-leakage audit: near-dup pairs straddling the train/test " +
      "boundary (LSH pairs ∘ stable split — the eval-contamination check)") {
    (s, d) =>
      val pairs = bandCandidates(s, d)
      val spl = Sampling.stableSplit(
        Tables.documents(s, d).select("doc_id"), "doc_id")
      pairs
        .join(spl.select(col("doc_id").as("id_a"), col("split").as("split_a")),
          Seq("id_a"))
        .join(spl.select(col("doc_id").as("id_b"), col("split").as("split_b")),
          Seq("id_b"))
        .groupBy(least(col("split_a"), col("split_b")).as("split_lo"),
          greatest(col("split_a"), col("split_b")).as("split_hi"),
          when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)
            .as("is_cross"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("split_lo"), col("split_hi"),
          col("n_pairs").cast(LongType).as("n_pairs"), col("is_cross"))
        .orderBy("split_lo", "split_hi")
  }

  /** [[Dedup.crossDocSpanDedup]] at k = 8 — the ExactSubstr family:
    * every token span ≥ 8 appearing verbatim in ≥ 2 documents is excised
    * from ALL of them (variable-length: longer duplicated runs chain
    * from consecutive duplicated 8-windows and are merged by the
    * gaps-and-islands pass into single maximal spans). The oracle
    * replays gram md5s, the min≠max cross-doc test, the covered-position
    * explode, and the lag()-based span merge; every doc reports, zeros
    * included. Live signal at sf0.01: 1015 duplicated grams, 47/500
    * docs hit (probed before pinning — a zero-row gate is no gate).
    */
  val q267_crossdoc_substring_dedup: QueryDef = q(
    "q267_crossdoc_substring_dedup",
    s"""WITH tok AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, i,
      |    md5(${crossDocGramExpr(8)}) AS gh
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |dup AS (
      |  SELECT gh FROM g WHERE gh IS NOT NULL
      |  GROUP BY gh HAVING min(doc_id) <> max(doc_id)),
      |cov AS (
      |  SELECT DISTINCT g.doc_id, g.i + ds.d AS t
      |  FROM g JOIN dup ON g.gh = dup.gh
      |  CROSS JOIN (SELECT d FROM range(0, 8) AS t(d)) ds),
      |sp AS (
      |  SELECT doc_id, COUNT(*) AS n_removed,
      |    SUM(CASE WHEN pt IS NULL OR pt <> t - 1 THEN 1 ELSE 0 END)
      |      AS n_spans
      |  FROM (SELECT doc_id, t,
      |          lag(t) OVER (PARTITION BY doc_id ORDER BY t) AS pt
      |        FROM cov) x
      |  GROUP BY doc_id),
      |nt AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id)
      |SELECT nt.doc_id, CAST(nt.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(sp.n_removed, 0) AS BIGINT) AS n_removed,
      |  CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(nt.n_tokens - COALESCE(sp.n_removed, 0) AS BIGINT) AS n_kept
      |FROM nt LEFT JOIN sp ON nt.doc_id = sp.doc_id
      |ORDER BY nt.doc_id""".stripMargin,
    "Cross-document variable-length substring dedup (ExactSubstr, " +
      "k=8): corpus-discovered duplicated spans excised from all " +
      "copies, maximal-run counts per doc") { (s, d) =>
    Dedup.crossDocSpanDedup(Tables.documents(s, d), "doc_id", "text", 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** The (k−1) chained `lead`s of a k-word gram window, as DuckDB SQL. */
  private def crossDocGramExpr(k: Int): String =
    "w" + (1 until k).map(j => s" || ' ' || lead(w, $j) OVER win").mkString

  def defs: Seq[QueryDef] = Seq(
    q28_dedup_exact, q29_ngram_jaccard, q30_minhash_sig, q37_minhash_pairs,
    q31_simhash, q52_neardup_components, q58_incremental_dedup, q70_line_dedup,
    q88_fuzzy_names, q92_repeated_windows, q97_containment,
    q106_repeated_removal, q123_neardup_representative, q126_snapshot_diff,
    q158_novelty_scoring, q243_split_leakage, q267_crossdoc_substring_dedup)
}
