package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-parity queries for the deterministic sampling operators
  * ([[Sampling]]). The split must be a pure function of the key —
  * identical across runs, partitionings, and engines — which is exactly
  * what the oracle check proves: DuckDB rebuilds the same md5-derived
  * assignment and the hashes must match.
  */
object SamplingQueries {

  /** DuckDB mirror of [[Sampling.unitHash]] over doc_id. */
  private val unitHashSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0"

  val q53_stable_split: QueryDef = QueryDef(
    "q53_stable_split",
    (s, d) =>
      Sampling.stableSplit(Tables.documents(s, d), "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_id"))
        .orderBy("split"),
    Some(s"""WITH assigned AS (
      |  SELECT doc_id,
      |    CASE WHEN $unitHashSql < 0.8 THEN 'train'
      |         WHEN $unitHashSql < 0.9 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, COUNT(*) AS n, MIN(doc_id) AS first_id
      |FROM assigned GROUP BY split ORDER BY split""".stripMargin),
    "Deterministic hash-based train/val/test split (stable across runs, " +
      "partitionings, and engines — md5 assignment shared with the oracle)")

  /** Sequence packing ([[Packing.packGreedy]]), oracled as PROPERTIES
    * (the q41/q55 trick): greedy packing is a sequential algorithm SQL
    * cannot replay, but its contract is fully checkable — every document
    * assigned exactly once, no multi-doc bin over capacity, bin count
    * within [⌈total/cap⌉, n_docs], and ≥ 50% mean fill for closed bins
    * (structural for next-fit). DuckDB asserts the invariant flags as
    * literal 1 and the document/token totals exactly.
    */
  val q59_sequence_packing: QueryDef = QueryDef(
    "q59_sequence_packing",
    (s, d) => {
      val cap = 256L
      val docs = Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", cap)
      val bins = Packing.binAudit(packed, "n_tokens", cap)
      val binStats = bins.agg(
        count(lit(1)).as("n_bins"),
        min("within_cap").as("cap_ok"),
        sum("bin_tokens").as("total_tokens"),
        max("bin_tokens").as("max_bin"))
      // volume lower bound divides by max(cap, heaviest bin): an oversize
      // single-doc bin legally exceeds cap, so plain total/cap would
      // over-demand bins on corpora containing docs longer than the cap
      packed.agg(
          count(lit(1)).as("n_rows"),
          countDistinct("doc_id").as("n_docs"))
        .crossJoin(binStats)
        .select(
          col("n_docs").cast(LongType).as("n_docs"),
          col("total_tokens").cast(LongType).as("total_tokens"),
          when(col("n_rows") === col("n_docs"), 1L).otherwise(0L).as("assigned_once_ok"),
          col("cap_ok").cast(LongType).as("capacity_ok"),
          when(col("n_bins") <= col("n_docs") &&
            col("n_bins") >= ceil(col("total_tokens").cast(DoubleType) /
              greatest(lit(cap), col("max_bin"))),
            1L).otherwise(0L).as("bin_count_ok"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '(\S+)', 1))) AS BIGINT) AS total_tokens,
      |  CAST(1 AS BIGINT) AS assigned_once_ok,
      |  CAST(1 AS BIGINT) AS capacity_ok,
      |  CAST(1 AS BIGINT) AS bin_count_ok
      |FROM documents""".stripMargin),
    "Greedy next-fit sequence packing into 256-token bins, contract-" +
      "oracled: exact doc/token totals + capacity and bin-count invariants")

  /** Deterministic epoch shuffle ([[Sampling.shuffleShards]]): the oracle
    * rebuilds the identical seeded-md5 shard assignment and within-shard
    * order, so a full hash match proves the permutation is a pure
    * function of (seed, key) — the property that makes the shuffle
    * reproducible across runs, partitionings, and engines.
    */
  val q72_shuffle_shards: QueryDef = QueryDef(
    "q72_shuffle_shards",
    (s, d) =>
      Sampling.shuffleShards(Tables.documents(s, d), "doc_id", "ep1", 8)
        .orderBy("shard", "pos"),
    Some("""WITH h AS (
      |  SELECT doc_id AS id, md5('ep1:' || CAST(doc_id AS STRING)) AS hh
      |  FROM documents),
      |s AS (
      |  SELECT id, hh,
      |    CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % 8 AS shard
      |  FROM h)
      |SELECT id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, id) - 1 AS BIGINT) AS pos
      |FROM s
      |ORDER BY shard, pos""".stripMargin),
    "Deterministic sharded pre-training shuffle (seeded md5 permutation, " +
      "no global sort)")

  /** [[Sampling.groupCap]]: deterministic "at most k docs per language" —
    * the hard-cap companion of q62's proportional reweighting. The oracle
    * replays the identical md5 rank-and-cap, and the per-stratum id
    * digest pins the EXACT kept subset, not just its size.
    */
  val q91_group_cap: QueryDef = QueryDef(
    "q91_group_cap",
    (s, d) => {
      Sampling.groupCap(Tables.documents(s, d), "doc_id", "lang", k = 25)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_id"),
          sum("doc_id").cast(LongType).as("id_digest"))
        .orderBy("lang")
    },
    Some("""WITH ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0,
      |      doc_id) AS rk
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n, MIN(doc_id) AS first_id,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_digest
      |FROM ranked WHERE rk <= 25
      |GROUP BY lang ORDER BY lang""".stripMargin),
    "Deterministic exact-k cap per stratum (uniform hash-ranked k-subset, " +
      "engine-identical kept set)")

  /** [[Sampling.sourceCuration]] — the C4/RefinedWeb-style SOURCE filter:
    * per-source exact-dup rate, average token length, cross-source
    * exact-dup leakage, and the wholesale keep decision, all in exact
    * integer/rational arithmetic the oracle replays verbatim. The first
    * consumer of the documents table's `source` column.
    */
  val q103_source_curation: QueryDef = QueryDef(
    "q103_source_curation",
    (s, d) => {
      Sampling.sourceCuration(Tables.documents(s, d),
          "doc_id", "text", "source", maxDupPpm = 300000, minAvgTokens = 5)
        .orderBy("source")
    },
    Some("""WITH base AS (
      |  SELECT doc_id, source AS src, text,
      |    CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT) AS toks
      |  FROM documents),
      |per_src AS (
      |  SELECT src, COUNT(*) AS n_docs,
      |    COUNT(DISTINCT text) AS n_uniq_texts,
      |    SUM(toks) AS tok_sum
      |  FROM base GROUP BY src),
      |multi AS (
      |  SELECT text FROM base GROUP BY text
      |  HAVING COUNT(DISTINCT src) > 1),
      |xdup AS (
      |  SELECT src, COUNT(*) AS n_cross_dup
      |  FROM base WHERE text IN (SELECT text FROM multi)
      |  GROUP BY src)
      |SELECT p.src AS source,
      |  CAST(p.n_docs AS BIGINT) AS n_docs,
      |  CAST(p.n_uniq_texts AS BIGINT) AS n_uniq_texts,
      |  CAST(CAST(floor((1000000 * (p.n_docs - p.n_uniq_texts)) / p.n_docs) AS BIGINT) AS BIGINT) AS dup_ppm,
      |  CAST(CAST(floor((1000000 * p.tok_sum) / p.n_docs) AS BIGINT) AS BIGINT) AS avg_tokens_ppm,
      |  CAST(COALESCE(x.n_cross_dup, 0) AS BIGINT) AS n_cross_dup,
      |  CAST(CASE WHEN CAST(floor((1000000 * (p.n_docs - p.n_uniq_texts)) / p.n_docs) AS BIGINT) <= 300000
      |        AND CAST(floor((1000000 * p.tok_sum) / p.n_docs) AS BIGINT) >= 5000000
      |       THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM per_src p LEFT JOIN xdup x ON x.src = p.src
      |ORDER BY source""".stripMargin),
    "Source-level curation: per-source dup rate, token length, " +
      "cross-source leakage, wholesale keep decision (C4/RefinedWeb " +
      "domain-filter shape)")

  /** [[Sampling.topicSample]] — cluster-balanced corpus mixture: q104's
    * deterministic k-means quantizer composed with q91's hash-ranked cap,
    * applied per CLUSTER instead of per language. The oracle chains
    * q104's three unrolled Lloyd CTE generations, one more
    * assignment generation off the trained centroids (identical
    * (dist2, cid) argmin), and q91's md5 rank-and-cap — pinning the
    * EXACT kept subset per topic cluster via id digests.
    */
  val q110_topic_sample: QueryDef = QueryDef(
    "q110_topic_sample",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      Sampling.topicSample(emb, "id", "emb", nClusters = 8, iters = 3,
          capPerCluster = 25,
          centroids = Some(CorpusBuilds.embeddingsCentroids(s, d, 8, 3)))
        .groupBy("centroid_id")
        .agg(count(lit(1)).as("n_candidates"),
          sum("kept").cast(LongType).as("n_kept"),
          min(when(col("kept") === 1L, col("id"))).as("first_kept_id"),
          sum(when(col("kept") === 1L, col("id"))).cast(LongType)
            .as("kept_id_digest"))
        .orderBy("centroid_id")
    },
    Some(s"""WITH dv AS (
      |  SELECT vec_id AS id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |ids0 AS (SELECT vec_id AS id FROM embeddings ORDER BY vec_id LIMIT 8),
      |c0 AS (
      |  SELECT CAST(r.rn - 1 AS BIGINT) AS cid, dv.i, dv.x AS m
      |  FROM (SELECT id, row_number() OVER (ORDER BY id) AS rn FROM ids0) r
      |  JOIN dv ON dv.id = r.id),
      |${SimilarityQueries.kmeansIterSql(1)},
      |${SimilarityQueries.kmeansIterSql(2)},
      |${SimilarityQueries.kmeansIterSql(3)},
      |d4 AS (
      |  SELECT dv.id, c.cid,
      |    SUM(c.m * c.m) - 2 * SUM(dv.x * c.m) AS dist2
      |  FROM dv JOIN c3 c ON c.i = dv.i
      |  GROUP BY dv.id, c.cid),
      |a4 AS (
      |  SELECT id, cid FROM (
      |    SELECT id, cid,
      |      row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
      |    FROM d4) t WHERE rn = 1),
      |ranked AS (
      |  SELECT id, cid,
      |    row_number() OVER (PARTITION BY cid ORDER BY
      |      CAST(('0x' || substr(md5(CAST(id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0,
      |      id) AS rk
      |  FROM a4)
      |SELECT cid AS centroid_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |  CAST(SUM(CASE WHEN rk <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  MIN(CASE WHEN rk <= 25 THEN id END) AS first_kept_id,
      |  CAST(SUM(CASE WHEN rk <= 25 THEN id END) AS BIGINT) AS kept_id_digest
      |FROM ranked GROUP BY cid ORDER BY centroid_id""".stripMargin),
    "Topic-stratified sampling: k-means quantizer (q104's trainer) + " +
      "per-cluster hash-ranked cap (q91's convention), kept set pinned " +
      "by id digest per cluster")

  /** [[Sampling.domainCuration]] — q103's keep logic re-keyed on the
    * registrable domain parsed from a URL ([[Featurize.domainOf]]).
    * The testdata tables carry no URL column, so the entry derives one
    * deterministically from (doc_id, source) — varying scheme, userinfo,
    * subdomain depth, port, path/query tail, and TLD (including
    * two-level public suffixes) so every parse shape is exercised — and
    * the oracle constructs the IDENTICAL string before replaying the
    * same host/domain regexes ([[Featurize.hostPattern]] /
    * [[Featurize.domainPattern]], interpolated verbatim) in DuckDB.
    */
  /** q111/q122 shared deterministic URL synthesis (the testdata carries
    * no URL column): scheme, userinfo, subdomain depth, TLD (incl.
    * two-level public suffixes), port, and path/query tail all vary with
    * (doc_id, source) so every parse shape is exercised; the SQL twin
    * builds the IDENTICAL string.
    */
  private def syntheticUrl: org.apache.spark.sql.Column = {
    val schemes = array(lit("https://"), lit("http://"), lit(""),
      lit("https://user@"))
    val subs = array(lit(""), lit("www."), lit("blog.cdn."))
    val tlds = array(lit("com"), lit("org"), lit("net"), lit("co.uk"),
      lit("com.au"))
    concat(
      element_at(schemes, (col("doc_id") % 4 + 1).cast(IntegerType)),
      element_at(subs, (col("doc_id") % 3 + 1).cast(IntegerType)),
      lit("site-"), col("source"), lit("."),
      element_at(tlds, (col("doc_id") % 5 + 1).cast(IntegerType)),
      when(col("doc_id") % 2 === 0,
        concat(lit(":8080/p/"), col("doc_id").cast(StringType)))
        .otherwise(concat(lit("/a?q="), col("doc_id").cast(StringType))))
  }

  private val syntheticUrlSql: String =
    """urled AS (
      |  SELECT doc_id, text,
      |    list_extract(list_value('https://','http://','','https://user@'), CAST(doc_id % 4 AS INT) + 1) ||
      |    list_extract(list_value('','www.','blog.cdn.'), CAST(doc_id % 3 AS INT) + 1) ||
      |    'site-' || source || '.' ||
      |    list_extract(list_value('com','org','net','co.uk','com.au'), CAST(doc_id % 5 AS INT) + 1) ||
      |    CASE WHEN doc_id % 2 = 0 THEN ':8080/p/' || CAST(doc_id AS STRING)
      |         ELSE '/a?q=' || CAST(doc_id AS STRING) END AS url
      |  FROM documents)""".stripMargin

  val q111_domain_curation: QueryDef = QueryDef(
    "q111_domain_curation",
    (s, d) => {
      Sampling.domainCuration(
          Tables.documents(s, d).withColumn("url", syntheticUrl),
          "doc_id", "text", "url", maxDupPpm = 300000, minAvgTokens = 5)
        .orderBy("domain")
    },
    Some(s"""WITH $syntheticUrlSql,
      |hosted AS (
      |  SELECT doc_id, text,
      |    lower(regexp_extract(url, '${Featurize.hostPattern}', 1)) AS host
      |  FROM urled),
      |base AS (
      |  SELECT doc_id, text,
      |    coalesce(nullif(regexp_extract(host, '${Featurize.domainPattern}', 1), ''),
      |             host) AS src,
      |    CAST(len(regexp_extract_all(text, '(\\S+)', 1)) AS BIGINT) AS toks
      |  FROM hosted),
      |per_src AS (
      |  SELECT src, COUNT(*) AS n_docs,
      |    COUNT(DISTINCT text) AS n_uniq_texts,
      |    SUM(toks) AS tok_sum
      |  FROM base GROUP BY src),
      |multi AS (
      |  SELECT text FROM base GROUP BY text
      |  HAVING COUNT(DISTINCT src) > 1),
      |xdup AS (
      |  SELECT src, COUNT(*) AS n_cross_dup
      |  FROM base WHERE text IN (SELECT text FROM multi)
      |  GROUP BY src)
      |SELECT p.src AS domain,
      |  CAST(p.n_docs AS BIGINT) AS n_docs,
      |  CAST(p.n_uniq_texts AS BIGINT) AS n_uniq_texts,
      |  CAST(CAST(floor((1000000 * (p.n_docs - p.n_uniq_texts)) / p.n_docs) AS BIGINT) AS BIGINT) AS dup_ppm,
      |  CAST(CAST(floor((1000000 * p.tok_sum) / p.n_docs) AS BIGINT) AS BIGINT) AS avg_tokens_ppm,
      |  CAST(COALESCE(x.n_cross_dup, 0) AS BIGINT) AS n_cross_dup,
      |  CAST(CASE WHEN CAST(floor((1000000 * (p.n_docs - p.n_uniq_texts)) / p.n_docs) AS BIGINT) <= 300000
      |        AND CAST(floor((1000000 * p.tok_sum) / p.n_docs) AS BIGINT) >= 5000000
      |       THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM per_src p LEFT JOIN xdup x ON x.src = p.src
      |ORDER BY domain""".stripMargin),
    "Per-domain curation: registrable-domain parse (simplified public " +
      "suffix rules, pure regexp chain — no UDF) feeding q103's " +
      "dup/length/leakage keep decision")

  /** [[Sampling.blocklistFilter]] over the q111 synthetic URLs. The
    * blocklist exercises every hierarchy level: a registrable domain
    * (blocks all its subdomains), a deep subdomain entry (blocks only
    * that subtree), a two-level-suffix domain, a whole TLD, and a decoy
    * (`rc5.com`) that is a TEXTUAL suffix of the real host
    * `site-src5.com` but not a label-boundary suffix — the label-chain
    * match must not block it. (Each entry's source/TLD pair is chosen on
    * the synthesis moduli so the host it targets actually occurs:
    * source srcN always carries TLD index N mod 5.)
    * `blocked_by` pins which entry won (most specific), not just the
    * boolean.
    */
  val q122_blocklist_filter: QueryDef = QueryDef(
    "q122_blocklist_filter",
    (s, d) => {
      import s.implicits._
      val bl = Seq("site-src0.com", "cdn.site-src1.org", "site-src3.co.uk",
        "net", "rc5.com").toDF("blocked")
      Sampling.blocklistFilter(
          Tables.documents(s, d).withColumn("url", syntheticUrl),
          "doc_id", "url", bl)
        .orderBy("doc_id")
    },
    Some(s"""WITH $syntheticUrlSql,
      |hosted AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '${Featurize.hostPattern}', 1)) AS host
      |  FROM urled),
      |parts AS (SELECT doc_id, host, string_split(host, '.') AS p FROM hosted),
      |idx AS (
      |  SELECT doc_id, host, p,
      |    unnest(generate_series(1, len(p))) AS j
      |  FROM parts),
      |sufs AS (
      |  SELECT doc_id, host,
      |    array_to_string(list_slice(p, CAST(j AS BIGINT), len(p)), '.') AS suf
      |  FROM idx),
      |bl(blocked) AS (VALUES ('site-src0.com'), ('cdn.site-src1.org'),
      |  ('site-src3.co.uk'), ('net'), ('rc5.com')),
      |m AS (
      |  SELECT doc_id, max_by(suf, length(suf)) AS blocked_by
      |  FROM sufs JOIN bl ON bl.blocked = sufs.suf
      |  GROUP BY doc_id)
      |SELECT h.doc_id, h.host,
      |  COALESCE(m.blocked_by, '') AS blocked_by,
      |  CAST(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_blocked
      |FROM hosted h LEFT JOIN m ON m.doc_id = h.doc_id
      |ORDER BY h.doc_id""".stripMargin),
    "Hierarchical URL blocklist filter: label-suffix-chain explode + " +
      "equi-join (subdomain and TLD blocking without LIKE scans), most-" +
      "specific match reported")

  /** [[Dedup.urlDedup]] over [[Featurize.canonicalizeUrl]]: the
    * URL-identity dedup every web corpus runs before content hashing.
    * URLs are synthesized q111-style — deterministic variants of the
    * same canonical page (scheme/host case, `www.`, explicit default
    * ports, `utm_*` params, fragments, trailing slashes) around a page
    * key of `doc_id div 3`, with `:8080` and `?id=` variants that must
    * NOT collapse (different origin / different meaningful query) — so
    * the canonicalizer is exercised in both directions.
    */
  val q117_url_canonical_dedup: QueryDef = QueryDef(
    "q117_url_canonical_dedup",
    (s, d) => {
      val page = expr("doc_id div 3").cast(StringType)
      val schemes = array(lit("https://"), lit("http://"), lit("HTTPS://"),
        lit("HTTP://"))
      val wwws = array(lit("www."), lit(""), lit(""))
      val ports = array(lit(""), lit(":443"), lit(":80"), lit(":8080"))
      val queries = array(lit(""), lit("?utm_source=feed"),
        lit("?utm_campaign=x&utm_medium=y"),
        concat(lit("?id="), page), concat(lit("?utm_source=a&id="), page))
      val url = concat(
        element_at(schemes, (col("doc_id") % 4 + 1).cast(IntegerType)),
        element_at(wwws, (col("doc_id") % 3 + 1).cast(IntegerType)),
        when(col("doc_id") % 2 === 0, "Site-").otherwise("site-"),
        col("source"), lit(".com"),
        element_at(ports, (col("doc_id") % 4 + 1).cast(IntegerType)),
        lit("/p/"), page,
        when(col("doc_id") % 2 === 1, "/").otherwise(""),
        element_at(queries, (col("doc_id") % 5 + 1).cast(IntegerType)),
        when(col("doc_id") % 2 === 0, "#sec").otherwise(""))
      Dedup.urlDedup(
          Tables.documents(s, d).withColumn("url", url), "doc_id", "url")
        .orderBy("doc_id")
    },
    Some(s"""WITH urled AS (
      |  SELECT doc_id,
      |    list_extract(list_value('https://','http://','HTTPS://','HTTP://'), CAST(doc_id % 4 AS INT) + 1) ||
      |    list_extract(list_value('www.','',''), CAST(doc_id % 3 AS INT) + 1) ||
      |    CASE WHEN doc_id % 2 = 0 THEN 'Site-' ELSE 'site-' END ||
      |    source || '.com' ||
      |    list_extract(list_value('',':443',':80',':8080'), CAST(doc_id % 4 AS INT) + 1) ||
      |    '/p/' || CAST(CAST(floor(doc_id / 3) AS BIGINT) AS STRING) ||
      |    CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END ||
      |    list_extract(list_value('','?utm_source=feed','?utm_campaign=x&utm_medium=y',
      |     '?id=' || CAST(CAST(floor(doc_id / 3) AS BIGINT) AS STRING),
      |     '?utm_source=a&id=' || CAST(CAST(floor(doc_id / 3) AS BIGINT) AS STRING)), CAST(doc_id % 5 AS INT) + 1) ||
      |    CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END AS url
      |  FROM documents),
      |hosted AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(regexp_extract(url, '${Featurize.hostPattern}', 1)),
      |      '^www\\.', '') AS host,
      |    regexp_extract(url,
      |      '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)?[^/:?#]+(.*)${"$"}', 1) AS rest
      |  FROM urled),
      |np AS (
      |  SELECT doc_id, host,
      |    CASE WHEN regexp_matches(nof, '^:(?:80|443)(/|\\?|${"$"})')
      |         THEN regexp_replace(nof, '^:(?:80|443)', '')
      |         ELSE nof END AS r
      |  FROM (SELECT doc_id, host,
      |          regexp_replace(rest, '#.*${"$"}', '') AS nof
      |        FROM hosted)),
      |pq AS (
      |  SELECT doc_id, host,
      |    regexp_replace(regexp_replace(r, '\\?.*${"$"}', ''), '/${"$"}', '') AS path,
      |    regexp_extract(r, '\\?(.*)${"$"}', 1) AS q
      |  FROM np),
      |canon AS (
      |  SELECT doc_id,
      |    host || path || CASE WHEN kq = '' THEN '' ELSE '?' || kq END AS canonical_url
      |  FROM (SELECT doc_id, host, path,
      |    COALESCE(array_to_string(list_filter(string_split(q, '&'),
      |      x -> substr(x, 1, 4) <> 'utm_'), '&'), '') AS kq
      |  FROM pq)),
      |grp AS (SELECT canonical_url, MIN(doc_id) AS keeper_id
      |  FROM canon GROUP BY canonical_url)
      |SELECT c.doc_id, c.canonical_url,
      |  CAST(g.keeper_id AS BIGINT) AS keeper_id,
      |  CAST(CASE WHEN c.doc_id = g.keeper_id THEN 1 ELSE 0 END AS BIGINT) AS is_keep
      |FROM canon c JOIN grp g ON c.canonical_url = g.canonical_url
      |ORDER BY c.doc_id""".stripMargin),
    "URL canonicalization dedup: scheme/www/case/default-port/utm/" +
      "fragment/trailing-slash normalization (pure regexp chain), " +
      "min-id keeper per canonical page, per-doc audit output")

  /** [[Sampling.temperatureMix]] — Gopher/Llama-style α = 1/2 source
    * balancing over the natural language imbalance of the documents
    * table (en ≈ 2.7× de): keep min(n, 10·⌊√n⌋) docs per language via
    * the hash-ranked subset. base = 10 exercises BOTH branches at the
    * graded SFs (en caps; the small languages keep everything when
    * n ≤ 100). The exact-isqrt correction makes the rule replayable with
    * zero tolerance — the oracle pins the kept set by id digest.
    */
  val q113_temperature_mix: QueryDef = QueryDef(
    "q113_temperature_mix",
    (s, d) => {
      Sampling.temperatureMix(Tables.documents(s, d), "doc_id", "lang",
          base = 10)
        .groupBy("lang")
        .agg(max("n_docs").cast(LongType).as("n_candidates"),
          max("cap").cast(LongType).as("cap"),
          sum("kept").cast(LongType).as("n_kept"),
          sum(when(col("kept") === 1L, col("doc_id"))).cast(LongType)
            .as("kept_id_digest"))
        .orderBy("lang")
    },
    Some("""WITH counts AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |isq AS (
      |  SELECT lang, n_docs,
      |    r - CASE WHEN r * r > n_docs THEN 1 ELSE 0 END
      |      + CASE WHEN (r + 1) * (r + 1) <= n_docs THEN 1 ELSE 0 END AS isq
      |  FROM (SELECT lang, n_docs,
      |          CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS r
      |        FROM counts) t),
      |caps AS (SELECT lang, n_docs, LEAST(n_docs, 10 * isq) AS cap FROM isq),
      |ranked AS (
      |  SELECT d.doc_id, d.lang, c.n_docs, c.cap,
      |    row_number() OVER (PARTITION BY d.lang ORDER BY
      |      CAST(('0x' || substr(md5(CAST(d.doc_id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0,
      |      d.doc_id) AS rk
      |  FROM documents d JOIN caps c USING (lang))
      |SELECT lang,
      |  CAST(MAX(n_docs) AS BIGINT) AS n_candidates,
      |  CAST(MAX(cap) AS BIGINT) AS cap,
      |  CAST(SUM(CASE WHEN rk <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rk <= cap THEN doc_id END) AS BIGINT) AS kept_id_digest
      |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin),
    "Temperature-balanced mixture (α = 1/2 source balancing): sublinear " +
      "per-stratum keep target via exact integer sqrt, hash-ranked kept " +
      "set pinned by digest")

  /** [[Sampling.dupLeakageMatrix]] — the pairwise companion to q103:
    * which source PAIRS share content. Keyed on the 80-char lede hash
    * (the mirror/syndication signal: the corpus has zero cross-source
    * FULL-text dups but 21 shared ledes at sf0.01, so this fingerprint
    * is the one that yields a live gate). Every (src_a, src_b, count)
    * cell value-checked; the oracle runs the same
    * distinct-(fingerprint, source) self-join.
    */
  val q127_dup_leakage_matrix: QueryDef = QueryDef(
    "q127_dup_leakage_matrix",
    (s, d) => Sampling.dupLeakageMatrix(Tables.documents(s, d),
        md5(substring(col("text"), 1, 80)), "source")
      .select(col("src_a"), col("src_b"),
        col("n_shared_contents").cast(LongType).as("n_shared_contents"))
      .orderBy("src_a", "src_b"),
    Some("""WITH hs AS (
      |  SELECT DISTINCT md5(substr(text, 1, 80)) AS h, source AS s FROM documents)
      |SELECT a.s AS src_a, b.s AS src_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared_contents
      |FROM hs a JOIN hs b ON a.h = b.h AND a.s < b.s
      |GROUP BY 1, 2
      |ORDER BY src_a, src_b""".stripMargin),
    "Cross-source duplication leakage matrix on the 80-char lede hash: " +
      "which source pairs share content (distinct (fingerprint, source) " +
      "self-join — pair space bounded by source count, never copy count)")

  /** [[Sampling.epochMixture]] over per-source whitespace token counts —
    * the repetition-factor table of a training mixture: the corpus's own
    * token budget reallocated by α = 1/2 weights, each source reporting
    * its target tokens and epochs in ppm. Every value is exact integer
    * arithmetic (isqrt weights, DECIMAL-38/HUGEINT-guarded products), so
    * the whole row set is value-checked with zero tolerance.
    */
  val q138_epoch_mixture: QueryDef = QueryDef(
    "q138_epoch_mixture",
    (s, d) => Sampling.epochMixture(Tables.documents(s, d), "source",
        graft.ops.TextAnalysis.tokenCount(col("text")))
      .select(col("source"), col("n_tokens").cast(LongType).as("n_tokens"),
        col("weight_ppm").cast(LongType).as("weight_ppm"),
        col("target_tokens"), col("epochs_ppm"))
      .orderBy("source"),
    Some("""WITH counts AS (
      |  SELECT source,
      |    SUM(len(regexp_extract_all(text, '(\S+)', 1))) AS n_tokens
      |  FROM documents GROUP BY source),
      |isq AS (
      |  SELECT source, n_tokens,
      |    r - CASE WHEN r * r > n_tokens THEN 1 ELSE 0 END
      |      + CASE WHEN (r + 1) * (r + 1) <= n_tokens THEN 1 ELSE 0 END AS isq
      |  FROM (SELECT source, n_tokens,
      |          CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS r
      |        FROM counts) t),
      |tot AS (SELECT SUM(n_tokens) AS budget, SUM(isq) AS isq_sum FROM isq)
      |SELECT source,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CASE WHEN (SELECT isq_sum FROM tot) = 0 THEN CAST(0 AS BIGINT)
      |       ELSE CAST(CAST(floor((1000000 * isq) / (SELECT isq_sum FROM tot)) AS BIGINT) AS BIGINT)
      |  END AS weight_ppm,
      |  CASE WHEN (SELECT isq_sum FROM tot) = 0 THEN CAST(0 AS BIGINT)
      |       ELSE CAST(CAST(floor((CAST((SELECT budget FROM tot) AS DECIMAL(38,0)) * isq)
      |         / (SELECT isq_sum FROM tot)) AS BIGINT) AS BIGINT)
      |  END AS target_tokens,
      |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
      |       ELSE CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
      |           CAST(floor((CAST((SELECT budget FROM tot) AS DECIMAL(38,0)) * isq)
      |             / (SELECT isq_sum FROM tot)) AS BIGINT))
      |         / n_tokens) AS BIGINT) AS BIGINT)
      |  END AS epochs_ppm
      |FROM isq
      |ORDER BY source""".stripMargin),
    "Epoch-aware token-budget mixture (α = 1/2 temperature weights over " +
      "per-source token counts): target tokens + repetition factor in " +
      "exact ppm — the published-mixture-table shape, overflow-guarded " +
      "to 100 TB token counts")

  /** [[Sampling.weightedSample]]: length-weighted priority sample —
    * weight = 1 + n_chars/500 capped at 16, 100 winners. The oracle
    * replays the replica fan-out (`unnest(range(w))`), the per-replica
    * seeded md5 keys, and the min-priority pick bit-for-bit; any drift
    * in weight arithmetic, replica numbering, or tie order hash-fails.
    */
  val q184_weighted_sample: QueryDef = QueryDef(
    "q184_weighted_sample",
    (s, d) =>
      Sampling.weightedSample(
        Tables.documents(s, d)
          .withColumn("w", expr("least(1 + n_chars div 500, 16)")),
        "doc_id", "w", seed = "ws1", k = 100),
    Some("""WITH wdoc AS (
      |  SELECT doc_id, LEAST(1 + CAST(floor(n_chars / 500) AS BIGINT), 16) AS weight
      |  FROM documents),
      |reps AS (SELECT doc_id, weight, unnest(range(weight)) AS r FROM wdoc),
      |pri AS (
      |  SELECT doc_id, weight,
      |    min(CAST(('0x' || substr(md5('ws1:' || CAST(doc_id AS STRING)
      |      || ':' || CAST(r AS STRING)), 1, 8)) AS BIGINT)) AS priority
      |  FROM reps GROUP BY doc_id, weight)
      |SELECT doc_id, CAST(weight AS BIGINT) AS weight, priority
      |FROM pri ORDER BY priority, doc_id LIMIT 100""".stripMargin),
    "Weighted sampling without replacement (Efraimidis-Spirakis shape, " +
      "min of w md5 clocks): deterministic, replica-exact oracle")

  /** Curriculum training order — the schedule a curriculum-learning run
    * feeds its data loader: documents bucketed by difficulty (equal-width
    * length deciles here; any score column slots in), shuffled WITHIN
    * each bucket by a seeded md5 clock, and assigned a GLOBAL 1-based
    * training position over the (bucket, clock, doc_id) total order.
    * The global position is the scale-hard part — a corpus-sized
    * row_number is a single-partition sort — so it rides
    * [[graft.ops.GlobalPrefixSum.withRunningSum]]: range-repartition on
    * the order key, per-partition ranks, #partitions-sized boundary
    * offsets broadcast back. Deterministic (pure function of doc_id),
    * so the oracle replays every position with one ROW_NUMBER.
    */
  val q241_curriculum_order: QueryDef = QueryDef(
    "q241_curriculum_order",
    (s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "n_chars")
      val mx = docs.agg(max("n_chars").as("mx"))
      val scored = docs.crossJoin(broadcast(mx))
        .select(col("doc_id"),
          expr("(n_chars * 10) div (mx + 1)").as("bucket"),
          expr("CAST(conv(substring(md5(concat('cur1:', " +
            "CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)").as("hk"))
        .withColumn("one", lit(1L))
      graft.ops.GlobalPrefixSum.withRunningSum(scored,
          Seq("bucket", "hk", "doc_id"), "one", "train_order")
        .select(col("doc_id"),
          col("bucket").cast(LongType).as("difficulty_bucket"),
          col("train_order").cast(LongType).as("train_order"))
        .orderBy("train_order")
    },
    Some("""WITH mx AS (SELECT max(n_chars) AS mx FROM documents),
      |sc AS (
      |  SELECT doc_id, CAST(floor((n_chars * 10) / (mx + 1)) AS BIGINT) AS bucket,
      |    CAST(('0x' || substr(md5('cur1:' || CAST(doc_id AS STRING)),
      |      1, 8)) AS BIGINT) AS hk
      |  FROM documents, mx)
      |SELECT doc_id, CAST(bucket AS BIGINT) AS difficulty_bucket,
      |  CAST(row_number() OVER (ORDER BY bucket, hk, doc_id) AS BIGINT)
      |    AS train_order
      |FROM sc ORDER BY train_order""".stripMargin),
    "Curriculum schedule: difficulty buckets, seeded within-bucket " +
      "shuffle, global training position via the distributed prefix-sum " +
      "rank (no corpus-sized sort partition)")

  /** Deterministic WEIGHTED sampling by integer PRIORITY (the
    * priority-sampling / A-Res family, float-free): each doc draws a
    * seeded 40-bit uniform h from md5 and gets priority
    * ⌊w · 2⁴⁰ / (h+1)⌋ with w = its token count — inclusion odds scale
    * with w (1/h is Pareto-tailed), yet everything is exact integer
    * arithmetic both engines replay bit-for-bit. The sample is the
    * global top-100 by (priority, doc_id): a TakeOrderedAndProject —
    * one scan, k-row heap per partition, no global sort, no shuffle of
    * non-winners — the weighted analogue of q53's stable split for
    * mixture construction at corpus scale.
    */
  val q283_weighted_sample: QueryDef = QueryDef(
    "q283_weighted_sample",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("w"),
          expr("""CAST(conv(substring(md5(concat('wsamp:',
            |CAST(doc_id AS STRING))), 1, 10), 16, 10) AS BIGINT)"""
            .stripMargin).as("h"))
      docs.select(col("doc_id"), col("w"),
          expr("(w * CAST(1099511627776 AS BIGINT)) div (h + 1)")
            .as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(100)
    },
    Some("""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |  CAST(floor((CAST(len(string_split(text, ' ')) AS BIGINT) * 1099511627776)
      |    / (CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS STRING)),
      |        1, 10)) AS BIGINT) + 1)) AS BIGINT) AS priority
      |FROM documents
      |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin),
    "Weighted sampling via integer priority keys (w·2^40 / (h+1)): " +
      "exact md5-seeded arithmetic, TakeOrderedAndProject top-100 — " +
      "no global sort")

  def defs: Seq[QueryDef] = Seq(q283_weighted_sample, q241_curriculum_order,
    q184_weighted_sample, q53_stable_split, q59_sequence_packing,
    q72_shuffle_shards, q91_group_cap, q103_source_curation,
    q110_topic_sample, q111_domain_curation, q113_temperature_mix,
    q117_url_canonical_dedup, q122_blocklist_filter,
    q127_dup_leakage_matrix, q138_epoch_mixture)
}
