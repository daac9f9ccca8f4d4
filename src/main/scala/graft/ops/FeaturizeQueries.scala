package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-parity query for the featurization family ([[Featurize]]):
  * hashing-trick TF and a TF-IDF digest, replayed exactly in DuckDB via
  * the md5 bucket hash. The idf digest uses RATIONAL math — floor(10⁶·N/df)
  * — instead of ln(): a single integer-derived division + floor is
  * engine-exact, while libm `log` is not guaranteed correctly rounded
  * across implementations (the production [[Featurize.tfIdf]] keeps the
  * standard smoothed-ln weighting; this digest pins everything AROUND the
  * ln — tokenization, bucketing, tf, df, N — which is where engine drift
  * actually lives).
  */
object FeaturizeQueries {

  val q60_hashing_tfidf: QueryDef = QueryDef(
    "q60_hashing_tfidf",
    (s, d) => {
      val nFeat = 1024
      val tf = Featurize.hashingTf(Tables.documents(s, d), "doc_id", "text", nFeat)
      val dfreq = tf.groupBy("bucket").agg(countDistinct("id").as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val perDoc = tf
        .withColumn("mx", max("tf").over(Window.partitionBy("id")))
        .groupBy("id")
        .agg(
          count(lit(1)).as("n_buckets"),
          sum("tf").cast(LongType).as("tf_sum"),
          min(when(col("tf") === col("mx"), col("bucket"))).as("top_bucket"))
      val digest = tf.join(broadcast(dfreq), Seq("bucket"))
        .crossJoin(broadcast(nDocs))
        .groupBy("id")
        .agg(sum(col("tf") *
          floor(col("n_docs").cast(DoubleType) * 1000000.0 / col("df")))
          .cast(LongType).as("tfidf_digest"))
      perDoc.join(digest, Seq("id"))
        .select(col("id").as("doc_id"), col("n_buckets"), col("tf_sum"),
          col("top_bucket"), col("tfidf_digest"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS bucket,
      |    COUNT(*) AS tf
      |  FROM tok GROUP BY doc_id, bucket),
      |dfreq AS (SELECT bucket, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY bucket),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |mx AS (
      |  SELECT doc_id, bucket, tf, MAX(tf) OVER (PARTITION BY doc_id) AS m
      |  FROM tf),
      |per_doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_buckets,
      |    CAST(SUM(tf) AS BIGINT) AS tf_sum,
      |    MIN(CASE WHEN tf = m THEN bucket END) AS top_bucket
      |  FROM mx GROUP BY doc_id),
      |dig AS (
      |  SELECT t.doc_id,
      |    CAST(SUM(t.tf * FLOOR(CAST(n.n_docs AS DOUBLE) * 1000000.0 / f.df)) AS BIGINT)
      |      AS tfidf_digest
      |  FROM tf t JOIN dfreq f ON t.bucket = f.bucket CROSS JOIN n
      |  GROUP BY t.doc_id)
      |SELECT p.doc_id, p.n_buckets, p.tf_sum, p.top_bucket, g.tfidf_digest
      |FROM per_doc p JOIN dig g ON p.doc_id = g.doc_id
      |ORDER BY p.doc_id""".stripMargin),
    "Hashing-trick TF + rational TF-IDF digest (sparse-as-rows featurizer, " +
      "md5 buckets replayed in DuckDB)")

  /** [[Featurize.hashedLinearScore]] over documents — model-based quality
    * filtering in its inference shape (fastText-style linear scorer over
    * hashed unigrams), per-doc (n_tokens, score, keep) all value-checked:
    * the md5-derived weight makes the "model" portable, so the oracle
    * replays the exact dot product.
    */
  val q139_quality_classifier: QueryDef = QueryDef(
    "q139_quality_classifier",
    (s, d) => Featurize.hashedLinearScore(Tables.documents(s, d), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
        col("score").cast(LongType).as("score"), col("keep"))
      .orderBy("doc_id"),
    Some("""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    SUM(CAST(('0x' || substr(md5('qw' || w), 1, 4)) AS BIGINT) % 16 - 8)
      |      AS score
      |  FROM tok GROUP BY doc_id)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(score AS BIGINT) AS score,
      |  CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM scored ORDER BY doc_id""".stripMargin),
    "fastText-shaped linear quality classifier: md5-hashed unigram " +
      "weights in [-8,8), per-doc score + keep gate, pure codegen " +
      "expression chain (no UDF, no join, no window)")

  /** [[Featurize.perceptronTrain]] over documents — the TRAINING half of
    * the model-based-curation loop whose inference half is q139: batch
    * perceptron (η = 1, integer-exact), hashed-unigram counts + bias,
    * self-supervised labels (y = +1 iff ≥ 56 tokens, the corpus median),
    * 3 epochs. The oracle unrolls every epoch as CTEs: epoch 1 is the
    * closed form Σ y·c (w = 0 misclassifies everything), epochs 2-3
    * replay margin → misclassified-set → gradient → weight update with
    * full-outer weight merges. A single wrong margin sign in either
    * engine cascades into different misclassified sets and hash-fails.
    */
  val q143_perceptron_train: QueryDef = QueryDef(
    "q143_perceptron_train",
    (s, d) => Featurize.perceptronTrain(Tables.documents(s, d), "doc_id", "text")
      .orderBy("bucket"),
    Some("""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |feat0 AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 64 AS bucket,
      |    COUNT(*) AS cnt
      |  FROM tok GROUP BY 1, 2),
      |lab AS (
      |  SELECT doc_id, CASE WHEN SUM(cnt) >= 56 THEN 1 ELSE -1 END AS y
      |  FROM feat0 GROUP BY doc_id),
      |base AS (
      |  SELECT f.doc_id, f.bucket, f.cnt, l.y
      |  FROM (SELECT doc_id, bucket, cnt FROM feat0
      |        UNION ALL SELECT doc_id, -1, 1 FROM lab) f
      |  JOIN lab l ON f.doc_id = l.doc_id),
      |w1 AS (
      |  SELECT bucket, SUM(y * cnt) AS wt FROM base GROUP BY bucket),
      |m2 AS (
      |  SELECT b.doc_id, b.y, SUM(b.cnt * COALESCE(w1.wt, 0)) AS margin
      |  FROM base b LEFT JOIN w1 ON b.bucket = w1.bucket
      |  GROUP BY b.doc_id, b.y),
      |g2 AS (
      |  SELECT b.bucket, SUM(b.y * b.cnt) AS g
      |  FROM base b JOIN m2 ON b.doc_id = m2.doc_id
      |  WHERE m2.y * m2.margin <= 0 GROUP BY b.bucket),
      |w2 AS (
      |  SELECT COALESCE(w1.bucket, g2.bucket) AS bucket,
      |    COALESCE(w1.wt, 0) + COALESCE(g2.g, 0) AS wt
      |  FROM w1 FULL OUTER JOIN g2 ON w1.bucket = g2.bucket),
      |m3 AS (
      |  SELECT b.doc_id, b.y, SUM(b.cnt * COALESCE(w2.wt, 0)) AS margin
      |  FROM base b LEFT JOIN w2 ON b.bucket = w2.bucket
      |  GROUP BY b.doc_id, b.y),
      |g3 AS (
      |  SELECT b.bucket, SUM(b.y * b.cnt) AS g
      |  FROM base b JOIN m3 ON b.doc_id = m3.doc_id
      |  WHERE m3.y * m3.margin <= 0 GROUP BY b.bucket),
      |w3 AS (
      |  SELECT COALESCE(w2.bucket, g3.bucket) AS bucket,
      |    COALESCE(w2.wt, 0) + COALESCE(g3.g, 0) AS wt
      |  FROM w2 FULL OUTER JOIN g3 ON w2.bucket = g3.bucket)
      |SELECT r.bucket, CAST(COALESCE(w3.wt, 0) AS BIGINT) AS weight
      |FROM (SELECT unnest(range(-1, 64)) AS bucket) r
      |LEFT JOIN w3 ON r.bucket = w3.bucket
      |ORDER BY r.bucket""".stripMargin),
    "Batch perceptron training of the q139-shaped linear quality " +
      "classifier: integer-exact epochs, literal-map model broadcast")

  /** Classifier CALIBRATION curve (reliability diagram) — the ML-eval
    * row the train/infer pair (q143/q139) lacked: q139's linear scores
    * bucketed into fixed-width bins (width 32, portable floor for
    * negative scores), each bin reporting observed positive rate
    * (label = q143's self-supervised n_tokens ≥ 56) and mean score,
    * both in exact floor-ppm. A calibrated scorer shows pos_rate
    * rising monotonically with the bin — the curve a quality-filter
    * threshold is read from. One corpus pass (the q139 expression
    * chain) + one hash agg; bins are value-domain-bounded.
    */
  val q282_calibration_curve: QueryDef = QueryDef(
    "q282_calibration_curve",
    (s, d) => {
      val scored = Featurize.hashedLinearScore(
        Tables.documents(s, d), "doc_id", "text")
      scored
        .withColumn("pos", when(col("n_tokens") >= 56, 1L).otherwise(0L))
        .withColumn("bin", expr("CASE WHEN score >= 0 THEN score div 32 " +
          "ELSE -((-score + 31) div 32) END"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
          sum("score").as("sum_score"))
        .select(col("bin").cast(LongType).as("bin"),
          col("n").cast(LongType).as("n"),
          col("n_pos").cast(LongType).as("n_pos"),
          expr("(1000000 * n_pos) div n").cast(LongType)
            .as("pos_rate_ppm"),
          expr("CAST(CASE WHEN sum_score >= 0 THEN " +
            "(1000000 * sum_score) div n " +
            "ELSE -((-(1000000 * sum_score) + n - 1) div n) END " +
            "AS BIGINT)").as("mean_score_ppm"))
        .orderBy("bin")
    },
    Some("""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    SUM(CAST(('0x' || substr(md5('qw' || w), 1, 4)) AS BIGINT)
      |      % 16 - 8) AS score
      |  FROM tok GROUP BY doc_id),
      |b AS (
      |  SELECT CASE WHEN score >= 0 THEN CAST(floor(score / 32) AS BIGINT)
      |    ELSE -(CAST(floor((-score + 31) / 32) AS BIGINT)) END AS bin,
      |    CASE WHEN n_tokens >= 56 THEN 1 ELSE 0 END AS pos, score
      |  FROM scored)
      |SELECT CAST(bin AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(pos) AS BIGINT) AS n_pos,
      |  CAST(CAST(floor((1000000 * sum(pos)) / count(*)) AS BIGINT) AS BIGINT) AS pos_rate_ppm,
      |  CAST(CASE WHEN sum(score) >= 0 THEN
      |      CAST(floor((1000000 * sum(score)) / count(*)) AS BIGINT)
      |    ELSE -(CAST(floor((-(1000000 * sum(score)) + count(*) - 1) / count(*)) AS BIGINT))
      |    END AS BIGINT) AS mean_score_ppm
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin),
    "Classifier calibration curve: fixed-width score bins × observed " +
      "positive rate in exact floor-ppm — the reliability diagram for " +
      "the q139/q143 quality filter")

  def defs: Seq[QueryDef] = Seq(q282_calibration_curve,
    q60_hashing_tfidf, q139_quality_classifier,
    q143_perceptron_train)
}
