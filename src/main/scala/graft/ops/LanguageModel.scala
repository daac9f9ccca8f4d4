package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-gram language-model quality scoring — the KenLM-shaped filter of a
  * training-data pipeline (score every document against a corpus LM and
  * drop the tail), kept fully on the DataFrame layer.
  *
  * The model is a bigram conditional-probability table
  * `(w1, w2, p = c(w1,w2)/c(w1,·))` built with two map-side-combined hash
  * aggregations; scoring is one hash join of document bigrams against the
  * table plus one aggregation. At 100 TB the LM table is itself a big
  * frame — the join keys on (w1, w2), whose LM side is UNIQUE per key, so
  * AQE broadcasts it when pruned/small and shuffle-hash-joins otherwise;
  * nothing touches the driver.
  *
  * Determinism/parity rules (same as the q38 embedding pipeline): each
  * per-bigram probability is a single IEEE division (exactly rounded,
  * engine-identical), summation happens in DECIMAL(28,12) (exact, order-
  * independent — Spark's parallel partial aggregation and a sequential
  * engine agree bit-for-bit), and the final average is floor-ppm'd.
  */
object LanguageModel {

  /** Per-document bigram rows `(id, w1, w2)` over whitespace-split tokens,
    * as an array zip — no positional self-join, no shuffle, codegen'd.
    * Empty tokens (double/trailing separators) are dropped on both the
    * model and scoring sides so separator quirks can't skew the LM.
    */
  def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), n1),
      slice(toks, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    df.select(col(idCol), explode(bigrams).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Bigram MLE model over the corpus: `(w1, w2, p)` with
    * p = c(w1,w2) / c(w1,·) as a DOUBLE in (0, 1]. Two hash aggs (both
    * map-side combined) + one join on w1; context counts derive from the
    * bigram table itself, so Σ_w2 p(w2|w1) = 1 exactly.
    */
  def bigramLm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigramRows(df, idCol, textCol)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        (col("c2").cast(DoubleType) / col("c1")).as("p"))
  }

  /** Scores each document against `lm`: `(id, n_bigrams, avg_p_ppm)` where
    * avg_p_ppm = floor(10⁶ · mean conditional probability of the doc's
    * bigrams under the model). Bigrams absent from the LM contribute 0
    * (an unseen transition is the strongest low-quality signal) — the
    * left join + coalesce keeps them in the denominator. Documents with
    * fewer than two tokens have no bigrams and are not scored.
    */
  def scoreAvgCondProb(
      df: DataFrame, idCol: String, textCol: String, lm: DataFrame): DataFrame =
    bigramRows(df, idCol, textCol)
      .join(lm, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("p"), lit(0.0)).cast(DecimalType(28, 12))).as("_s"))
      .select(col(idCol), col("n_bigrams"),
        floor(lit(1000000) * (col("_s").cast(DoubleType) / col("n_bigrams")))
          .cast(LongType).as("avg_p_ppm"))
}
