package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Train/eval contamination detection (north-star): flag evaluation
  * documents whose word n-grams collide with the training corpus — the
  * standard decontamination check run before any benchmark number is
  * trusted (13-gram overlap is the published GPT-3-era convention).
  *
  * Scale shape: n-grams form inside each doc's own token array and
  * explode — a single narrow pass, no shuffle at all until the gram join
  * itself. The join is eval-grams against DISTINCT train-grams:
  * the train side collapses before the shuffle (distinct grams ≪ gram
  * instances on a deduped corpus), and only colliding grams flow to the
  * final per-doc aggregation. At 100 TB the distinct-train-gram table is
  * the persistable artifact (like the LSH bucket index), rebuilt only
  * when the training corpus changes.
  */
object Contamination {

  /** (id, gram) word n-grams; grams shorter than `n` never emit (the
    * concat null-propagates through missing leads).
    */
  private[ops] def wordGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, "n-gram size must be at least 2")
    // grams form per row via the codegen'd regex and explode — zero
    // shuffles; the old posexplode + (n−1)-lead-window form paid a full
    // exchange+sort of every token (guide §2.4: remove shuffles outright)
    df.select(col(idCol).as("id"),
      explode(Dedup.gramMatches(col(textCol), n)).as("gram"))
  }

  /** Per-eval-doc contamination report: total grams, colliding grams, and
    * the collision fraction as floor(10⁶·hit/total) ("ppm"). Every eval
    * doc keeps a row — zero-gram docs (shorter than n words) report 0/0/0
    * rather than disappearing.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    val trainGrams = wordGrams(train, idCol, textCol, n)
      .select("gram").distinct()
    report(eval, wordGrams(eval, idCol, textCol, n), trainGrams, idCol)
  }

  /** The Bloom-prefiltered form of [[ngramOverlap]] — the 100 TB shape
    * when the training corpus is the huge side: build a Bloom filter
    * over the (small) EVAL gram set, broadcast it in the task closure,
    * and map-side-prune train grams before the distinct + semi-join, so
    * the train side shuffles only grams that MIGHT collide instead of
    * the whole corpus' gram set. Bloom filters have no false negatives,
    * so the report is bit-identical to [[ngramOverlap]]'s — false
    * positives only cost shuffle bytes, bounded by `fpp`.
    *
    * The filter is keyed on `xxhash64(gram)` — both the build and the
    * probe hash through the codegen'd built-in — and the probe itself is
    * the native [[graft.functions.BloomMightContainLong]] expression:
    * one primitive `mightContainLong` call per train gram inside
    * WholeStageCodegen, no UDF boxing in the innermost loop of the scale
    * path. Hashing first cannot introduce false negatives (equal grams
    * hash equal); collisions only add false positives, which the exact
    * semi-join in [[report]] re-checks anyway.
    */
  def ngramOverlapBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 13, fpp: Double = 0.01): DataFrame = {
    val evalGrams = wordGrams(eval, idCol, textCol, n)
    // persist: the distinct hash set feeds two driver jobs (count, then
    // the bloom build) — without it the regex gram pass
    // (Dedup.gramMatches) + hash + distinct runs twice
    val distinctEval = evalGrams.select(xxhash64(col("gram")).as("gh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf =
      try distinctEval.stat.bloomFilter("gh",
        math.max(distinctEval.count(), 1L), fpp)
      finally distinctEval.unpersist(blocking = false)
    import org.apache.spark.sql.GraftRegistrar
    val mightHit = GraftRegistrar.column(
      graft.functions.BloomMightContainLong(
        GraftRegistrar.expression(xxhash64(col("gram"))), bf))
    val prunedTrainGrams = wordGrams(train, idCol, textCol, n)
      .filter(mightHit)
      .select("gram").distinct()
    report(eval, evalGrams, prunedTrainGrams, idCol)
  }

  /** Per-doc contamination report shared by the exact and Bloom paths:
    * any train-gram superset of (train ∩ eval) produces the identical
    * result, because the semi-join re-checks exact equality.
    */
  /** SPAN-level decontamination — the surgical form of [[ngramOverlap]]:
    * instead of flagging whole documents, mark exactly the token
    * positions covered by any n-gram that also appears in `bench`, and
    * report per doc how much text a span-removal pass would cut
    * (`n_removed` tokens in `n_spans` maximal runs, `n_kept` remaining).
    * This is the published GPT-3/PaLM decontamination shape: benchmark
    * text is excised from training documents, not used to drop them —
    * dropping a 100k-token page over one quoted test question wastes the
    * other 99.9%.
    *
    * Scale shape: the bench gram set collapses to DISTINCT before the
    * shuffle; train grams semi-join against it so only HITS flow onward
    * (contamination volume, not corpus volume). Covered positions are a
    * bounded n× explode of hits; the span count is one lag() window over
    * covered positions only — per-doc, tiny partitions. Uncontaminated
    * docs report zeros via the left join, never disappear.
    */
  def spanDecontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    require(n >= 2, "n-gram size must be at least 2")
    val benchGrams = wordGrams(bench, idCol, textCol, n)
      .select("gram").distinct()
    // positional grams via the codegen'd regex (match ordinal = gram
    // start position); token counts from the split size — neither pays
    // the old lead-window token shuffle
    val grams = train
      .select(col(idCol).as("id"),
        posexplode(Dedup.gramMatches(col(textCol), n)).as(Seq("i", "gram")))
    val covered = grams.join(benchGrams, Seq("gram"), "left_semi")
      .select(col("id"),
        explode(sequence(col("i"), col("i") + (n - 1))).as("t"))
      .distinct()
    val spans = covered
      .withColumn("pt", lag("t", 1).over(Window.partitionBy("id").orderBy("t")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_removed"),
        sum(when(col("pt").isNull || col("pt") =!= col("t") - 1, 1L)
          .otherwise(0L)).as("n_spans"))
    train
      .select(col(idCol).as("id"), split(col(textCol), " ").as("_s"))
      .filter(col("_s").isNotNull)
      .groupBy("id").agg(sum(size(col("_s"))).as("n_tokens"))
      .join(spans, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (col("n_tokens") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
  }

  private def report(eval: DataFrame, evalGrams: DataFrame,
      trainGrams: DataFrame, idCol: String): DataFrame = {
    val hits = evalGrams
      .join(trainGrams, Seq("gram"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    val totals = evalGrams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    eval.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        floor(coalesce(col("n_hit"), lit(0L)).cast(DoubleType) * 1000000.0 /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)))
          .cast(LongType).as("hit_ppm"))
  }
}
