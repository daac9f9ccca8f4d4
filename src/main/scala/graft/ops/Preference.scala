package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise-preference aggregation — the RLHF/data-curation primitive of
  * turning per-rater A-vs-B outcomes into item ratings (Bradley–Terry
  * model, minorization–maximization updates).
  *
  * Reference behavior: none — the POC has no preference machinery; this
  * is north-star surface for training-data pipelines (preference-pair
  * quality ranking, annotator-agreement weighting).
  *
  * Exactness contract (the house rule for cross-engine oracles): every
  * update runs in integer ppm arithmetic. Division uses the exact
  * portable idiom floor(a/b) = round((a − a%b)/b): subtraction and
  * modulo stay exact in DECIMAL(38,0), the divided numerator is exactly
  * divisible, and round() absorbs the double conversion's ulp noise —
  * exact whenever the QUOTIENT is below ~2^51, independent of numerator
  * width. The same spelling runs in Spark and DuckDB, so the oracle can
  * replay the iteration bit-for-bit.
  *
  * 100 TB shape: the only corpus-sized work is the rater×item utility
  * aggregation (one map-side-combinable hash agg) and the per-rater
  * pairing (bounded by items² per rater, never rater×rater). Everything
  * after — the wins matrix and the MM iterations — lives on frames
  * bounded by items², independent of the corpus.
  */
object Preference {

  /** Exact portable floor division (non-negative operands). */
  def pfdiv(a: String, b: String): String =
    s"CAST(round(CAST(($a) - (($a) % ($b)) AS DOUBLE) " +
      s"/ CAST(($b) AS DOUBLE)) AS BIGINT)"

  private val W = "CAST(1000000000000 AS DECIMAL(38,0))" // 1e12 guard

  /** One MM update in ppm ints, as (SQL-expressible) formula pieces —
    * shared verbatim by the DataFrame path and the oracle text so the
    * floors land identically.
    *
    *   t_ij   = ⌊1e12·g_ij / (p_i + p_j)⌋      g = games between i and j
    *   praw_i = ⌊1e12·W_i / Σ_j t_ij⌋          W = total wins of i
    *   p'_i   = ⌊k·1e6·praw_i / Σ_j praw_j⌋    renormalized to k·1e6
    */
  private[graft] def tExpr: String =
    s"CASE WHEN pi + pj = 0 THEN 0 " +
      s"ELSE ${pfdiv(s"$W * g", "(pi + pj)")} END"
  private[graft] def prawExpr: String =
    s"CASE WHEN denom = 0 THEN p ELSE ${pfdiv(s"$W * wins", "denom")} END"
  private[graft] def renormExpr(nItems: Int): String =
    s"CASE WHEN total = 0 THEN 0 ELSE " +
      pfdiv(s"CAST(${nItems}000000 AS DECIMAL(38,0)) * praw", "total") +
      " END"

  /** Derive the ordered wins matrix from per-(rater, item) utilities:
    * for every rater and unordered item pair present for that rater, the
    * higher utility wins; ties go to the lexicographically smaller item
    * (deterministic — no row-order dependence). Output: (item, rival,
    * wins) for wins > 0, plus the symmetric games count via union.
    */
  def winsMatrix(utilities: DataFrame): DataFrame = {
    val a = utilities.select(col("rater"), col("item").as("ia"),
      col("w").as("wa"))
    val b = utilities.select(col("rater"), col("item").as("ib"),
      col("w").as("wb"))
    a.join(b, Seq("rater")).filter(col("ia") < col("ib"))
      .select(
        when(col("wa") >= col("wb"), col("ia")).otherwise(col("ib"))
          .as("item"),
        when(col("wa") >= col("wb"), col("ib")).otherwise(col("ia"))
          .as("rival"))
      .groupBy("item", "rival").agg(count(lit(1)).as("wins"))
  }

  /** MM-iterate ratings from the ordered wins matrix. `iters` unrolled
    * joins, every frame items²-bounded. Returns (item, wins, games,
    * rating_ppm) ordered by rating desc, item.
    */
  def bradleyTerry(winsM: DataFrame, iters: Int = 3): DataFrame = {
    val spark = winsM.sparkSession
    val wm = winsM.select(col("item"), col("rival"),
      col("wins").cast(LongType).as("wins")).localCheckpoint(true)
    // symmetric games per unordered pair, carried on both ordered rows
    val games = wm.select(col("item"), col("rival"), col("wins"))
      .unionByName(wm.select(col("rival").as("item"),
        col("item").as("rival"), lit(0L).as("wins")))
      .groupBy("item", "rival").agg(sum("wins").as("w_ij"))
    val pairs = games.alias("x").join(
        games.select(col("item").as("rival"), col("rival").as("item"),
          col("w_ij").as("w_ji")).alias("y"),
        Seq("item", "rival"), "left")
      .select(col("item"), col("rival"), col("w_ij"),
        (col("w_ij") + coalesce(col("w_ji"), lit(0L))).as("g"))
      .localCheckpoint(true)
    val totals = pairs.groupBy("item")
      .agg(sum("w_ij").cast(LongType).as("wins"),
        sum("g").cast(LongType).as("games"))
    val nItems = totals.count().toInt
    var p = totals.select(col("item"), lit(1000000L).as("p"))
    (0 until iters).foreach { _ =>
      val t = pairs
        .join(p.select(col("item"), col("p").as("pi")), Seq("item"))
        .join(p.select(col("item").as("rival"), col("p").as("pj")),
          Seq("rival"))
        .selectExpr("item", s"$tExpr AS t")
        .groupBy("item").agg(sum("t").cast(LongType).as("denom"))
      val praw = totals.join(t, Seq("item"))
        .join(p, Seq("item"))
        .selectExpr("item", s"$prawExpr AS praw")
      val total = praw.agg(sum("praw").cast(LongType).as("total"))
      p = praw.crossJoin(broadcast(total))
        .selectExpr("item", s"${renormExpr(nItems)} AS p")
        .localCheckpoint(true)
    }
    totals.join(p, Seq("item"))
      .select(col("item"), col("wins"), col("games"),
        col("p").as("rating_ppm"))
      .orderBy(col("rating_ppm").desc, col("item"))
  }
}
