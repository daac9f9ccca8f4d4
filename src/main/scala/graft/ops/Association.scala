package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Market-basket association mining — pairwise rules (support /
  * confidence / lift), the co-occurrence analytics every commerce or
  * content pipeline runs over baskets (orders, sessions, documents).
  *
  * Scale shape: baskets are deduped to (basket, item) sets, the pair
  * space is generated per basket by a self-equi-join on the basket key —
  * quadratic in BASKET SIZE, linear in basket count — and `maxBasketSize`
  * is the skew guard: one degenerate 10⁵-item basket would be 10¹⁰ pairs,
  * so oversized baskets are dropped whole (standard practice — a basket
  * that large carries no associative signal; the cap follows the same
  * groupBy + anti-join no-straggler shape as the LSH bucket caps). All
  * ratios are exact floor-ppm integers (lift's 10⁶·N·c product in
  * DECIMAL(38,0) — BIGINT would overflow at 100 TB basket counts).
  */
object Association {

  /** Pairwise rules over `(basketCol, itemCol)` rows. Returns one row per
    * unordered item pair (item_a < item_b) with co-occurrence `support ≥
    * minSupport`: both direction confidences and the lift, in floor-ppm.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2, maxBasketSize: Long = 1024): DataFrame = {
    val b0 = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val hot = b0.groupBy("basket").agg(count(lit(1)).as("_bs"))
      .filter(col("_bs") > maxBasketSize)
      .select("basket")
    val b = b0.join(hot, Seq("basket"), "left_anti")
    val itemN = b.groupBy("item").agg(count(lit(1)).as("n_item"))
    val total = b.select("basket").distinct().agg(count(lit(1)).as("n_baskets"))
    val x = b.select(col("basket"), col("item").as("item_a"))
    val y = b.select(col("basket").as("basket_b"), col("item").as("item_b"))
    x.join(y, col("basket") === col("basket_b") && col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .join(itemN.select(col("item").as("item_a"), col("n_item").as("n_a")), Seq("item_a"))
      .join(itemN.select(col("item").as("item_b"), col("n_item").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"),
        col("support").cast(LongType).as("support"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * support) div n_a AS BIGINT)")
          .as("conf_a_b_ppm"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * support) div n_b AS BIGINT)")
          .as("conf_b_a_ppm"),
        // the denominator needs the same DECIMAL(38) guard as the
        // numerator: a raw BIGINT n_a*n_b silently wraps past ~9.2e18
        // (two 3e9-count items already overflow)
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_baskets * support) " +
          "div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_ppm"))
  }
}
