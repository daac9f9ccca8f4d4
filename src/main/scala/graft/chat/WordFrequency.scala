package graft.chat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-frequency top-k — the reference's latent GET /analyze/{file}
  * endpoint, implemented from the frontend contract (count-descending map,
  * client slices the first 10): SURVEY.md §2.5 A5 / §2.6 L4;
  * /root/reference/frontend/src/components/Formgibui.jsx:63-83.
  *
  * orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
  * then a k-row merge on the driver) — no global sort at any scale.
  */
object WordFrequency {

  /** msgs: any frame with a `message` column. Ties broken by word for
    * determinism (the reference's dict order is insertion order).
    */
  def top(msgs: DataFrame, k: Int = 10): DataFrame =
    msgs
      .select(explode(split(col("message"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("word"))
      .limit(k)
}
