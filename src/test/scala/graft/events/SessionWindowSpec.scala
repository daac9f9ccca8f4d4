package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins Spark's session_window boundary semantics at the EXACT gap value —
  * the corner the q79 oracle got wrong until sf0.1 produced a real
  * 1800-second gap (user 511): touching sessions MERGE (an event at
  * lastEvent + gap extends the session), so a new session requires
  * gap STRICTLY greater than the session timeout.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  test("session_window merges at exactly gap, splits just past it") {
    val events = Seq(
      ("a", 0L), ("a", 1800L),          // touching: one session
      ("b", 0L), ("b", 1801L),          // past the gap: two sessions
      ("c", 0L), ("c", 1799L), ("c", 3599L) // chained sub-gap hops: one
    ).toDF("user_id", "sec")
    val sessions = events
      .groupBy(col("user_id"),
        session_window(col("sec").cast(TimestampType), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sessions == Map("a" -> 1L, "b" -> 2L, "c" -> 1L), sessions.toString)
  }
}
