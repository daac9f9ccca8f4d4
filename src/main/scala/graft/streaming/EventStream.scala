package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the events shape (SURVEY.md §2.7's
  * "natural extension": the reference has no streaming, but its stateful
  * line loop is exactly the mapGroupsWithState pattern).
  */
object EventStream {

  final case class Evt(user_id: Long, ts_sec: Long)
  final case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
  final case class SessionCount(user_id: Long, n_sessions: Long, n_events: Long)

  /** Tumbling event-time window counts with a watermark — the streaming
    * form of q22_daily_type_counts. Works on a stream (late data beyond
    * 1 day dropped) and on a batch frame (watermark is a no-op).
    */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup: first occurrence per KEY wins; state pruned by
    * the watermark (keys older than the delay are forgotten — bounded
    * state, the streaming form of ops.Dedup.exact).
    * `dropDuplicatesWithinWatermark` dedups on the key alone — plain
    * `dropDuplicates(key, ts)` would treat the same key at two timestamps
    * as distinct, which is row-dedup, not the key-dedup this mirrors.
    */
  def dedupeStream(events: DataFrame, keyCol: String, tsCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream inner join with event-time bounds (the attribution
    * shape: each click pairs with same-user impressions from the
    * preceding `windowSec`). Watermarks on BOTH inputs plus the two-sided
    * time-range predicate are what make this safe on an unbounded stream:
    * they bound how long either side's rows are retained in join state,
    * so state is O(watermark × input rate), not O(stream). Expects
    * `impressions(imp_user, imp_ts, ...)` and
    * `clicks(click_user, click_ts, ...)`; append-mode output.
    */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
      windowSec: Long = 3600, watermarkDelay: String = "1 hour"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""imp_user = click_user
          AND click_ts >= imp_ts
          AND click_ts <= imp_ts + interval $windowSec seconds"""))

  /** LEFT OUTER twin of [[attributeClicks]] — the shape that answers
    * "which impressions NEVER converted": matched pairs stream out like
    * the inner join; an unmatched impression is emitted with null click
    * columns once the watermark proves no in-window click can still
    * arrive (its state expires at imp_ts + window + delay). Callers
    * must push the final watermark past the last real impression's
    * expiry — the q202 parity query stages far-future sentinel rows on
    * BOTH sides (the join watermark is the min across inputs) and
    * filters them from the result.
    */
  def attributeClicksOuter(impressions: DataFrame, clicks: DataFrame,
      windowSec: Long = 3600, watermarkDelay: String = "1 hour"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""imp_user = click_user
          AND click_ts >= imp_ts
          AND click_ts <= imp_ts + interval $windowSec seconds"""),
        "left_outer")

  /** LEFT SEMI twin of [[attributeClicks]] — "which impressions DID
    * convert", emitted once per impression regardless of how many
    * in-window clicks match, and with only the left side's columns
    * (the click payload never crosses the join). Same two-sided
    * watermark state bounds as the inner join; a matched impression
    * emits in the micro-batch its first match arrives in, so the end
    * state over a bounded replay equals the batch EXISTS semi join.
    */
  def attributeClicksSemi(impressions: DataFrame, clicks: DataFrame,
      windowSec: Long = 3600, watermarkDelay: String = "1 hour"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""imp_user = click_user
          AND click_ts >= imp_ts
          AND click_ts <= imp_ts + interval $windowSec seconds"""),
        "left_semi")

  /** Stateful sessionization via flatMapGroupsWithState — the custom-state
    * escape hatch (per-user running session + event counts, 30-min
    * default gap). Update-mode output: one refreshed count per user per
    * batch. Within a batch each group is sorted by ts_sec before the
    * state fold — a coarsening of the batch q20 (ts, event_id) order
    * that yields the IDENTICAL session count (events inside one second
    * have gap 0 in any order); across batches the state carries lastTs,
    * so in-order file arrival reproduces the batch result exactly
    * (out-of-order arrival beyond a batch boundary would need buffering
    * state + an event-time timeout — out of scope for the parity query,
    * which stages the bounded input as ordered micro-batches).
    */
  /** Retraction-stream view maintenance — the streaming twin of
    * [[graft.ops.Incremental.mergeCountSum]]: CDC rows arrive with a
    * `sign` column (+1 insert, −1 retraction) and the standing
    * (count, Σvalue) view is a SIGNED streaming aggregation —
    * n = Σsign, sum = Σ(sign·value) in exact decimal — so a retraction
    * cancels its insert bit-exactly regardless of which micro-batch
    * either lands in (signed sums are commutative; arrival order cannot
    * change the end state). This is the Flink-style retract-stream
    * shape on Structured Streaming's built-in aggregation state; groups
    * whose count reaches zero are filtered by the CONSUMER (complete
    * mode re-emits all groups).
    */
  def signedCountSumView(cdc: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val dec = graft.relational.Sql.dec2(col(valueCol))
    cdc.groupBy(keys.map(col): _*)
      .agg(sum(col("sign")).as("n"),
        sum(when(col("sign") === 1L, dec).otherwise(-dec)).as("s"))
  }

  final case class TsEvt(user_id: Long, ts_sec: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: Long, n_events: Long)

  /** Stateful sessionization with EVENT-TIME TIMEOUT — the semantics
    * [[sessionCounts]] (update-mode running counts) cannot express: a
    * session is emitted ONCE, when it CLOSES — either a later event
    * proves the gap in-batch, or the watermark passes `last + gap` and
    * the state times out (the path that finalizes each user's LAST
    * session; callers advance the final watermark with a far-future
    * sentinel row, q202's trick). Append-style emission of closed
    * sessions is exactly what a 100 TB continuous sessionizer feeds
    * downstream. State per user is one (start, last, n) triple;
    * timed-out state is removed, so state size tracks ACTIVE users only.
    */
  def closedSessions(events: Dataset[TsEvt], gapSec: Long = 1800): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evts, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, st.start, st.n))
          } else {
            var closed = List.empty[ClosedSession]
            var stOpt = state.getOption
            evts.toSeq.sortBy(_.ts_sec).foreach { e =>
              stOpt = stOpt match {
                case Some(st) if e.ts_sec - st.last <= gapSec =>
                  Some(OpenSession(st.start, e.ts_sec, st.n + 1))
                case Some(st) =>
                  closed ::= ClosedSession(uid, st.start, st.n)
                  Some(OpenSession(e.ts_sec, e.ts_sec, 1))
                case None => Some(OpenSession(e.ts_sec, e.ts_sec, 1))
              }
            }
            val st = stOpt.get
            state.update(st)
            state.setTimeoutTimestamp((st.last + gapSec + 1) * 1000)
            closed.reverse.iterator
          }
      }
  }

  def sessionCounts(events: Dataset[Evt], gapSec: Long = 1800): Dataset[SessionCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, evts, state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          evts.toSeq.sortBy(_.ts_sec).foreach { e =>
            st =
              if (st.lastTs == Long.MinValue || e.ts_sec - st.lastTs > gapSec)
                SessionState(e.ts_sec, st.nSessions + 1, st.nEvents + 1)
              else SessionState(e.ts_sec, st.nSessions, st.nEvents + 1)
          }
          state.update(st)
          Iterator.single(SessionCount(uid, st.nSessions, st.nEvents))
      }
  }
}
